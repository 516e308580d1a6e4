"""Fused top-k+logsumexp kernel (interpret mode on CPU) and the opt-in
fused CBS path. The kernel is default-OFF in production (measured slower
end-to-end on v5e than XLA's masked argmax chain — see cbs_fast.py inline
note); these tests keep the opt-in path correct."""

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.decoding.cbs_fast import (
    constrained_beam_search_fast, fsm_to_tables, stack_fsm_tables)
from style_seqcvae_tpu.ops.pallas.topk_lse import (
    top_k_with_lse, top_k_with_lse_xla)


def test_kernel_matches_xla_contract():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 1000).astype(np.float32) * 3)
    for k in (2, 8):
        v1, i1, l1 = top_k_with_lse(x, k, interpret=True)
        v2, i2, l2 = top_k_with_lse_xla(x, k)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_kernel_bf16_and_row_padding():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(18, 500).astype(np.float32), jnp.bfloat16)  # 18 % 8 != 0
    v1, i1, l1 = top_k_with_lse(x, 4, interpret=True)
    v2, i2, l2 = top_k_with_lse_xla(x, 4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-2)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-2)


def test_fused_cbs_equals_default_path():
    """Opt-in fused selection must reproduce the default raw path exactly
    on reachable beams (the exception-filtering argument: at most E
    exception tokens exist per state, so the unmasked top-(pnbs+E) always
    contains the masked top-pnbs)."""
    V, S, T, K, pnbs = 300, 4, 8, 3, 2
    rng = np.random.RandomState(0)
    fsms = []
    for _ in range(3):
        f = np.zeros((S, S, V), np.uint8)
        for s in range(S):
            f[s, s, :] = 1
        for c in range(2):
            for s in range(S):
                d = (s + 1 + c) % S
                for t in rng.randint(2, V, 2):
                    f[s, d, t] = 1
                    f[s, s, t] = 0
        fsms.append(f)
    tables = stack_fsm_tables([fsm_to_tables(f) for f in fsms])

    table = jnp.asarray(rng.randn(V, V).astype(np.float32) * 2)

    def step_raw(tokens, state, rng_):
        logits = table[tokens]
        return (logits, jax.scipy.special.logsumexp(logits, axis=-1)), state

    start = jnp.zeros((3,), jnp.int32)
    st = {"d": jnp.zeros((3,))}
    kw = dict(max_steps=T, beam_size=K, per_node_beam_size=pnbs,
              end_index=1, raw_step=True)
    sa, la = constrained_beam_search_fast(
        step_raw, start, st, tables, jax.random.PRNGKey(0),
        fused_vocab_topk=False, **kw)
    sb, lb = constrained_beam_search_fast(
        step_raw, start, st, tables, jax.random.PRNGKey(0),
        fused_vocab_topk=True, **kw)
    la, lb = np.asarray(la), np.asarray(lb)
    reach = la > -1e18
    assert reach.any()
    np.testing.assert_allclose(np.where(reach, lb, 0), np.where(reach, la, 0),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sb)[reach], np.asarray(sa)[reach])


def test_kernel_distinct_indices_on_all_neg_inf():
    """Once remaining values are -inf the kernel must still emit DISTINCT
    indices (like lax.top_k), not repeat column 0 (round-2 regression:
    value-masking was a no-op on an already -inf max)."""
    x = jnp.full((8, 10), -jnp.inf)
    v1, i1, lse1 = top_k_with_lse(x, 3, interpret=True)
    v2, i2, lse2 = top_k_with_lse_xla(x, 3)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    assert np.all(np.isneginf(np.asarray(v1)))
    # logsumexp of an all--inf row is -inf, not NaN (the naive max-shift
    # produces (-inf)-(-inf)=NaN; the kernel must guard it)
    np.testing.assert_array_equal(np.asarray(lse1), np.asarray(lse2))
    assert np.all(np.isneginf(np.asarray(lse1)))
