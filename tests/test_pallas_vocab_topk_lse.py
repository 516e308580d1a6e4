"""matmul_top_k_with_lse (fused vocab-head matmul + streaming top-k +
logsumexp) vs the XLA materialized reference, interpret mode (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_seqcvae_tpu.ops.pallas.vocab_topk_lse import (
    matmul_top_k_with_lse,
    matmul_top_k_with_lse_xla,
)


@pytest.mark.parametrize("R,V,E,k", [(16, 700, 40, 4), (24, 1200, 48, 8)])
def test_matches_xla_reference(R, V, E, k):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(R, E).astype(np.float32))
    emb = jnp.asarray(rng.randn(V, E).astype(np.float32))
    v1, i1, l1 = matmul_top_k_with_lse(x, emb, k, interpret=True,
                                       block_rows=8, block_v=256)
    v2, i2, l2 = matmul_top_k_with_lse_xla(x, emb, k)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5,
                               atol=1e-5)


def test_nonaligned_rows_and_vocab():
    """R not a multiple of block_rows and V not a multiple of block_v: the
    pads must never appear among the winners."""
    rng = np.random.RandomState(1)
    R, V, E, k = 13, 530, 24, 5
    x = jnp.asarray(rng.randn(R, E).astype(np.float32))
    emb = jnp.asarray(rng.randn(V, E).astype(np.float32))
    v1, i1, l1 = matmul_top_k_with_lse(x, emb, k, interpret=True,
                                       block_rows=8, block_v=256)
    v2, i2, l2 = matmul_top_k_with_lse_xla(x, emb, k)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    assert np.asarray(i1).max() < V
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5,
                               atol=1e-5)


def test_tie_breaks_to_lower_index():
    """Duplicate embedding rows produce exactly tied logits — the kernel
    must order them like lax.top_k (lower index first), including ties
    that straddle a V-tile boundary."""
    rng = np.random.RandomState(2)
    E = 16
    x = jnp.asarray(rng.randn(8, E).astype(np.float32))
    base = rng.randn(300, E).astype(np.float32)
    base[290] = base[3]          # tie across tiles (block_v=256)
    base[200] = base[100]        # tie within/across
    emb = jnp.asarray(base)
    v1, i1, _ = matmul_top_k_with_lse(x, emb, 6, interpret=True,
                                      block_rows=8, block_v=256)
    v2, i2 = jax.lax.top_k(
        jax.lax.dot_general(x, emb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32), 6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_bf16_inputs():
    rng = np.random.RandomState(3)
    R, V, E, k = 8, 512, 32, 4
    x = jnp.asarray(rng.randn(R, E), jnp.bfloat16)
    emb = jnp.asarray(rng.randn(V, E), jnp.bfloat16)
    v1, i1, l1 = matmul_top_k_with_lse(x, emb, k, interpret=True,
                                       block_rows=8, block_v=256)
    v2, i2, l2 = matmul_top_k_with_lse_xla(x, emb, k)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-3,
                               atol=1e-3)


# ---------------------------------------------------------------------------
# prehead CBS path: the matmul-fused kernel inside the real search
# ---------------------------------------------------------------------------

def test_prehead_cbs_equals_raw_path():
    """constrained_beam_search_fast(prehead_step=True) must reproduce the
    raw-logits path exactly on reachable beams (synthetic tied head:
    logits = proj_table[token] @ emb^T)."""
    from style_seqcvae_tpu.decoding.cbs_fast import (
        constrained_beam_search_fast, fsm_to_tables, stack_fsm_tables)

    V, Ed, S, T, K, pnbs = 300, 24, 4, 8, 3, 2
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

    proj_table = jnp.asarray(rng.randn(V, Ed).astype(np.float32))
    emb = jnp.asarray(rng.randn(V, Ed).astype(np.float32))

    def step_raw(tokens, state, rng_):
        logits = jax.lax.dot_general(
            proj_table[tokens], emb, (((3,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (logits, jax.scipy.special.logsumexp(logits, axis=-1)), state

    def step_prehead(tokens, state, rng_):
        return proj_table[tokens], state

    start = jnp.zeros((3,), jnp.int32)
    st = {"d": jnp.zeros((3,))}
    kw = dict(max_steps=T, beam_size=K, per_node_beam_size=pnbs, end_index=1)
    sa, la = constrained_beam_search_fast(
        step_raw, start, st, tables, jax.random.PRNGKey(0), raw_step=True,
        **kw)
    sb, lb = constrained_beam_search_fast(
        step_prehead, start, st, tables, jax.random.PRNGKey(0),
        prehead_step=True, embedding=emb, **kw)
    la, lb = np.asarray(la), np.asarray(lb)
    reach = la > -1e18
    assert reach.any()
    np.testing.assert_allclose(np.where(reach, lb, 0), np.where(reach, la, 0),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sb)[reach], np.asarray(sa)[reach])


def test_prehead_cbs_real_captioner():
    """The production seam: make_optimized_step_fn(return_prehead=True) +
    prehead CBS tokens match the raw-step decode on a tied-head captioner
    (embedding_size 300 -> tie_embeddings)."""
    from style_seqcvae_tpu.decoding.cbs_fast import (
        constrained_beam_search_fast, fsm_to_tables, stack_fsm_tables)
    from style_seqcvae_tpu.models.captioner import (
        CaptionerConfig, init_captioner, make_decode_context,
        make_optimized_step_fn)
    from style_seqcvae_tpu.models.updown_cell import init_cell_state

    V, B, S, K, T = 60, 2, 4, 3, 6
    cfg = CaptionerConfig(vocab_size=V, image_feature_size=12,
                          embedding_size=300, hidden_size=10,
                          attention_projection_size=6, z_space=4,
                          sentiment_vae=1, simple_vae=False,
                          max_caption_length=T)
    assert cfg.tie_embeddings
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, 5, 12).astype(np.float32))
    sent = jnp.asarray(rng.choice([-1.0, 1.0], (B, 1)).astype(np.float32))
    ctx = make_decode_context(params, cfg, feats, sentiment=sent)
    step_raw = make_optimized_step_fn(params, cfg, ctx, return_raw=True)
    step_pre = make_optimized_step_fn(params, cfg, ctx, return_prehead=True)

    f = np.zeros((S, S, V), np.uint8)
    for s in range(S):
        f[s, s, :] = 1
    for s in range(S - 1):
        for t in (7, 9):
            f[s, s + 1, t] = 1
            f[s, s, t] = 0
    tables = stack_fsm_tables([fsm_to_tables(f)] * B)

    start = jnp.full((B,), cfg.boundary_index)
    st = init_cell_state((B,), cfg.hidden_size, jnp.float32)
    kw = dict(max_steps=T, beam_size=K, per_node_beam_size=2,
              end_index=cfg.boundary_index)
    sa, la = constrained_beam_search_fast(
        step_raw, start, st, tables, jax.random.PRNGKey(4), raw_step=True,
        **kw)
    sb, lb = constrained_beam_search_fast(
        step_pre, start, st, tables, jax.random.PRNGKey(4),
        prehead_step=True, embedding=params["embedding"], **kw)
    la, lb = np.asarray(la), np.asarray(lb)
    reach = la > -1e18
    assert reach.any()
    np.testing.assert_allclose(np.where(reach, lb, 0), np.where(reach, la, 0),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(sb)[reach], np.asarray(sa)[reach])
