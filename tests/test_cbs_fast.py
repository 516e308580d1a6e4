"""Golden equivalence of the default/exception-decomposition CBS
(`cbs_fast`) against the dense reference-semantics CBS (`cbs`)."""

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.data.vocabulary import BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary
from style_seqcvae_tpu.decoding.cbs import constrained_beam_search
from style_seqcvae_tpu.decoding.cbs_fast import (
    constrained_beam_search_fast,
    fsm_to_tables,
    stack_fsm_tables,
)
from style_seqcvae_tpu.decoding.fsm import FiniteStateMachineBuilder, pack_fsm, unpack_fsm

END = 1


def table_step(table):
    tj = jnp.asarray(table)

    def step(tokens, state, rng):
        return tj[tokens], state

    return step


def make_logprob_table(V, seed):
    rng = np.random.RandomState(seed)
    logits = rng.randn(V, V).astype(np.float32) * 2
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


def compare(fsm_dense_list, V, T=6, K=3, pnbs=2, seed=0):
    B = len(fsm_dense_list)
    table = make_logprob_table(V, seed)
    start = np.full((B,), 0)

    S = fsm_dense_list[0].shape[0]
    packed = jnp.asarray(np.stack([pack_fsm(f) for f in fsm_dense_list]))
    tables = stack_fsm_tables([fsm_to_tables(f) for f in fsm_dense_list])

    step = table_step(table)
    seq_d, lp_d = constrained_beam_search(
        step, jnp.asarray(start), {"d": jnp.zeros((B,))}, packed,
        jax.random.PRNGKey(0), max_steps=T, beam_size=K,
        per_node_beam_size=pnbs, end_index=END)
    seq_f, lp_f = constrained_beam_search_fast(
        step, jnp.asarray(start), {"d": jnp.zeros((B,))}, tables,
        jax.random.PRNGKey(0), max_steps=T, beam_size=K,
        per_node_beam_size=pnbs, end_index=END)

    lp_d, lp_f = np.asarray(lp_d), np.asarray(lp_f)
    seq_d, seq_f = np.asarray(seq_d), np.asarray(seq_f)
    reachable = lp_d > -1e19
    np.testing.assert_allclose(np.where(reachable, lp_f, 0),
                               np.where(reachable, lp_d, 0), atol=1e-4)
    np.testing.assert_array_equal(seq_f[reachable], seq_d[reachable])


def test_fast_equals_dense_builder_fsm():
    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog", "dogs", "cat",
                        "fire", "hydrant", "red", "blue", "runs", "sits"])
    b = FiniteStateMachineBuilder(vocab, max_given_constraints=2,
                                  max_words_per_constraint=2)
    b.add_wordforms("dog", ["dog", "dogs"])
    b.add_wordforms("cat", ["cat"])
    b.add_wordforms("fire", ["fire"])
    b.add_wordforms("hydrant", ["hydrant"])
    V = vocab.get_vocab_size()

    fsm1, used1, _ = b.build(["dog", "cat"])
    fsm2, used2, _ = b.build(["dog", "fire hydrant"])
    S = max(used1, used2, 4)
    compare([fsm1[:S, :S], fsm2[:S, :S]], V)


def test_fast_equals_dense_nondeterministic():
    """Shared wordform 'fire' between a single-word and a multi-word
    constraint → nondeterministic transition from state 0."""
    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "fire", "hydrant",
                        "truck", "cat", "runs"])
    b = FiniteStateMachineBuilder(vocab, max_given_constraints=2,
                                  max_words_per_constraint=2)
    b.add_wordforms("fire", ["fire"])
    b.add_wordforms("hydrant", ["hydrant"])
    fsm, used, _ = b.build(["fire", "fire hydrant"])
    compare([fsm[:used, :used]], vocab.get_vocab_size(), seed=3)


def test_fast_equals_dense_random_fsms():
    """Randomized structured FSMs: random exception tokens per state."""
    rng = np.random.RandomState(7)
    V, S, B = 15, 6, 3
    fsms = []
    for _ in range(B):
        fsm = np.zeros((S, S, V), np.uint8)
        for s in range(S):
            d = s if s < 4 else rng.randint(0, 4)   # sub-state style defaults
            fsm[s, d, :] = 1
            for _ in range(rng.randint(0, 4)):
                v = rng.randint(2, V)
                to = rng.randint(0, S)
                fsm[s, d, v] = 0
                fsm[s, to, v] = 1
        fsms.append(fsm)
    compare(fsms, V, T=7, K=2, pnbs=1, seed=11)
    compare(fsms, V, T=5, K=3, pnbs=3, seed=12)


def test_small_top_k_matches_lax():
    from style_seqcvae_tpu.ops.topk import small_top_k
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 9, 33).astype(np.float32))
    for k in (1, 2, 5):
        v1, i1 = small_top_k(x, k)
        v2, i2 = jax.lax.top_k(x, k)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_raw_step_equals_logprob_step():
    """raw_step=True (logits + logsumexp correction, post-selection end
    freezing) must reproduce the log-prob path exactly."""
    import jax.numpy as jnp
    from style_seqcvae_tpu.models.captioner import (
        CaptionerConfig, init_captioner, make_decode_context, make_step_fn)
    from style_seqcvae_tpu.models.updown_cell import init_cell_state

    cfg = CaptionerConfig(vocab_size=30, image_feature_size=6, embedding_size=5,
                          hidden_size=4, attention_projection_size=3, z_space=2,
                          max_caption_length=7, beam_size=3, use_cbs=True)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 6))
    ctx = make_decode_context(params, cfg, feats)
    st = init_cell_state((2,), cfg.hidden_size)

    fsm = np.zeros((4, 4, 30), np.uint8)
    for s in range(4):
        fsm[s, s, :] = 1
    for (a, b, t) in [(0, 1, 5), (0, 2, 7), (1, 3, 7), (2, 3, 5)]:
        fsm[a, b, t] = 1
        fsm[a, a, t] = 0
    tables = stack_fsm_tables([fsm_to_tables(fsm)] * 2)

    kwargs = dict(max_steps=7, beam_size=3, per_node_beam_size=2,
                  end_index=cfg.boundary_index)
    seqs1, lp1 = constrained_beam_search_fast(
        make_step_fn(params, cfg, ctx), jnp.full((2,), cfg.boundary_index),
        st, tables, jax.random.PRNGKey(3), **kwargs)
    seqs2, lp2 = constrained_beam_search_fast(
        make_step_fn(params, cfg, ctx, return_raw=True),
        jnp.full((2,), cfg.boundary_index), st, tables, jax.random.PRNGKey(3),
        **kwargs, raw_step=True)
    lp1, lp2 = np.asarray(lp1), np.asarray(lp2)
    reachable = lp1 > -1e18
    np.testing.assert_allclose(np.where(reachable, lp2, 0),
                               np.where(reachable, lp1, 0), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(seqs2)[reachable],
                                  np.asarray(seqs1)[reachable])


def test_optimized_step_equals_regular():
    """make_optimized_step_fn (folded constant gate segments) must match
    make_step_fn exactly for all prior modes."""
    import jax.numpy as jnp
    from style_seqcvae_tpu.models.captioner import (
        CaptionerConfig, init_captioner, make_decode_context,
        make_optimized_step_fn, make_step_fn)
    from style_seqcvae_tpu.models.updown_cell import init_cell_state

    rngs = np.random.RandomState(0)
    for mode, simple in [(0, True), (0, False), (1, False), (2, False)]:
        cfg = CaptionerConfig(vocab_size=30, image_feature_size=6,
                              embedding_size=5, hidden_size=4,
                              attention_projection_size=3, z_space=2,
                              sentiment_vae=mode, simple_vae=simple,
                              max_caption_length=5, beam_size=2)
        params = init_captioner(jax.random.PRNGKey(mode), cfg)
        feats = jnp.asarray(rngs.randn(2, 4, 6).astype(np.float32))
        sent = jnp.asarray(rngs.choice([-1.0, 1.0], (2, 1)).astype(np.float32))
        oa = (jnp.asarray(rngs.randn(2, 4, 2).astype(np.float32))
              if mode == 2 else None)
        ctx = make_decode_context(params, cfg, feats, sentiment=sent,
                                  obj_att_embeds=oa)
        step_a = make_step_fn(params, cfg, ctx)
        step_b = make_optimized_step_fn(params, cfg, ctx)

        st = init_cell_state((2, 3), cfg.hidden_size)
        toks = jnp.asarray(rngs.randint(0, 30, (2, 3)))
        key = jax.random.PRNGKey(9)
        lp_a, st_a = step_a(toks, st, key)
        lp_b, st_b = step_b(toks, st, key)
        np.testing.assert_allclose(np.asarray(lp_b), np.asarray(lp_a),
                                   atol=1e-5, err_msg=f"mode {mode}")
        for fa, fb in zip(st_a, st_b):
            np.testing.assert_allclose(np.asarray(fb), np.asarray(fa), atol=1e-5)
        # second chained step (state threading)
        lp_a2, _ = step_a(toks, st_a, jax.random.PRNGKey(11))
        lp_b2, _ = step_b(toks, st_b, jax.random.PRNGKey(11))
        np.testing.assert_allclose(np.asarray(lp_b2), np.asarray(lp_a2), atol=1e-5)


def test_noise_threading_deterministic_replay():
    """Passing precomputed z-noise instead of PRNG keys yields identical
    results on replay (the deterministic-replay capability)."""
    import jax.numpy as jnp
    from style_seqcvae_tpu.models.captioner import (
        CaptionerConfig, init_captioner, make_decode_context,
        make_optimized_step_fn)
    from style_seqcvae_tpu.models.updown_cell import init_cell_state

    cfg = CaptionerConfig(vocab_size=30, image_feature_size=6, embedding_size=5,
                          hidden_size=4, attention_projection_size=3, z_space=2,
                          max_caption_length=6, beam_size=2, use_cbs=True,
                          sentiment_vae=1, simple_vae=False)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 6))
    sent = jnp.ones((2, 1))
    ctx = make_decode_context(params, cfg, feats, sentiment=sent)
    step = make_optimized_step_fn(params, cfg, ctx)
    st = init_cell_state((2,), cfg.hidden_size)

    fsm = np.zeros((4, 4, 30), np.uint8)
    for s in range(4):
        fsm[s, s, :] = 1
    fsm[0, 1, 5] = 1
    fsm[0, 0, 5] = 0
    tables = stack_fsm_tables([fsm_to_tables(fsm)] * 2)
    noise = jax.random.normal(jax.random.PRNGKey(5), (6, 2, 4, 2, cfg.z_space))

    out1 = constrained_beam_search_fast(
        step, jnp.full((2,), cfg.boundary_index), st, tables,
        jax.random.PRNGKey(7), max_steps=6, beam_size=2,
        end_index=cfg.boundary_index, noise=noise)
    out2 = constrained_beam_search_fast(
        step, jnp.full((2,), cfg.boundary_index), st, tables,
        jax.random.PRNGKey(99), max_steps=6, beam_size=2,
        end_index=cfg.boundary_index, noise=noise)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    np.testing.assert_allclose(np.asarray(out1[1]), np.asarray(out2[1]), atol=1e-6)


def test_trimmed_destination_tokens_stay_dead():
    """A wordform whose only destination is a trimmed sub-state must remain
    masked from the default transition (review finding): the fast path must
    agree with the dense packed path."""
    from style_seqcvae_tpu.data.vocabulary import BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary
    from style_seqcvae_tpu.decoding.fsm import FiniteStateMachineBuilder

    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "fire", "hydrant", "x"])
    b = FiniteStateMachineBuilder(vocab, max_given_constraints=2,
                                  max_words_per_constraint=2)
    b.add_wordforms("fire", ["fire"])
    b.add_wordforms("hydrant", ["hydrant"])
    dense, used, _ = b.build(["fire hydrant"])
    fire = vocab.get_token_index("fire")

    # trim BELOW the first sub-state: "fire"'s destination disappears
    S = 4
    td = fsm_to_tables(dense[:S, :S])
    ts, _, _ = b.build_tables(["fire hydrant"], num_states=S)
    for t in (td, ts):
        masked = {(int(t.exc_token[s, j]))
                  for s in range(S) for j in range(t.exc_token.shape[1])
                  if t.exc_valid[s, j] and int(t.exc_token[s, j]) == fire
                  and s == 0}
        assert fire in masked, "fire must be a (mask-only) exception of state 0"
        dests = {int(t.exc_dest[0, j])
                 for j in range(t.exc_token.shape[1])
                 if t.exc_valid[0, j] and int(t.exc_token[0, j]) == fire}
        assert dests == {-1}, f"dead token must have unreachable dest, got {dests}"

    # decode: from state 0, "fire" must never be a candidate anywhere
    table = make_logprob_table(vocab.get_vocab_size(), 0)
    table[:, fire] = 0.0  # make it maximally attractive
    table = table - np.log(np.exp(table).sum(-1, keepdims=True))
    step = table_step(table)
    tables = stack_fsm_tables([ts])
    seqs, lp = constrained_beam_search_fast(
        step, jnp.asarray([0]), {"d": jnp.zeros((1,))}, tables,
        jax.random.PRNGKey(0), max_steps=5, beam_size=2, end_index=END)
    # state-0 beams (reachable) must not contain "fire"
    assert fire not in set(np.asarray(seqs)[0, 0].reshape(-1).tolist())


def test_randomized_fsm_equivalence_sweep():
    """Property sweep: cbs_fast must equal the dense reference-semantics CBS
    on randomly generated FSMs (random exception counts, destinations,
    shared wordforms, unreachable states)."""
    rng = np.random.RandomState(123)
    V = 60
    for trial in range(8):
        S = int(rng.choice([2, 4, 8]))
        fsms = []
        for _ in range(2):  # batch of 2
            f = np.zeros((S, S, V), np.uint8)
            for s in range(S):
                f[s, s, :] = 1
            n_exc = rng.randint(1, 5)
            for _ in range(n_exc):
                s = rng.randint(S)
                d = rng.randint(S)
                t = rng.randint(2, V)
                f[s, :, t] = 0
                f[s, d, t] = 1
            fsms.append(f)
        compare(fsms, V, T=5, K=3, pnbs=2, seed=trial)
