"""Golden tests for constrained beam search: packed-FSM jax implementation vs
a numpy transcription of the reference algorithm (updown-baseline/updown/
modules/cbs.py:59-277), plus beam-selection logic and an end-to-end
constraint-satisfaction check with the real captioner."""

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.data.vocabulary import BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary
from style_seqcvae_tpu.decoding.cbs import constrained_beam_search
from style_seqcvae_tpu.decoding.fsm import FiniteStateMachineBuilder, pack_fsm
from style_seqcvae_tpu.decoding.select import (
    select_best_beam_simple_jax,
    select_best_beam_with_constraints,
    valid_state_mask_simple,
)

END = 1


def numpy_cbs(table, fsm, start_tokens, max_steps, beam_size, pnbs, end_index):
    """Numpy transcription of ConstrainedBeamSearch.search (cbs.py:59-277)
    with a deterministic token-table step function."""
    B, S, _, V = fsm.shape
    K = beam_size
    predictions, backpointers = [], []

    start_lp = table[start_tokens]                       # (B, V)
    ssp = np.broadcast_to(start_lp[:, None, :], (B, S, V)).copy()
    ssp[fsm[:, 0, :, :] == 0] = -np.inf
    order = np.argsort(-ssp, axis=2, kind="stable")
    start_preds = order[:, :, :K]                        # (B, S, K)
    last_lp = np.take_along_axis(ssp, start_preds, axis=2)
    predictions.append(start_preds.reshape(B, -1))

    after_end = np.full((V,), -np.inf, np.float32)
    after_end[end_index] = 0.0

    for _ in range(max_steps - 1):
        last = predictions[-1].reshape(B, S, K)
        lp = table[last]                                  # (B, S, K, V)
        lp = np.where((last == end_index)[..., None], after_end, lp)

        new_preds = np.zeros((B, S, K), np.int64)
        new_lp = np.zeros((B, S, K), np.float32)
        new_bp = np.zeros((B, S, K), np.int64)
        exp_last = np.broadcast_to(last_lp[..., None], (B, S, K, pnbs))
        for i in range(S):
            slp = lp.copy()
            mask = np.broadcast_to(fsm[:, :, i, None, :], (B, S, K, V))
            slp = np.where(mask == 0, -1e20, slp)
            order = np.argsort(-slp, axis=3, kind="stable")
            cls = order[:, :, :, :pnbs]
            top = np.take_along_axis(slp, cls, axis=3)
            summed = top + exp_last
            flat = summed.reshape(B, -1)
            fcls = cls.reshape(B, -1)
            order = np.argsort(-flat, axis=1, kind="stable")[:, :K]
            new_lp[:, i] = np.take_along_axis(flat, order, axis=1)
            new_preds[:, i] = np.take_along_axis(fcls, order, axis=1)
            new_bp[:, i] = order // pnbs
        predictions.append(new_preds.reshape(B, -1))
        backpointers.append(new_bp.reshape(B, -1))
        last_lp = new_lp

    seq = [predictions[-1]]
    cur = backpointers[-1]
    for t in range(len(predictions) - 2, 0, -1):
        seq.append(np.take_along_axis(predictions[t], cur, axis=1))
        cur = np.take_along_axis(backpointers[t - 1], cur, axis=1)
    seq.append(np.take_along_axis(predictions[0], cur, axis=1))
    out = np.stack(seq[::-1], axis=2)                     # (B, S*K, T)
    return out.reshape(B, S, K, max_steps), last_lp


def build_test_fsm(V, S=4, seed=0):
    """Random-ish but valid FSM: self-loops everywhere, plus specific token
    transitions 0→1, 0→2, 1→3, 2→3."""
    fsm = np.zeros((S, S, V), np.uint8)
    for s in range(S):
        fsm[s, s, :] = 1
    for (a, b, tok) in [(0, 1, 3), (0, 1, 4), (0, 2, 5), (1, 3, 5), (2, 3, 3), (2, 3, 4)]:
        fsm[a, b, tok] = 1
        fsm[a, a, tok] = 0
    return fsm


def test_cbs_matches_numpy_reference():
    V, B, S, K, T = 8, 2, 4, 2, 5
    rng = np.random.RandomState(0)
    logits = rng.randn(V, V).astype(np.float32) * 2
    table = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    fsm = build_test_fsm(V)
    fsm_b = np.broadcast_to(fsm[None], (B,) + fsm.shape)
    packed = np.stack([pack_fsm(fsm)] * B)

    start = np.array([0, 2])
    for pnbs in (K, 1):
        want_seq, want_lp = numpy_cbs(table, fsm_b, start, T, K, pnbs, END)

        tj = jnp.asarray(table)

        def step(tokens, state, rng_):
            return tj[tokens], state

        got_seq, got_lp = constrained_beam_search(
            step, jnp.asarray(start), {"d": jnp.zeros((B,))},
            jnp.asarray(packed), jax.random.PRNGKey(0),
            max_steps=T, beam_size=K, per_node_beam_size=pnbs, end_index=END)
        np.testing.assert_allclose(np.asarray(got_lp), want_lp, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_seq), want_seq)


def test_valid_state_mask_simple():
    mask = valid_state_mask_simple(8, jnp.asarray([3, 2, 1, 0]), 2)
    m = np.asarray(mask)
    # given=3: states with popcount>=2 → 3,5,6,7
    np.testing.assert_array_equal(np.where(m[0])[0], [3, 5, 6, 7])
    # given=2: popcount>=2 within 0..3 → 3
    np.testing.assert_array_equal(np.where(m[1])[0], [3])
    # given=1: need min(1,2)=1 → state 1
    np.testing.assert_array_equal(np.where(m[2])[0], [1])
    # given=0: need 0 → state 0
    np.testing.assert_array_equal(np.where(m[3])[0], [0])


def test_select_best_beam_with_constraints_simple():
    B, S, K, T = 2, 8, 3, 4
    rng = np.random.RandomState(1)
    beams = rng.randint(0, 9, (B, S, K, T))
    lp = rng.randn(B, S, K).astype(np.float32)
    lp.sort(axis=2)
    lp = lp[:, :, ::-1]  # sorted desc within beam

    best, valid = select_best_beam_with_constraints(
        beams, lp, [3, 2], min_constraints_to_satisfy=2, cbs_simple=True)
    # image 0: valid states 3,5,6,7 → best = argmax of their beam-0 lp
    vs = [3, 5, 6, 7]
    sel = vs[int(np.argmax(lp[0, vs, 0]))]
    np.testing.assert_array_equal(best[0], beams[0, sel, 0])
    # jax version agrees
    bj, _ = select_best_beam_simple_jax(jnp.asarray(beams), jnp.asarray(lp),
                                        jnp.asarray([3, 2]), 2)
    np.testing.assert_array_equal(np.asarray(bj), best)


def test_select_best_beam_grounded_mode():
    """Grounded algebra (decoding.py:87-123): object+attribute states."""
    B, S, K, T = 1, 8, 1, 3
    lp = np.zeros((B, S, K), np.float32)
    lp[0, :, 0] = [0, -1, -2, 5, -4, -5, -6, 1]
    beams = np.arange(B * S * K * T).reshape(B, S, K, T)
    # constraints: obj "dog" with attribute "red"; obj "cat" without attrs
    constraints = [[["dog", ["red"]], ["cat", []]]]
    constraint2states = [{"dog": [1, 3], "red": [2, 3], "cat": [5, 7]}]
    # dog∧red states: {3}; cat states: {5,7} (all-attr pass)
    # states_objects: 3→1, 5→1, 7→1 ; objects_with_attributes = {3}
    # → multiply: only state 3 survives with count 1 < min(2,2)=2 → empty!
    # With min_constraints_to_satisfy=1 state 3 is valid.
    best, valid = select_best_beam_with_constraints(
        beams, lp, [3], constraints, constraint2states,
        min_constraints_to_satisfy=1, cbs_simple=False)
    np.testing.assert_array_equal(best[0], beams[0, 3, 0])


def test_cbs_end_to_end_with_captioner_constraint_satisfaction():
    """Full stack: tiny captioner + FSM from the builder; the selected beam
    must contain a constraint wordform (state with popcount≥1)."""
    from style_seqcvae_tpu.models.captioner import (
        CaptionerConfig, init_captioner, make_decode_context, make_step_fn)

    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog", "dogs", "cat",
                        "runs", "sits", "red", "blue"])
    V = vocab.get_vocab_size()
    cfg = CaptionerConfig(
        vocab_size=V, image_feature_size=6, embedding_size=300, hidden_size=8,
        attention_projection_size=4, z_space=3, sentiment_vae=0, simple_vae=True,
        max_caption_length=8, beam_size=3, use_cbs=True)
    params = init_captioner(jax.random.PRNGKey(0), cfg)

    builder = FiniteStateMachineBuilder(vocab, max_given_constraints=2,
                                        max_words_per_constraint=1)
    builder.add_wordforms("dog", ["dog", "dogs"])
    builder.add_wordforms("cat", ["cat"])
    packed, used, c2s = builder.build_packed(["dog", "cat"], num_states=4)

    B = 1
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, 5, 6))
    ctx = make_decode_context(params, cfg, feats)
    step = make_step_fn(params, cfg, ctx)
    from style_seqcvae_tpu.models.updown_cell import init_cell_state
    init_state = init_cell_state((B,), cfg.hidden_size)

    seqs, lp = constrained_beam_search(
        step, jnp.full((B,), cfg.boundary_index), init_state,
        jnp.asarray(packed)[None], jax.random.PRNGKey(2),
        max_steps=cfg.max_caption_length, beam_size=3, per_node_beam_size=1,
        end_index=cfg.boundary_index)

    seqs = np.asarray(seqs)     # (B, 4, 3, T)
    dog_forms = {vocab.get_token_index(w) for w in ["dog", "dogs"]}
    cat_forms = {vocab.get_token_index("cat")}
    # State 1 beams must contain a dog wordform; state 2 a cat wordform;
    # state 3 both (popcount semantics of the bit lattice).
    assert set(seqs[0, 1, 0]) & dog_forms
    assert set(seqs[0, 2, 0]) & cat_forms
    assert (set(seqs[0, 3, 0]) & dog_forms) and (set(seqs[0, 3, 0]) & cat_forms)
    # State 0 top beam must contain neither (it never left state 0).
    assert not (set(seqs[0, 0, 0]) & (dog_forms | cat_forms))
