"""Golden tests for vectorized beam search vs a numpy implementation of the
AllenNLP algorithm (the reference's vendored beam_search.py:592-769), using a
deterministic step function (fixed transition log-prob table)."""

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.decoding.beam_search import beam_search, greedy_decode

V, B, K, T = 9, 2, 3, 6
END = 1


def make_table(seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(V, V).astype(np.float32) * 2.0
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


def numpy_beam_search(table, start_tokens, max_steps, beam_size, pnbs, end_index):
    """Direct numpy transcription of the AllenNLP deterministic beam search."""
    B = len(start_tokens)
    predictions, backpointers = [], []
    start_lp = table[start_tokens]                      # (B, V)
    order = np.argsort(-start_lp, axis=1, kind="stable")
    start_preds = order[:, :beam_size]
    last_lp = np.take_along_axis(start_lp, start_preds, axis=1)
    predictions.append(start_preds)

    log_probs_after_end = np.full((V,), -np.inf, np.float32)
    log_probs_after_end[end_index] = 0.0

    for _ in range(max_steps - 1):
        last_preds = predictions[-1]                     # (B, K)
        lp = table[last_preds]                           # (B, K, V)
        ended = last_preds == end_index
        lp = np.where(ended[..., None], log_probs_after_end, lp)
        order = np.argsort(-lp, axis=2, kind="stable")
        top_cls = order[:, :, :pnbs]
        top_lp = np.take_along_axis(lp, top_cls, axis=2)
        summed = top_lp + last_lp[..., None]
        flat = summed.reshape(B, -1)
        flat_cls = top_cls.reshape(B, -1)
        order = np.argsort(-flat, axis=1, kind="stable")
        idx = order[:, :beam_size]
        last_lp = np.take_along_axis(flat, idx, axis=1)
        preds = np.take_along_axis(flat_cls, idx, axis=1)
        predictions.append(preds)
        backpointers.append(idx // pnbs)

    # reconstruct
    seq = [predictions[-1]]
    cur_bp = backpointers[-1]
    for t in range(len(predictions) - 2, 0, -1):
        seq.append(np.take_along_axis(predictions[t], cur_bp, axis=1))
        cur_bp = np.take_along_axis(backpointers[t - 1], cur_bp, axis=1)
    seq.append(np.take_along_axis(predictions[0], cur_bp, axis=1))
    return np.stack(seq[::-1], axis=2), last_lp


def make_step_fn(table):
    tj = jnp.asarray(table)

    def step(tokens, state, rng):
        return tj[tokens], state

    return step


def test_beam_search_matches_numpy_reference():
    table = make_table()
    start = np.array([0, 4])
    for pnbs in (K, 2, 1):
        want_seq, want_lp = numpy_beam_search(table, start, T, K, pnbs, END)
        got_seq, got_lp = beam_search(
            make_step_fn(table), jnp.asarray(start),
            {"dummy": jnp.zeros((B, 1))}, jax.random.PRNGKey(0),
            max_steps=T, beam_size=K, per_node_beam_size=pnbs, end_index=END)
        np.testing.assert_allclose(np.asarray(got_lp), want_lp, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_seq), want_seq)


def test_beam_search_end_token_freezing():
    """A sequence that hits END early must stay END with unchanged lp."""
    table = np.full((V, V), -10.0, np.float32)
    table[:, END] = -0.01          # END nearly always best
    table[END, END] = 0.0
    step = make_step_fn(table)
    seq, lp = beam_search(step, jnp.asarray([0]), {"d": jnp.zeros((1, 1))},
                          jax.random.PRNGKey(0), max_steps=T, beam_size=2,
                          end_index=END)
    seq = np.asarray(seq)
    assert (seq[0, 0] == END).all()
    np.testing.assert_allclose(float(lp[0, 0]), -0.01, atol=1e-5)


def test_greedy_matches_beam1():
    table = make_table(3)
    step = make_step_fn(table)
    start = jnp.asarray([2, 5])
    g = greedy_decode(step, start, {"d": jnp.zeros((B, 1))},
                      jax.random.PRNGKey(0), max_steps=T, end_index=END)
    b, _ = beam_search(step, start, {"d": jnp.zeros((B, 1))},
                       jax.random.PRNGKey(0), max_steps=T, beam_size=1, end_index=END)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(b)[:, 0, :])


def test_beam_search_state_tracking():
    """State must follow backpointers: use a step fn whose output depends on
    an accumulated state so wrong gathers change results."""
    rng = np.random.RandomState(7)
    table = make_table(7)
    tj = jnp.asarray(table)
    bias = jnp.asarray(rng.randn(V).astype(np.float32) * 0.1)

    def step(tokens, state, rng_):
        acc = state["acc"] + tokens.astype(jnp.float32)     # path-dependent
        lp = tj[tokens] + bias * (acc[..., None] % 3)
        lp = jax.nn.log_softmax(lp, axis=-1)
        return lp, {"acc": acc}

    # numpy mirror
    def np_search():
        start = np.array([0, 3])
        predictions, backpointers = [], []
        acc = np.zeros((B, 1), np.float32) + start[:, None]
        lp0 = table[start] + np.asarray(bias) * (acc % 3)
        lp0 = lp0 - np.log(np.exp(lp0).sum(-1, keepdims=True))
        order = np.argsort(-lp0, axis=1, kind="stable")
        preds = order[:, :K]
        last_lp = np.take_along_axis(lp0, preds, axis=1)
        predictions.append(preds)
        acc = np.repeat(acc, K, axis=1)
        log_probs_after_end = np.full((V,), -np.inf, np.float32)
        log_probs_after_end[END] = 0.0
        for _ in range(T - 1):
            last = predictions[-1]
            acc = acc + last
            lp = table[last] + np.asarray(bias)[None, None] * (acc[..., None] % 3)
            lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
            lp = np.where((last == END)[..., None], log_probs_after_end, lp)
            order = np.argsort(-lp, axis=2, kind="stable")
            cls = order[:, :, :K]
            top = np.take_along_axis(lp, cls, axis=2) + last_lp[..., None]
            flat, fcls = top.reshape(B, -1), cls.reshape(B, -1)
            order = np.argsort(-flat, axis=1, kind="stable")[:, :K]
            last_lp = np.take_along_axis(flat, order, axis=1)
            predictions.append(np.take_along_axis(fcls, order, axis=1))
            bp = order // K
            backpointers.append(bp)
            acc = np.take_along_axis(acc, bp, axis=1)
        seq = [predictions[-1]]
        cur = backpointers[-1]
        for t in range(len(predictions) - 2, 0, -1):
            seq.append(np.take_along_axis(predictions[t], cur, axis=1))
            cur = np.take_along_axis(backpointers[t - 1], cur, axis=1)
        seq.append(np.take_along_axis(predictions[0], cur, axis=1))
        return np.stack(seq[::-1], 2), last_lp

    want_seq, want_lp = np_search()
    start = jnp.asarray([0, 3])
    got_seq, got_lp = beam_search(
        step, start, {"acc": start.astype(jnp.float32)},
        jax.random.PRNGKey(0), max_steps=T, beam_size=K, end_index=END)
    np.testing.assert_allclose(np.asarray(got_lp), want_lp, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_seq), want_seq)
