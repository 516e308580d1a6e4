"""Vectorized beam search with AllenNLP semantics.

TPU-native redesign of the vendored AllenNLP ``BeamSearch``
(var_updown/var_updown/modules/beam_search.py:434-769, deterministic
sampler). The per-timestep Python loop becomes one ``jax.lax.scan`` with a
static step count; early break when all beams end (reference :673-677) is
replaced by end-token freezing, which produces identical sequences/scores
because ended beams emit ``end`` with log-prob 0 forever (reference
:656-665).

Semantics preserved:
* ``per_node_beam_size`` candidate pre-selection per beam (reference
  wiring uses ``beam_size // 2 or beam_size``, updown_captioner.py:129-135),
* backpointer = flat index // per_node_beam_size (reference :745),
* sequence reconstruction by reverse backpointer walk (reference :489-515).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from style_seqcvae_tpu.ops.topk import small_top_k

NEG_INF = float("-inf")


def _cleaned_log_probs(log_probs: jnp.ndarray, last_preds: jnp.ndarray,
                       end_index: int) -> jnp.ndarray:
    """Freeze ended beams: once a beam emitted ``end``, it can only emit
    ``end`` again, contributing 0 log-prob (AllenNLP beam_search.py:686-696)."""
    vocab = log_probs.shape[-1]
    after_end = jnp.full((vocab,), NEG_INF, log_probs.dtype).at[end_index].set(0.0)
    ended = (last_preds == end_index)[..., None]
    return jnp.where(ended, after_end, log_probs)


def reconstruct_sequences(predictions: jnp.ndarray, backpointers: jnp.ndarray) -> jnp.ndarray:
    """predictions: (T, B, K); backpointers: (T-1, B, K) → (B, K, T).

    Implements the reference's reverse walk (beam_search.py:489-515) as a
    reversed ``lax.scan``."""
    T, B, K = predictions.shape
    identity = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (B, K))
    # bp_prev[t] maps beam index at time t back to time t-1 (identity at t=0).
    bp_prev = jnp.concatenate([identity[None], backpointers], axis=0)  # (T, B, K)

    def step(carry, xs):
        preds_t, bp_t = xs
        out = jnp.take_along_axis(preds_t, carry, axis=1)
        new_carry = jnp.take_along_axis(bp_t, carry, axis=1)
        return new_carry, out

    _, outs = jax.lax.scan(step, identity, (predictions, bp_prev), reverse=True)
    return jnp.transpose(outs, (1, 2, 0))  # (B, K, T)


def beam_search(
    step_fn: Callable,
    start_tokens: jnp.ndarray,   # (B,)
    init_state,                  # pytree with leaves (B, ...) — no beam dim
    rng: jax.Array,
    *,
    max_steps: int,
    beam_size: int,
    per_node_beam_size: int = 0,
    end_index: int,
    noise: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(predictions (B, K, T), log_probabilities (B, K))``.

    ``step_fn(tokens, state, rng) -> (log_probs, new_state)`` operates on
    tokens of shape (B, ...) with matching state leaves — the captioner's
    grid-broadcasting step (captioner.make_step_fn).

    ``noise``: optional precomputed z-noise, shape (max_steps, ...) with rows
    broadcastable to the step grid + (z,) — e.g. (max_steps, 1, 1, z). When
    given, rows are passed to the step fn instead of PRNG keys (the optimized
    step fn treats a floating ``rng`` as the eps slice; same contract as
    cbs_fast). Used by cross-framework parity tests that must share the
    exact eps sequence with a torch reference."""
    K = beam_size
    pnbs = per_node_beam_size or beam_size
    B = start_tokens.shape[0]

    # --- first step: (B,) → top beam_size ---------------------------------
    if noise is None:
        rng, k0 = jax.random.split(rng)
    else:
        assert noise.shape[0] == max_steps, (
            f"noise must have max_steps={max_steps} rows, got {noise.shape[0]}"
            " (the scan length comes from noise[1:] — a short/long array"
            " would silently change the output T)")
        k0 = noise[0]
    start_lp, state = step_fn(start_tokens[:, None], _add_beam_dim(init_state), k0)
    start_lp = start_lp[:, 0, :]                       # (B, V)
    vocab = start_lp.shape[-1]
    last_lp, start_preds = jax.lax.top_k(start_lp, K)  # (B, K)
    last_lp = last_lp.astype(jnp.float32)  # accumulate scores in f32
    state = _tile_beam(state, K)
    last_preds = start_preds

    step_keys = (jax.random.split(rng, max_steps - 1) if noise is None
                 else noise[1:])

    def scan_step(carry, key):
        state, last_preds, last_lp = carry
        log_probs, new_state = step_fn(last_preds, state, key)   # (B, K, V)
        cleaned = _cleaned_log_probs(log_probs, last_preds, end_index)
        top_lp, top_classes = small_top_k(cleaned, pnbs)         # (B, K, pnbs)
        summed = top_lp.astype(jnp.float32) + last_lp[..., None]
        flat_lp = summed.reshape(B, K * pnbs)
        flat_classes = top_classes.reshape(B, K * pnbs)
        new_lp, flat_idx = jax.lax.top_k(flat_lp, K)             # (B, K)
        new_preds = jnp.take_along_axis(flat_classes, flat_idx, axis=1)
        backptr = flat_idx // pnbs                               # ancestor beam
        new_state = jax.tree_util.tree_map(
            lambda t: jnp.take_along_axis(
                t, backptr.reshape(backptr.shape + (1,) * (t.ndim - 2)), axis=1),
            new_state)
        return (new_state, new_preds, new_lp), (new_preds, backptr)

    (_, _, final_lp), (preds_t, bp_t) = jax.lax.scan(
        scan_step, (state, last_preds, last_lp), step_keys)

    all_preds = jnp.concatenate([start_preds[None], preds_t], axis=0)  # (T, B, K)
    sequences = reconstruct_sequences(all_preds, bp_t)
    return sequences, final_lp


def greedy_decode(step_fn, start_tokens, init_state, rng, *, max_steps: int,
                  end_index: int, noise=None) -> jnp.ndarray:
    """Greedy (beam=1) decode; returns (B, T). Equivalent to beam_size=1
    beam search but cheaper (no topk bookkeeping). ``noise``: see
    :func:`beam_search`."""
    B = start_tokens.shape[0]
    if noise is None:
        rng, k0 = jax.random.split(rng)
    else:
        assert noise.shape[0] == max_steps, (
            f"noise must have max_steps={max_steps} rows, got {noise.shape[0]}")
        k0 = noise[0]
    lp, state = step_fn(start_tokens[:, None], _add_beam_dim(init_state), k0)
    first = jnp.argmax(lp[:, 0, :], axis=-1)
    step_keys = (jax.random.split(rng, max_steps - 1) if noise is None
                 else noise[1:])

    def scan_step(carry, key):
        state, last = carry
        lp, new_state = step_fn(last[:, None], state, key)
        nxt = jnp.argmax(lp[:, 0, :], axis=-1)
        nxt = jnp.where(last == end_index, end_index, nxt)
        return (new_state, nxt), nxt

    (_, _), toks = jax.lax.scan(scan_step, (state, first), step_keys)
    return jnp.concatenate([first[:, None], toks.T], axis=1)


def _add_beam_dim(state):
    return jax.tree_util.tree_map(lambda t: t[:, None], state)


def _tile_beam(state, k: int):
    return jax.tree_util.tree_map(
        lambda t: jnp.broadcast_to(t, (t.shape[0], k) + t.shape[2:]), state)
