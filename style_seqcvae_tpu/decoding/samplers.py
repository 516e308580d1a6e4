"""Stochastic decoding: top-k / top-p (nucleus) / temperature sampling.

Functional equivalents of the vendored AllenNLP samplers
(var_updown/var_updown/modules/beam_search.py:88-433: Deterministic,
Multinomial, TopK, TopP, Gumbel). The deterministic sampler IS the standard
beam search (decoding/beam_search.py); this module provides the stochastic
single-sequence samplers as a scan-based ancestral decoder.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def _filter_top_k(log_probs: jnp.ndarray, k: int) -> jnp.ndarray:
    vals, _ = jax.lax.top_k(log_probs, k)
    cutoff = vals[..., -1:]
    return jnp.where(log_probs < cutoff, NEG_INF, log_probs)


def _filter_top_p(log_probs: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering (beam_search.py TopPSampler semantics: keep the
    smallest prefix of the sorted distribution with cumulative prob >= p,
    always keeping at least one token)."""
    sorted_lp = jnp.sort(log_probs, axis=-1)[..., ::-1]
    probs = jnp.exp(sorted_lp)
    cum = jnp.cumsum(probs, axis=-1)
    # token i is kept if the cumulative mass BEFORE it is < p
    keep_sorted = jnp.concatenate(
        [jnp.ones_like(cum[..., :1], bool), cum[..., :-1] < p], axis=-1)
    cutoff = jnp.min(jnp.where(keep_sorted, sorted_lp, jnp.inf), axis=-1,
                     keepdims=True)
    return jnp.where(log_probs < cutoff, NEG_INF, log_probs)


def sample_decode(step_fn: Callable, start_tokens: jnp.ndarray, init_state,
                  rng: jax.Array, *, max_steps: int, end_index: int,
                  temperature: float = 1.0, top_k: int = 0,
                  top_p: float = 0.0) -> jnp.ndarray:
    """Ancestral sampling with optional top-k/top-p filtering.
    Returns (B, T) token ids (end-token frozen once emitted)."""
    B = start_tokens.shape[0]

    def filt(lp):
        if temperature != 1.0:
            # re-normalize so top-p operates on a proper distribution
            # (reference TopPSampler applies log_softmax(lp / temperature))
            lp = jax.nn.log_softmax(lp / temperature, axis=-1)
        if top_k:
            lp = _filter_top_k(lp, top_k)
        if top_p:
            lp = _filter_top_p(lp, top_p)
        return lp

    rng, k0, s0 = jax.random.split(rng, 3)
    lp, state = step_fn(start_tokens[:, None],
                        jax.tree_util.tree_map(lambda t: t[:, None], init_state), k0)
    first = jax.random.categorical(s0, filt(lp[:, 0, :]))

    keys = jax.random.split(rng, max_steps - 1)

    def body(carry, key):
        state, last = carry
        kstep, ksample = jax.random.split(key)
        lp, state2 = step_fn(last[:, None], state, kstep)
        nxt = jax.random.categorical(ksample, filt(lp[:, 0, :]))
        nxt = jnp.where(last == end_index, end_index, nxt)
        return (state2, nxt), nxt

    (_, _), toks = jax.lax.scan(body, (state, first), keys)
    return jnp.concatenate([first[:, None], toks.T], axis=1)


def gumbel_beam_search(step_fn: Callable, start_tokens: jnp.ndarray, init_state,
                       rng: jax.Array, *, max_steps: int, beam_size: int,
                       end_index: int):
    """Stochastic Beam Search (Kool et al. 2019; beam_search.py
    GumbelSampler): beam search over Gumbel-perturbed sequence scores,
    yielding beam_size samples WITHOUT replacement."""
    from style_seqcvae_tpu.decoding.beam_search import (
        _cleaned_log_probs, reconstruct_sequences)

    K = beam_size
    B = start_tokens.shape[0]
    rng, k0, g0 = jax.random.split(rng, 3)
    lp0, state = step_fn(start_tokens[:, None],
                         jax.tree_util.tree_map(lambda t: t[:, None], init_state), k0)
    lp0 = lp0[:, 0, :]
    V = lp0.shape[-1]
    # G(phi) with phi = lp0
    gumbel = lp0 + jax.random.gumbel(g0, lp0.shape)
    top_g, start_preds = jax.lax.top_k(gumbel, K)
    last_phi = jnp.take_along_axis(lp0, start_preds, axis=1)
    last_g = top_g
    state = jax.tree_util.tree_map(
        lambda t: jnp.broadcast_to(t, (B, K) + t.shape[2:]), state)
    last_preds = start_preds

    keys = jax.random.split(rng, max_steps - 1)

    def body(carry, key):
        state, last_preds, last_phi, last_g = carry
        kstep, kg = jax.random.split(key)
        lp, state2 = step_fn(last_preds, state, kstep)
        lp = _cleaned_log_probs(lp, last_preds, end_index)
        phi = last_phi[..., None] + lp                       # (B, K, V)
        g_phi = phi + jax.random.gumbel(kg, phi.shape)
        # condition on max: shift so max over children equals parent's G
        z = jnp.max(g_phi, axis=-1, keepdims=True)
        v = last_g[..., None] - g_phi + jnp.log1p(
            -jnp.exp(jnp.clip(g_phi - z, -30, 0)) + 1e-20)
        g_cond = last_g[..., None] - jnp.maximum(v, 0) - jnp.log1p(
            jnp.exp(-jnp.abs(v)))
        flat_g = g_cond.reshape(B, K * V)
        top_g, idx = jax.lax.top_k(flat_g, K)
        beam_idx = idx // V
        token_idx = idx % V
        new_phi = jnp.take_along_axis(phi.reshape(B, K * V), idx, axis=1)
        state2 = jax.tree_util.tree_map(
            lambda t: jnp.take_along_axis(
                t, beam_idx.reshape(beam_idx.shape + (1,) * (t.ndim - 2)), axis=1),
            state2)
        return ((state2, token_idx, new_phi, top_g),
                (token_idx, beam_idx))

    (_, _, final_phi, _), (preds_t, bp_t) = jax.lax.scan(
        body, (state, last_preds, last_phi, last_g), keys)
    all_preds = jnp.concatenate([start_preds[None], preds_t], axis=0)
    seqs = reconstruct_sequences(all_preds, bp_t)
    return seqs, final_phi
