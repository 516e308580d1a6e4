"""Constrained Beam Search over a finite-state machine — on device.

TPU-native redesign of updown-baseline/updown/modules/cbs.py:20-277. The
reference keeps ``beam_size`` beams per FSM state and, per timestep, loops
over target states in Python, masking a dense ``(B, S, S, beam, V)`` mask
tensor (cbs.py:157-226). Here:

* the FSM is a packed ``(B, S, V) uint32`` destination bitmask
  (:func:`style_seqcvae_tpu.decoding.fsm.pack_fsm`) — bit ``i`` of
  ``packed[b, s, v]`` says token ``v`` moves state ``s`` → ``i``;
* the whole decode is one ``jax.lax.scan`` over timesteps with an inner
  ``lax.scan`` over the S target states (S is static, ≤ 24);
* the decoder state lives on a ``(B, S, K)`` grid and image features are
  never replicated (grid-broadcast step function);
* z-samples can be vmapped over this whole function for diverse decoding.

Semantics preserved exactly: first-step masking from state 0 with -inf
(cbs.py:130-141), inner-step masking with -1e20 (cbs.py:204-205),
per-(source-state, beam) ``per_node_beam_size`` pre-top-k, flat top-k over
``S*K*pnbs`` candidates per target state, backpointer = flat_idx //
per_node_beam_size (cbs.py:231), end-token freezing (cbs.py:147-181), and
backpointer sequence reconstruction (cbs.py:252-277).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from style_seqcvae_tpu.decoding.beam_search import (
    _cleaned_log_probs,
    reconstruct_sequences,
)

NEG_INF = float("-inf")
MASK_VAL = -1e20


def constrained_beam_search(
    step_fn: Callable,
    start_tokens: jnp.ndarray,      # (B,)
    init_state,                     # pytree leaves (B, ...)
    fsm_packed: jnp.ndarray,        # (B, S, V) uint32 destination bitmask
    rng: jax.Array,
    *,
    max_steps: int,
    beam_size: int,
    per_node_beam_size: int = 0,
    end_index: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(predictions (B, S, K, T), log_probabilities (B, S, K))``."""
    B, S, V = fsm_packed.shape
    K = beam_size
    pnbs = per_node_beam_size or beam_size

    def dest_mask(src_bits: jnp.ndarray, i) -> jnp.ndarray:
        """bit i of the packed mask; src_bits is any uint32 array."""
        return ((src_bits >> i.astype(jnp.uint32)) & 1).astype(bool)

    # ---- first step (reference cbs.py:125-145) ---------------------------
    rng, k0 = jax.random.split(rng)
    lp0, state = step_fn(
        start_tokens[:, None, None],
        jax.tree_util.tree_map(lambda t: t[:, None, None], init_state), k0)
    lp0 = lp0[:, 0, 0, :]                                   # (B, V)
    from_zero = fsm_packed[:, 0, :]                         # (B, V)

    def first_per_state(_, i):
        masked = jnp.where(dest_mask(from_zero, i), lp0, NEG_INF)
        top_lp, top_cls = jax.lax.top_k(masked, K)
        return None, (top_lp, top_cls)

    _, (lp_s, cls_s) = jax.lax.scan(first_per_state, None, jnp.arange(S))
    # accumulate beam scores in f32 regardless of the step dtype (bf16 steps
    # lose ~3 decimal digits over 20 summed steps — beam_search.py and
    # cbs_fast.py do the same)
    last_lp = jnp.transpose(lp_s, (1, 0, 2)).astype(jnp.float32)  # (B, S, K)
    last_preds = jnp.transpose(cls_s, (1, 0, 2))            # (B, S, K)
    start_preds_flat = last_preds.reshape(B, S * K)

    state = jax.tree_util.tree_map(
        lambda t: jnp.broadcast_to(t, (B, S, K) + t.shape[3:]), state)

    step_keys = jax.random.split(rng, max_steps - 1)

    def scan_step(carry, key):
        state, last_preds, last_lp = carry
        log_probs, new_state = step_fn(last_preds, state, key)   # (B, S, K, V)
        cleaned = _cleaned_log_probs(log_probs, last_preds, end_index)

        def target_state(_, i):
            mask = dest_mask(fsm_packed, i)[:, :, None, :]        # (B, S, 1, V)
            masked = jnp.where(mask, cleaned, MASK_VAL)
            top_lp, top_cls = jax.lax.top_k(masked, pnbs)         # (B,S,K,pnbs)
            summed = top_lp + last_lp[..., None]
            flat_lp = summed.reshape(B, S * K * pnbs)
            flat_cls = top_cls.reshape(B, S * K * pnbs)
            new_lp, idx = jax.lax.top_k(flat_lp, K)               # (B, K)
            new_cls = jnp.take_along_axis(flat_cls, idx, axis=1)
            return None, (new_lp, new_cls, idx // pnbs)

        _, (lp_i, cls_i, bp_i) = jax.lax.scan(target_state, None, jnp.arange(S))
        new_lp = jnp.transpose(lp_i, (1, 0, 2))      # (B, S, K)
        new_preds = jnp.transpose(cls_i, (1, 0, 2))  # (B, S, K)
        backptr = jnp.transpose(bp_i, (1, 0, 2)).reshape(B, S * K)  # ∈ [0, S*K)

        new_state = jax.tree_util.tree_map(
            lambda t: jnp.take_along_axis(
                t.reshape((B, S * K) + t.shape[3:]),
                backptr.reshape((B, S * K) + (1,) * (t.ndim - 3)), axis=1
            ).reshape((B, S, K) + t.shape[3:]),
            new_state)
        return (new_state, new_preds, new_lp), (new_preds.reshape(B, S * K), backptr)

    (_, _, final_lp), (preds_t, bp_t) = jax.lax.scan(
        scan_step, (state, last_preds, last_lp), step_keys)

    all_preds = jnp.concatenate([start_preds_flat[None], preds_t], axis=0)
    sequences = reconstruct_sequences(all_preds, bp_t)      # (B, S*K, T)
    return sequences.reshape(B, S, K, max_steps), final_lp
