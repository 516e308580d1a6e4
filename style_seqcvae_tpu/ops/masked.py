"""Masked reductions matching AllenNLP semantics.

The reference uses ``allennlp.nn.util.masked_softmax`` / ``masked_mean`` in
its attention and feature pooling (updown-baseline/updown/modules/
attention.py:93, updown_cell.py:266). These are ordinary softmax/mean with
zero-weighting of masked entries; AllenNLP's masked_softmax multiplies the
post-softmax result by the mask and renormalizes with a 1e-13 floor.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """AllenNLP-style masked softmax: softmax over logits, zero out masked
    entries, renormalize (with tiny epsilon to avoid 0/0 on fully-masked
    rows)."""
    mask = mask.astype(logits.dtype)
    masked_logits = jnp.where(mask > 0, logits, -jnp.inf)
    mx = jnp.max(masked_logits, axis=axis, keepdims=True)
    # Fully-masked rows: mx is -inf and (logits - mx) would be +inf/nan —
    # and because jax.grad evaluates BOTH where-branches, that nan leaks
    # into the GRADIENT even when the forward value is re-zeroed (a batch
    # containing one zero-detection image NaN'd whole training runs).
    # Keeping mx finite keeps every branch's arithmetic finite; the -inf
    # constant below is grad-free (exp(-inf) = 0 with zero gradient).
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    probs = jnp.exp(jnp.where(mask > 0, logits - mx, -jnp.inf))
    denom = jnp.sum(probs, axis=axis, keepdims=True) + 1e-13
    return probs / denom


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Mean over ``axis`` counting only unmasked elements.

    ``mask`` must broadcast against ``x`` (e.g. (B, N, 1) against (B, N, F)).
    Uses AllenNLP's tiny-denominator guard (min value 1e-13 of the count).
    """
    mask = mask.astype(x.dtype)
    total = jnp.sum(x * mask, axis=axis)
    count = jnp.sum(mask, axis=axis)
    return total / jnp.maximum(count, 1e-13)
