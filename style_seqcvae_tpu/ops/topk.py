"""Small-k top-k via iterative argmax.

``lax.top_k`` lowers to a full sort on TPU — wasteful for the tiny k used in
beam search (per_node_beam_size = beam//2, typically 2). For static small k,
k passes of (max, argmax, mask) are k·O(V) VPU ops with no sort.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def small_top_k(x: jnp.ndarray, k: int, iterative_threshold: int = 8
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k along the last axis. Uses iterative argmax for k <=
    ``iterative_threshold``, otherwise falls back to ``lax.top_k``."""
    if k > iterative_threshold:
        return jax.lax.top_k(x, k)
    vals, idxs = [], []
    # lazily-masked chain: the arange-compare fuses into the next reduction
    # (no (… , V) bool/one-hot materialization between iterations).
    col = jnp.arange(x.shape[-1], dtype=jnp.int32)
    cur = x
    for _ in range(k):
        idx = jnp.argmax(cur, axis=-1)
        val = jnp.max(cur, axis=-1)
        vals.append(val)
        idxs.append(idx)
        cur = jnp.where(col == idx[..., None], -jnp.inf, cur)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)
