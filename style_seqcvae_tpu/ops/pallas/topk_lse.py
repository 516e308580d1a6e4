"""Fused top-k + logsumexp over the vocabulary — the decode hot pass.

Per CBS decode step the search needs, per grid row, (a) the top
``per_node_beam_size`` NON-exception logits, (b) the raw logits of the ≤E
exception tokens, and (c) the row's logsumexp for log-prob normalization
(cbs_fast.py raw path; reference semantics cbs.py:200-226 +
updown_captioner.py:450). Expressed in XLA that is ~4 separate HBM passes
over the (rows, V) logits (masked argmax ×pnbs, logsumexp, exception
einsum) — measured ~25% of the whole CBS dispatch at production shapes.

This kernel makes ONE pass: each (8, V) row block is DMA'd to VMEM once and
yields the UNMASKED top-(pnbs+E) values/indices plus the logsumexp. Because
a state has at most E exception tokens, filtering exceptions out of the
top-(pnbs+E) afterwards (on (rows, pnbs+E) tensors — trivial) reproduces the
masked top-pnbs exactly; the exception logits themselves still come from the
one-hot einsum (its own single pass).

Mosaic notes: compute is f32 internally (16-bit dynamic sublane indexing is
restricted); argmax is max + iota-compare + min (first-occurrence ties,
matching ``jnp.argmax`` / ops.topk.small_top_k); outputs ride in (8, 128)
padded lane tiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OUT_LANES = 128


def _kernel(x_ref, v_ref, i_ref, *, k: int, vocab: int):
    x = x_ref[...].astype(jnp.float32)                   # (8, V)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)

    # logsumexp on the untouched row (stable: shift by the row max).  An
    # all--inf row makes the shift (-inf)-(-inf)=NaN; the contract (and
    # top_k_with_lse_xla) says logsumexp of such a row is -inf, so keep the
    # raw max when it is not finite.
    m1 = jnp.max(x, axis=1)                              # (8,)
    shifted = jnp.sum(jnp.exp(x - jnp.where(jnp.isfinite(m1), m1, 0.0)[:, None]),
                      axis=1)
    lse = jnp.where(jnp.isfinite(m1), m1 + jnp.log(shifted), m1)

    vals = []
    idxs = []
    # exclusion by INDEX, not by writing -inf over the value: value-masking
    # is a no-op once the running max is itself -inf, which would re-select
    # column 0 forever and break the distinct-indices contract of lax.top_k
    taken = jnp.zeros(x.shape, bool)
    for _ in range(k):
        cur = jnp.where(taken, -jnp.inf, x)
        m = jnp.max(cur, axis=1)                         # (8,)
        hit = (cur == m[:, None]) & ~taken
        idx = jnp.min(jnp.where(hit, col, vocab), axis=1)  # first occurrence
        vals.append(m)
        idxs.append(idx)
        taken = taken | (col == idx[:, None])

    # assemble the (8, 128) output tiles with static-lane selects (single
    # whole-tile stores; lane-sliced stores are fragile in Mosaic)
    lane = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], _OUT_LANES), 1)
    out_v = jnp.where(lane == k, lse[:, None], 0.0).astype(jnp.float32)
    out_i = jnp.zeros(lane.shape, jnp.int32)
    for j in range(k):
        out_v = jnp.where(lane == j, vals[j][:, None], out_v)
        out_i = jnp.where(lane == j, idxs[j][:, None], out_i)
    v_ref[...] = out_v
    i_ref[...] = out_i


def top_k_with_lse(logits: jnp.ndarray, k: int, *, interpret: bool = False,
                   block_rows: int = 8):
    """logits (R, V) → (vals (R, k) f32, idx (R, k) i32, lse (R,) f32).

    One HBM pass per row block; R must be a multiple of 8 (the production
    decode grid B·S·K is). Equals ``lax.top_k`` + ``logsumexp`` (ties break
    to the first occurrence, like ``jnp.argmax``)."""
    R, V = logits.shape
    assert k + 1 <= _OUT_LANES, k
    pad = (-R) % block_rows
    if pad:  # production decode grids are 8-aligned; pad only small tests
        logits = jnp.concatenate(
            [logits, jnp.zeros((pad, V), logits.dtype)], axis=0)

    grid = ((R + pad) // block_rows,)
    vals, idx = pl.pallas_call(
        partial(_kernel, k=k, vocab=V),
        grid=grid,
        in_specs=[pl.BlockSpec(
            (block_rows, V), lambda r: (r, 0),
            memory_space=pl.ANY if interpret else pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((block_rows, _OUT_LANES), lambda r: (r, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((block_rows, _OUT_LANES), lambda r: (r, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R + pad, _OUT_LANES), jnp.float32),
            jax.ShapeDtypeStruct((R + pad, _OUT_LANES), jnp.int32),
        ],
        interpret=interpret,
    )(logits)
    return vals[:R, :k], idx[:R, :k], vals[:R, k]


def top_k_with_lse_xla(logits: jnp.ndarray, k: int):
    """Pure-XLA fallback (CPU tests / non-TPU backends): same contract."""
    lf = logits.astype(jnp.float32)
    vals, idx = jax.lax.top_k(lf, k)
    lse = jax.scipy.special.logsumexp(lf, axis=-1)
    return vals, idx, lse
