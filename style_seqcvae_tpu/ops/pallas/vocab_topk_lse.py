"""Fused vocab-head matmul + streaming top-k + logsumexp.

The CBS decode step's selection needs, per grid row, the top
``per_node_beam_size + E`` logits, their indices, and the row logsumexp
(cbs_fast.py raw path). Round 2's ``topk_lse.py`` fused the SELECTION but
still consumed a materialized (rows, V) logits tensor — the custom call
was a fusion barrier and lost to XLA (BASELINE.md "rejected kernel").

This kernel goes one level deeper: it consumes the PRE-HEAD activation
``x (R, E)`` and the tied embedding ``emb (V, E)`` and computes
``logits = x @ embᵀ`` tile-by-tile in VMEM, folding the top-k and a
streaming logsumexp into the same pass — the (R, V) logits tensor
(≈270 MB bf16 at production shapes) never exists in HBM. Per V tile the
running top-k and the tile's columns merge through one k-step
argmax-with-taken-mask over the lane-concatenated candidates; ties break
to the smallest GLOBAL index (``lax.top_k`` order). Per-logit values are
bitwise identical to XLA's own head matmul (each logit is an independent
E-reduction with the same MXU accumulation); the logsumexp differs only
by f32 tile-merge rounding.

Mosaic notes: bf16 inputs ride straight into the MXU with f32
accumulation; blocks are (Rb, E-full) / (Vb, E-full) so the only lane
dimension is the full E (600/300 — full-dim blocks need no 128 multiple);
running state lives in (Rb, 128) f32/i32 VMEM scratch, persisted across
the sequential innermost V grid dimension.

Reference semantics: cbs.py:200-226 masked per-state topk +
updown_captioner.py:443-450 tied output head.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _kernel(x_ref, w_ref, out_v, out_i, run_v, run_i, run_m, run_s,
            *, k: int, vocab: int, v_block: int, n_vblocks: int):
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _init():
        run_v[...] = jnp.full(run_v.shape, -jnp.inf, jnp.float32)
        run_i[...] = jnp.zeros(run_i.shape, jnp.int32)
        run_m[...] = jnp.full(run_m.shape, -jnp.inf, jnp.float32)
        run_s[...] = jnp.zeros(run_s.shape, jnp.float32)

    # (Rb, Vb) logits tile — bf16 (or f32) straight into the MXU, f32 acc
    logits = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + v * v_block
    valid = col < vocab
    logits = jnp.where(valid, logits, -jnp.inf)

    # streaming logsumexp merge (all--inf guarded like topk_lse.py)
    tm = jnp.max(logits, axis=1)                                   # (Rb,)
    tsafe = jnp.where(jnp.isfinite(tm), tm, 0.0)
    ts = jnp.sum(jnp.where(valid, jnp.exp(logits - tsafe[:, None]), 0.0),
                 axis=1)
    ts = jnp.where(jnp.isfinite(tm), ts, 0.0)
    m_old = run_m[:, 0]
    s_old = run_s[:, 0]
    m_new = jnp.maximum(m_old, tm)
    msafe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    s_new = (s_old * jnp.exp(jnp.where(jnp.isfinite(m_old), m_old, -jnp.inf)
                             - msafe)
             + ts * jnp.exp(jnp.where(jnp.isfinite(tm), tm, -jnp.inf) - msafe))
    run_m[...] = jnp.broadcast_to(m_new[:, None], run_m.shape)
    run_s[...] = jnp.broadcast_to(s_new[:, None], run_s.shape)

    # merge running top-k with this tile: one k-step argmax over the
    # lane-concatenated candidates (running k lanes ++ Vb tile lanes)
    lane = jax.lax.broadcasted_iota(jnp.int32, (logits.shape[0],
                                                _LANES + v_block), 1)
    cand_v = jnp.concatenate([run_v[...], logits], axis=1)
    cand_i = jnp.concatenate([run_i[...], col], axis=1)
    # lanes k.._LANES-1 of the running block are dead: mask them off
    dead = (lane < _LANES) & (lane >= k)
    taken = dead
    cand_v = jnp.where(dead, -jnp.inf, cand_v)

    new_v = run_v[...]
    new_i = run_i[...]
    out_lane = jax.lax.broadcasted_iota(jnp.int32, run_v.shape, 1)
    big = jnp.int32(2 ** 30)
    for j in range(k):
        cur = jnp.where(taken, -jnp.inf, cand_v)
        m = jnp.max(cur, axis=1)                                   # (Rb,)
        hit = (cur == m[:, None]) & ~taken
        # ties break to the smallest global index = lax.top_k order
        idx = jnp.min(jnp.where(hit, cand_i, big), axis=1)
        new_v = jnp.where(out_lane == j, m[:, None], new_v)
        new_i = jnp.where(out_lane == j, idx[:, None], new_i)
        taken = taken | (hit & (cand_i == idx[:, None]))
    run_v[...] = new_v
    run_i[...] = new_i

    @pl.when(v == n_vblocks - 1)
    def _emit():
        lse = jnp.where(jnp.isfinite(m_new),
                        m_new + jnp.log(s_new), m_new)
        out_v[...] = jnp.where(out_lane == k, lse[:, None], new_v)
        out_i[...] = new_i


def matmul_top_k_with_lse(x: jnp.ndarray, emb: jnp.ndarray, k: int, *,
                          interpret: bool = False, block_rows: int = 256,
                          block_v: int = 512):
    """``x`` (R, E) · ``emb`` (V, E)ᵀ → (vals (R, k) f32, idx (R, k) i32,
    lse (R,) f32) of the row-wise top-k logits — without materializing the
    (R, V) logits. Ties break to the lower index (``lax.top_k`` order)."""
    R, E = x.shape
    V, E2 = emb.shape
    assert E == E2, (x.shape, emb.shape)
    assert k + 1 <= _LANES, k
    rpad = (-R) % block_rows
    if rpad:
        x = jnp.concatenate([x, jnp.zeros((rpad, E), x.dtype)], axis=0)
    vpad = (-V) % block_v
    if vpad:  # padded cols masked to -inf by the col<vocab guard
        emb = jnp.concatenate([emb, jnp.zeros((vpad, E), emb.dtype)], axis=0)
    n_r = (R + rpad) // block_rows
    n_v = (V + vpad) // block_v

    vals, idx = pl.pallas_call(
        partial(_kernel, k=k, vocab=V, v_block=block_v, n_vblocks=n_v),
        grid=(n_r, n_v),
        in_specs=[
            pl.BlockSpec((block_rows, E), lambda r, v: (r, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((block_v, E), lambda r, v: (v, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, _LANES), lambda r, v: (r, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((block_rows, _LANES), lambda r, v: (r, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R + rpad, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((R + rpad, _LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_rows, _LANES), jnp.float32),   # running vals
            pltpu.VMEM((block_rows, _LANES), jnp.int32),     # running idx
            pltpu.VMEM((block_rows, _LANES), jnp.float32),   # running max
            pltpu.VMEM((block_rows, _LANES), jnp.float32),   # running sumexp
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, emb)
    return vals[:R, :k], idx[:R, :k], vals[:R, k]


def matmul_top_k_with_lse_xla(x: jnp.ndarray, emb: jnp.ndarray, k: int):
    """Pure-XLA reference: materializes the logits (CPU tests)."""
    logits = jax.lax.dot_general(
        x, emb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    vals, idx = jax.lax.top_k(logits, k)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    return vals, idx, lse
