"""Pallas TPU NMS — block-bitmask formulation.

TPU-native analogue of the reference CUDA kernel
(frcnn/lib/model/csrc/cuda/nms.cu:13-131): the O(N²) IoU comparisons are
computed in parallel as a packed suppression bitmask (Pallas kernel, grid
over 128-row blocks, VPU-vectorized IoU, bits packed 32/word via a matmul
with a power-of-two vector), and the inherently sequential greedy scan
reduces over packed words (``lax.fori_loop``, O(N·N/32) word ops instead of
the naive O(N²) float ops).

Boxes must arrive sorted by descending score (the caller sorts once).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 128
COL_BLOCK = 1024


def _bitmask_kernel(rows_ref, cols_ref, out_ref, *, threshold: float,
                    col_block: int):
    """2-D grid over (row, col) tiles — nothing full-N ever sits in VMEM,
    so the kernel scales to RPN candidate counts (6k-31k boxes)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = rows_ref[:]                                        # (128, 4)
    cols = cols_ref[:]                                        # (COL_BLOCK, 4)

    rx1, ry1, rx2, ry2 = rows[:, 0:1], rows[:, 1:2], rows[:, 2:3], rows[:, 3:4]
    ax1, ay1, ax2, ay2 = cols[:, 0], cols[:, 1], cols[:, 2], cols[:, 3]
    r_area = (rx2 - rx1 + 1.0) * (ry2 - ry1 + 1.0)            # (128, 1)
    a_area = (ax2 - ax1 + 1.0) * (ay2 - ay1 + 1.0)            # (COL_BLOCK,)

    w = jnp.minimum(rx2, ax2[None, :]) - jnp.maximum(rx1, ax1[None, :]) + 1.0
    h = jnp.minimum(ry2, ay2[None, :]) - jnp.maximum(ry1, ay1[None, :]) + 1.0
    inter = jnp.maximum(w, 0.0) * jnp.maximum(h, 0.0)         # (128, COL_BLOCK)
    iou = inter / (r_area + a_area[None, :] - inter)

    # suppress only later (lower-score) boxes: global col > global row
    row_ids = (jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, col_block), 0)
               + i * ROW_BLOCK)
    col_ids = (jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, col_block), 1)
               + j * col_block)
    bits = (iou > threshold) & (col_ids > row_ids)

    out_ref[:] = bits.astype(jnp.int8)


def suppression_bitmask(boxes_sorted: jnp.ndarray, threshold: float,
                        interpret: bool = False) -> jnp.ndarray:
    """(N, 4) score-sorted boxes → (N, N/16) packed int32 suppression
    matrix (16 bits/word). N must be a multiple of 128.

    The Pallas kernel fuses IoU + threshold + upper-triangle mask and emits
    int8; the 16-bit word packing runs as an XLA reshape-dot (lane-dim
    reshapes inside Mosaic are restricted)."""
    n = boxes_sorted.shape[0]
    assert n % ROW_BLOCK == 0 and n % 16 == 0
    colb = min(COL_BLOCK, n)
    assert n % colb == 0
    mem = pl.ANY if interpret else pltpu.VMEM
    bits8 = pl.pallas_call(
        partial(_bitmask_kernel, threshold=threshold, col_block=colb),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.int8),
        grid=(n // ROW_BLOCK, n // colb),
        in_specs=[
            pl.BlockSpec((ROW_BLOCK, 4), lambda i, j: (i, 0), memory_space=mem),
            pl.BlockSpec((colb, 4), lambda i, j: (j, 0), memory_space=mem),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, colb), lambda i, j: (i, j),
                               memory_space=mem),
        interpret=interpret,
    )(boxes_sorted, boxes_sorted)
    powers = (1 << jnp.arange(16, dtype=jnp.int32))
    return jnp.sum(bits8.reshape(n, n // 16, 16).astype(jnp.int32)
                   * powers[None, None, :], axis=-1)


def _greedy_reduce(mask: jnp.ndarray) -> jnp.ndarray:
    """Packed greedy scan, word-blocked: N/16 sequential iterations, each
    resolving the 16 in-word dependencies with unrolled bit ops. Because the
    bitmask only marks LATER boxes (col > row), contributions to word w can
    only come from words <= w — already merged when w is processed."""
    n, words = mask.shape
    mask_blocks = mask.reshape(words, 16, words)

    def body(w, suppressed):
        rows = mask_blocks[w]                      # (16, words)
        base = suppressed[w]
        acc = jnp.zeros((words,), jnp.int32)
        for k in range(16):                        # static unroll
            dead = (((base >> k) & 1) | ((acc[w] >> k) & 1)) != 0
            acc = jnp.where(dead, acc, acc | rows[k])
        return suppressed | acc

    suppressed = jax.lax.fori_loop(0, words, body,
                                   jnp.zeros((words,), jnp.int32))
    bits = (suppressed[:, None] >> jnp.arange(16, dtype=jnp.int32)[None, :]) & 1
    return bits.reshape(-1)[:n] == 0


def nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray, threshold: float,
               max_out: int = 0, interpret: bool = False,
               presorted: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ops.nms.nms: returns (keep_idx desc-score-sorted padded
    with -1, keep_mask (N,)). Pads N internally to a multiple of 128.

    ``presorted=True`` promises boxes already arrive in descending-score
    order (the RPN proposal path: ``lax.top_k`` returns sorted results) and
    skips the argsort + gather — they are the dominant non-bitmask cost."""
    n = boxes.shape[0]
    # pad so both the 128-row and (for large n) 1024-col tiles divide n
    pad_to = ROW_BLOCK if n <= COL_BLOCK else COL_BLOCK
    n_pad = -(-n // pad_to) * pad_to
    if presorted:
        order = jnp.arange(n)
        sboxes = boxes
    else:
        order = jnp.argsort(-scores)
        sboxes = boxes[order]
    if n_pad != n:
        # padding boxes: zero-area at -inf score end; they suppress nothing
        sboxes = jnp.concatenate(
            [sboxes, jnp.zeros((n_pad - n, 4), boxes.dtype)], axis=0)

    mask = suppression_bitmask(sboxes, threshold, interpret=interpret)
    alive = _greedy_reduce(mask)[:n]

    keep_sorted = jnp.where(alive, jnp.arange(n), n)
    ranking = jnp.argsort(keep_sorted)
    dom = keep_sorted[ranking]
    valid = dom < n
    keep_idx = jnp.where(valid, order[jnp.clip(dom, 0, n - 1)], -1)
    keep_mask = jnp.zeros((n,), bool).at[order].set(alive)
    if max_out:
        keep_idx = keep_idx[:max_out]
    return keep_idx.astype(jnp.int32), keep_mask
