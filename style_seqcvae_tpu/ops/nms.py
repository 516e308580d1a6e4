"""TPU-shaped non-maximum suppression.

Replaces the reference CUDA bitmask kernel (frcnn/lib/model/csrc/cuda/
nms.cu:13-131) and CPU fallback (csrc/cpu/nms_cpu.cpp). Greedy NMS is
inherently sequential in the keep decisions; the TPU formulation sorts by
score once, then runs a fixed-trip-count ``lax.fori_loop`` where iteration i
suppresses all later boxes overlapping box i — identical output ordering to
the CUDA kernel (descending score among kept boxes).

Fixed shapes: input is padded to N boxes with ``scores`` -inf/0 padding and
output is a keep mask + index list padded with -1 — no dynamic shapes under
jit. A Pallas block-bitmask variant (`style_seqcvae_tpu/ops/pallas/nms.py`)
accelerates the O(N²) inner product for large N.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _iou_one_vs_all(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one (4,) box against (N, 4) boxes; +1 widths like the CUDA
    devIoU (nms.cu:13-21)."""
    area1 = (box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
    areas = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt + 1.0, 0.0, None)
    inter = wh[:, 0] * wh[:, 1]
    return inter / (area1 + areas - inter)


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, threshold: float,
        max_out: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS.

    boxes (N, 4), scores (N,) — padding rows must carry score ≤ 0 with zero
    boxes (they suppress nothing and are dropped by callers via the mask).

    Returns ``(keep_idx (N or max_out,) int32 padded with -1, keep_mask (N,)
    bool)`` where keep_idx is sorted by descending score."""
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    sboxes = boxes[order]

    def body(i, alive):
        iou = _iou_one_vs_all(sboxes[i], sboxes)
        suppress = (iou > threshold) & (jnp.arange(N) > i) & alive[i]
        return alive & ~suppress

    alive = jax.lax.fori_loop(0, N, body, jnp.ones((N,), bool))

    keep_sorted = jnp.where(alive, jnp.arange(N), N)          # N = invalid
    ranking = jnp.argsort(keep_sorted)                        # kept first, score order
    keep_idx_sorted_domain = keep_sorted[ranking]
    valid = keep_idx_sorted_domain < N
    keep_idx = jnp.where(valid, order[jnp.clip(keep_idx_sorted_domain, 0, N - 1)], -1)

    keep_mask = jnp.zeros((N,), bool).at[order].set(alive)
    if max_out:
        keep_idx = keep_idx[:max_out]
    return keep_idx.astype(jnp.int32), keep_mask


def nms_reference(boxes, scores, threshold):
    """Pure-numpy greedy NMS mirroring csrc/cpu/nms_cpu.cpp — used as the
    golden reference in tests."""
    import numpy as np

    boxes = np.asarray(boxes, np.float64)
    scores = np.asarray(scores, np.float64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= threshold]
    return np.asarray(keep, np.int64)
