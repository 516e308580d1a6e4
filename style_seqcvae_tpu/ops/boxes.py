"""Box geometry ops: deltas, clipping, IoU.

Vectorized JAX equivalents of frcnn/lib/model/rpn/bbox_transform.py:15-257
and the Cython IoU matrix (frcnn/lib/model/utils/bbox.pyx). All functions are
batched and fixed-shape (padding boxes are handled by callers via masks).
Box convention: (x1, y1, x2, y2) inclusive, widths = x2 - x1 + 1 (legacy
Faster R-CNN convention, matching the reference exactly).
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_transform(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Regression targets from example boxes to ground-truth boxes
    (bbox_transform.py:15-34). Shapes (..., 4) → (..., 4)."""
    ex_w = ex_rois[..., 2] - ex_rois[..., 0] + 1.0
    ex_h = ex_rois[..., 3] - ex_rois[..., 1] + 1.0
    ex_cx = ex_rois[..., 0] + 0.5 * ex_w
    ex_cy = ex_rois[..., 1] + 0.5 * ex_h
    gt_w = gt_rois[..., 2] - gt_rois[..., 0] + 1.0
    gt_h = gt_rois[..., 3] - gt_rois[..., 1] + 1.0
    gt_cx = gt_rois[..., 0] + 0.5 * gt_w
    gt_cy = gt_rois[..., 1] + 0.5 * gt_h
    return jnp.stack([
        (gt_cx - ex_cx) / ex_w,
        (gt_cy - ex_cy) / ex_h,
        jnp.log(gt_w / ex_w),
        jnp.log(gt_h / ex_h),
    ], axis=-1)


def bbox_transform_inv(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Apply predicted deltas to boxes (bbox_transform.py:117-151).

    boxes (..., N, 4); deltas (..., N, 4*k) → (..., N, 4*k)."""
    widths = boxes[..., 2] - boxes[..., 0] + 1.0
    heights = boxes[..., 3] - boxes[..., 1] + 1.0
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = deltas[..., 0::4]
    dy = deltas[..., 1::4]
    # Clamp log-space sizes so exp never overflows to inf (a divergence
    # safeguard the reference lacks; 10 ≈ e^10 ≈ 22k× never binds in
    # sane training).
    dw = jnp.clip(deltas[..., 2::4], -10.0, 10.0)
    dh = jnp.clip(deltas[..., 3::4], -10.0, 10.0)

    pred_cx = dx * widths[..., None] + ctr_x[..., None]
    pred_cy = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    out = jnp.stack([
        pred_cx - 0.5 * pred_w,
        pred_cy - 0.5 * pred_h,
        pred_cx + 0.5 * pred_w,
        pred_cy + 0.5 * pred_h,
    ], axis=-1)  # (..., N, k, 4)
    return out.reshape(deltas.shape)


def clip_boxes(boxes: jnp.ndarray, im_h, im_w) -> jnp.ndarray:
    """Clip to image bounds (bbox_transform.py:190-218). Supports 4k last
    dims like the reference's batched variant."""
    x = jnp.clip(boxes[..., 0::4], 0, im_w - 1)
    y = jnp.clip(boxes[..., 1::4], 0, im_h - 1)
    x2 = jnp.clip(boxes[..., 2::4], 0, im_w - 1)
    y2 = jnp.clip(boxes[..., 3::4], 0, im_h - 1)
    return jnp.stack([x, y, x2, y2], axis=-1).reshape(boxes.shape)


def bbox_overlaps(boxes: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """IoU matrix (N, 4) × (M, 4) → (N, M) (bbox.pyx /
    bbox_transform.py:223-257 semantics, +1 widths)."""
    area_q = ((query[..., :, 2] - query[..., :, 0] + 1.0)
              * (query[..., :, 3] - query[..., :, 1] + 1.0))
    area_b = ((boxes[..., :, 2] - boxes[..., :, 0] + 1.0)
              * (boxes[..., :, 3] - boxes[..., :, 1] + 1.0))
    lt = jnp.maximum(boxes[..., :, None, :2], query[..., None, :, :2])
    rb = jnp.minimum(boxes[..., :, None, 2:4], query[..., None, :, 2:4])
    wh = jnp.clip(rb - lt + 1.0, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_b[..., :, None] + area_q[..., None, :] - inter
    return inter / union
