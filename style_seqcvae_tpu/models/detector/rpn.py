"""Region Proposal Network + proposal layer + anchor-target layer.

TPU-native redesign of frcnn/lib/model/rpn/{rpn.py, proposal_layer.py,
anchor_target_layer.py}. Everything is fixed-shape:

* the proposal layer decodes ALL grid anchors, takes a static
  ``pre_nms_top_n`` by score, runs greedy NMS, and emits exactly
  ``post_nms_top_n`` rois (zero-padded, like the reference's padded output
  at proposal_layer.py:133-160);
* the anchor-target layer replaces the reference's per-image Python
  subsampling loops (anchor_target_layer.py:125-146) with masked random
  top-k selection under an explicit PRNG key — statistically identical
  (uniform subset without replacement), not bitwise.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.ops.boxes import bbox_overlaps, bbox_transform, bbox_transform_inv, clip_boxes
from style_seqcvae_tpu.ops.nms import nms


class RPNConfig(NamedTuple):
    feat_stride: int = 16
    anchor_scales: Tuple[int, ...] = (4, 8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    pre_nms_top_n: int = 12000
    post_nms_top_n: int = 2000
    nms_thresh: float = 0.7
    rpn_batch_size: int = 256
    fg_fraction: float = 0.5
    positive_overlap: float = 0.7
    negative_overlap: float = 0.3
    allowed_border: int = 0
    clobber_positives: bool = False


def init_rpn(key, in_ch: int = 1024, num_anchors: int = 12, dtype=jnp.float32) -> Dict[str, Any]:
    """3x3 conv → 512, then 1x1 heads. Reference init: normal(0, 0.01)
    (faster_rcnn.py:221-236)."""
    k = jax.random.split(key, 3)

    def conv(kk, shape):
        return {"w": jax.random.normal(kk, shape, dtype) * 0.01,
                "b": jnp.zeros((shape[-1],), dtype)}

    return {
        "conv": conv(k[0], (3, 3, in_ch, 512)),
        "cls": conv(k[1], (1, 1, 512, num_anchors * 2)),
        "bbox": conv(k[2], (1, 1, 512, num_anchors * 4)),
    }


def _conv(x, p, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def rpn_heads(params, base_feat: jnp.ndarray):
    """(B, h, w, C) → cls logits (B, h, w, A, 2), deltas (B, h, w, A, 4)."""
    x = jax.nn.relu(_conv(base_feat, params["conv"]))
    B, h, w, _ = x.shape
    cls = _conv(x, params["cls"]).reshape(B, h, w, -1, 2)
    bbox = _conv(x, params["bbox"]).reshape(B, h, w, -1, 4)
    return cls, bbox


def proposal_layer(cls_logits, bbox_deltas, all_anchors, im_info, *,
                   pre_nms_top_n: int, post_nms_top_n: int, nms_thresh: float,
                   use_pallas_nms: Optional[bool] = None):
    """Decode + clip + top-k + NMS → (B, post_nms_top_n, 5) rois
    [batch_idx, x1, y1, x2, y2] (proposal_layer.py:49-160). Padding rois are
    all-zero."""
    B = cls_logits.shape[0]
    N = all_anchors.shape[0]
    scores = jax.nn.softmax(cls_logits, axis=-1)[..., 1].reshape(B, N)
    deltas = bbox_deltas.reshape(B, N, 4)
    proposals = bbox_transform_inv(jnp.broadcast_to(all_anchors, (B, N, 4)), deltas)
    # im_info rows: (height, width, scale)
    proposals = jax.vmap(lambda p, info: clip_boxes(p, info[0], info[1]))(proposals, im_info)

    k = min(pre_nms_top_n, N)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_props = jnp.take_along_axis(proposals, top_idx[..., None], axis=1)

    if use_pallas_nms is None:
        # the Pallas bitmask kernel wins for large candidate sets on TPU
        use_pallas_nms = (jax.default_backend() == "tpu" and k >= 1024)

    def per_image(props, scs):
        if use_pallas_nms:
            from style_seqcvae_tpu.ops.pallas.nms import nms_pallas

            # top_k already returned candidates in descending-score order
            keep_idx, _ = nms_pallas(props, scs, nms_thresh,
                                     max_out=post_nms_top_n, presorted=True)
        else:
            keep_idx, _ = nms(props, scs, nms_thresh, max_out=post_nms_top_n)
        if keep_idx.shape[0] < post_nms_top_n:
            # fewer candidates than the post-NMS budget (pre < post): pad
            # with -1 rows, matching the reference's zero-padded proposals
            keep_idx = jnp.pad(keep_idx, (0, post_nms_top_n - keep_idx.shape[0]),
                               constant_values=-1)
        valid = keep_idx >= 0
        safe = jnp.clip(keep_idx, 0, k - 1)
        out_boxes = jnp.where(valid[:, None], props[safe], 0.0)
        out_scores = jnp.where(valid, scs[safe], 0.0)
        return out_boxes, out_scores, valid

    # The reference detaches proposals (rpn.py:74-75 passes .data) — detach
    # BEFORE NMS so the Pallas kernel never sees tangents (no JVP rule).
    top_props = jax.lax.stop_gradient(top_props)
    top_scores = jax.lax.stop_gradient(top_scores)
    boxes, out_scores, valid = jax.vmap(per_image)(top_props, top_scores)
    batch_col = jnp.broadcast_to(
        jnp.arange(B, dtype=boxes.dtype)[:, None, None], (B, post_nms_top_n, 1))
    rois = jnp.concatenate([batch_col, boxes], axis=-1)
    # The reference detaches proposals (rpn.py:74-75 passes .data); rois are
    # training DATA, not a differentiable function of the RPN heads.
    return jax.lax.stop_gradient(rois), jax.lax.stop_gradient(out_scores), valid


def _random_subsample(mask: jnp.ndarray, num_keep: jnp.ndarray, key) -> jnp.ndarray:
    """Randomly keep ``num_keep`` True entries of ``mask`` (disable rest).
    Fixed-shape equivalent of the reference's randperm disabling
    (anchor_target_layer.py:125-146)."""
    n = mask.shape[0]
    priority = jnp.where(mask, jax.random.uniform(key, (n,)), -1.0)
    order = jnp.argsort(-priority)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return mask & (rank < num_keep)


def anchor_target(cls_shape_hw: Tuple[int, int], all_anchors: jnp.ndarray,
                  gt_boxes: jnp.ndarray, num_gt: jnp.ndarray, im_info: jnp.ndarray,
                  key, cfg: RPNConfig):
    """Per-image RPN labels/targets (anchor_target_layer.py:48-194).

    gt_boxes (B, G, 5); num_gt (B,). Returns labels (B, N) ∈ {-1, 0, 1},
    bbox_targets (B, N, 4), inside/outside weights (B, N, 1)."""
    B = gt_boxes.shape[0]
    N = all_anchors.shape[0]

    inside = ((all_anchors[:, 0] >= -cfg.allowed_border)
              & (all_anchors[:, 1] >= -cfg.allowed_border)
              & (all_anchors[:, 2] < im_info[0, 1] + cfg.allowed_border)
              & (all_anchors[:, 3] < im_info[0, 0] + cfg.allowed_border))

    def per_image(gt, n_gt, k):
        G = gt.shape[0]
        gt_valid = jnp.arange(G) < n_gt
        ov = bbox_overlaps(all_anchors, gt[:, :4])               # (N, G)
        ov = jnp.where(gt_valid[None, :], ov, -1.0)
        max_ov = jnp.max(ov, axis=1)
        argmax_ov = jnp.argmax(ov, axis=1)
        gt_max = jnp.max(jnp.where(inside[:, None], ov, -1.0), axis=0)  # (G,)
        gt_max = jnp.where(gt_max == 0, 1e-5, gt_max)

        labels = jnp.full((N,), -1.0)
        if not cfg.clobber_positives:
            labels = jnp.where(inside & (max_ov < cfg.negative_overlap), 0.0, labels)
        # anchors matching per-gt max overlap
        is_best = jnp.any((ov == gt_max[None, :]) & gt_valid[None, :], axis=1)
        labels = jnp.where(inside & is_best, 1.0, labels)
        labels = jnp.where(inside & (max_ov >= cfg.positive_overlap), 1.0, labels)
        if cfg.clobber_positives:
            labels = jnp.where(inside & (max_ov < cfg.negative_overlap), 0.0, labels)

        k1, k2 = jax.random.split(k)
        num_fg = int(cfg.fg_fraction * cfg.rpn_batch_size)
        fg_mask = labels == 1
        fg_keep = _random_subsample(fg_mask, jnp.minimum(jnp.sum(fg_mask), num_fg), k1)
        labels = jnp.where(fg_mask & ~fg_keep, -1.0, labels)
        num_bg = cfg.rpn_batch_size - jnp.sum(labels == 1)
        bg_mask = labels == 0
        bg_keep = _random_subsample(bg_mask, jnp.minimum(jnp.sum(bg_mask), num_bg), k2)
        labels = jnp.where(bg_mask & ~bg_keep, -1.0, labels)

        targets = bbox_transform(all_anchors, gt[argmax_ov, :4])
        num_examples = jnp.maximum(jnp.sum(labels >= 0), 1)
        inside_w = jnp.where(labels == 1, 1.0, 0.0)
        outside_w = jnp.where(labels >= 0, 1.0 / num_examples, 0.0)
        return labels, targets, inside_w, outside_w

    keys = jax.random.split(key, B)
    return jax.vmap(per_image)(gt_boxes, num_gt, keys)


def rpn_losses(cls_logits, bbox_deltas, labels, bbox_targets, inside_w, outside_w):
    """RPN CE over sampled anchors + smooth-L1(sigma=3) (rpn.py:85-108)."""
    B = cls_logits.shape[0]
    logits = cls_logits.reshape(B, -1, 2)
    mask = labels >= 0
    lab = jnp.clip(labels, 0, 1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, lab[..., None], axis=-1)[..., 0]
    loss_cls = jnp.sum(jnp.where(mask, ce, 0.0)) / jnp.maximum(jnp.sum(mask), 1)

    deltas = bbox_deltas.reshape(B, -1, 4)
    loss_box = smooth_l1_loss(deltas, bbox_targets, inside_w[..., None],
                              outside_w[..., None], sigma=3.0,
                              reduce_dims=(1, 2))
    return loss_cls, loss_box


def smooth_l1_loss(pred, target, inside_w, outside_w, sigma=1.0,
                   reduce_dims=(1,)):
    """net_utils.py:71-86 semantics: sum over reduce_dims then mean."""
    sigma2 = sigma ** 2
    diff = inside_w * (pred - target)
    ad = jnp.abs(diff)
    flag = (ad < 1.0 / sigma2).astype(pred.dtype)
    loss = flag * 0.5 * sigma2 * diff ** 2 + (1 - flag) * (ad - 0.5 / sigma2)
    loss = outside_w * loss
    loss = jnp.sum(loss, axis=reduce_dims)
    return jnp.mean(loss)
