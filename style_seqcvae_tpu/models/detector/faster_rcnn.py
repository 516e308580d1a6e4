"""Faster R-CNN with per-RoI multi-label attribute head — full assembly.

TPU-native redesign of frcnn/lib/model/faster_rcnn/faster_rcnn.py:22-313 +
resnet.py:220-294:

backbone (C4) → RPN → proposal layer → [train: proposal-target sampling] →
RoIAlign → layer4+GAP (2048-d bottom-up feature) → class head (softmax),
class-specific bbox head, **attribute head** (sigmoid multi-label, class-
balanced loss, reference faster_rcnn.py:278-313 / trained with 0.5 weight,
trainval_net.py:345-346).

Everything is one jittable function per mode; losses mirror the reference:
RPN CE + smooth-L1(σ=3), RCNN CE + smooth-L1(σ=1, per-class-gathered
deltas), CB sigmoid attribute loss averaged over RoIs that carry attributes.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.models.detector import resnet
from style_seqcvae_tpu.models.detector.anchors import generate_anchors, shifted_anchors
from style_seqcvae_tpu.models.detector.rpn import (
    RPNConfig,
    anchor_target,
    init_rpn,
    proposal_layer,
    rpn_heads,
    rpn_losses,
    smooth_l1_loss,
)
from style_seqcvae_tpu.models.detector.targets import ProposalTargetConfig, proposal_target
from style_seqcvae_tpu.ops.roi_align import roi_align, roi_pool


class DetectorConfig(NamedTuple):
    num_classes: int = 81
    num_att_classes: int = 196
    backbone: str = "resnet"            # "resnet" | "vgg16" (no att head on vgg in the reference)
    depth: int = 101
    pooling_mode: str = "align"          # cfgs/res101.yml:17
    pooling_size: int = 7
    feat_stride: int = 16
    anchor_scales: Tuple[int, ...] = (4, 8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    class_agnostic: bool = False
    rpn: RPNConfig = RPNConfig()
    pt: ProposalTargetConfig = ProposalTargetConfig()
    cb_beta: float = 0.9                 # faster_rcnn.py:195 call site
    cb_gamma: float = 1.0                # focal modulator exponent (cb_loss)
    cb_loss_type: str = "sigmoid"        # "sigmoid" | "focal" | "softmax"
    att_loss_weight: float = 0.5         # trainval_net.py:345-346
    remat: bool = False                  # checkpoint backbone bottlenecks

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_scales) * len(self.anchor_ratios)


def init_detector(key, cfg: DetectorConfig, dtype=jnp.float32) -> Dict[str, Any]:
    k = jax.random.split(key, 5)
    if cfg.backbone == "vgg16":
        from style_seqcvae_tpu.models.detector import vgg

        params: Dict[str, Any] = {"vgg": vgg.init_vgg16(k[0], dtype)}
        params["rpn"] = init_rpn(k[1], 512, cfg.num_anchors, dtype)
    else:
        params = {"resnet": resnet.init_resnet(k[0], cfg.depth, dtype)}
        params["rpn"] = init_rpn(k[1], 1024, cfg.num_anchors, dtype)

    def linear(kk, fan_in, out, std):
        return {"w": jax.random.normal(kk, (fan_in, out), dtype) * std,
                "b": jnp.zeros((out,), dtype)}

    # reference init: cls 0.01, bbox 0.001 (faster_rcnn.py:221-244);
    # attribute head: normal 0.01 with bias init (resnet.py:245-248 /
    # faster_rcnn.py:238).
    feat_dim = 4096 if cfg.backbone == "vgg16" else 2048
    params["cls_score"] = linear(k[2], feat_dim, cfg.num_classes, 0.01)
    bbox_out = 4 if cfg.class_agnostic else 4 * cfg.num_classes
    params["bbox_pred"] = linear(k[3], feat_dim, bbox_out, 0.001)
    if cfg.num_att_classes and cfg.backbone != "vgg16":
        # the reference VGG variant has no attribute head (vgg16.py)
        params["cls_score_atts"] = linear(k[4], feat_dim, cfg.num_att_classes, 0.01)
    return params


def _linear(p, x):
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


def _backbone(params, cfg: DetectorConfig, images):
    if cfg.backbone == "vgg16":
        from style_seqcvae_tpu.models.detector import vgg

        return vgg.backbone(params["vgg"], images)
    return resnet.backbone(params["resnet"], images, remat=cfg.remat)


def _pool_rois(params, cfg: DetectorConfig, base_feat, rois_flat,
               inference: bool = False):
    if cfg.remat and not inference and cfg.pooling_mode == "align":
        # The XLA-gather RoIAlign materializes the 4-corner sampled tensor
        # (R, 7, 7, S, S, 4, C) — ~6.6 GB bf16 at bs=16 — before reducing.
        # Under remat, map over roi chunks sequentially (peak = one chunk)
        # and recompute per chunk in the backward.
        R = rois_flat.shape[0]
        n_chunks = max(1, R // 512)
        pad = (-R) % n_chunks     # pad rather than silently skip chunking
        rois_p = (jnp.concatenate(
            [rois_flat, jnp.zeros((pad, 5), rois_flat.dtype)], axis=0)
            if pad else rois_flat)
        chunks = rois_p.reshape(n_chunks, (R + pad) // n_chunks, 5)
        pooled = jax.lax.map(
            jax.checkpoint(lambda r: roi_align(
                base_feat, r, spatial_scale=1.0 / cfg.feat_stride,
                pooled_height=cfg.pooling_size,
                pooled_width=cfg.pooling_size, sampling_ratio=2)),
            chunks)
        pooled = pooled.reshape((R + pad,) + pooled.shape[2:])[:R]
        pooled = pooled.astype(base_feat.dtype)
        if cfg.backbone == "vgg16":
            from style_seqcvae_tpu.models.detector import vgg

            return vgg.head_to_tail(params["vgg"], pooled)
        return resnet.head_to_tail(params["resnet"], pooled)
    if cfg.pooling_mode == "align":
        if inference and jax.default_backend() == "tpu":
            # forward-only Pallas kernel (exact; no vjp — training uses the
            # differentiable XLA gather); channel-split grid keeps the VMEM
            # window batch-size-independent
            from style_seqcvae_tpu.ops.pallas.roi_align import roi_align_pallas

            pooled = roi_align_pallas(
                base_feat, rois_flat, spatial_scale=1.0 / cfg.feat_stride,
                pooled_height=cfg.pooling_size, pooled_width=cfg.pooling_size,
                sampling_ratio=2)
        else:
            pooled = roi_align(base_feat, rois_flat,
                               spatial_scale=1.0 / cfg.feat_stride,
                               pooled_height=cfg.pooling_size,
                               pooled_width=cfg.pooling_size, sampling_ratio=2)
    elif cfg.pooling_mode == "crop":
        # spatial-transformer mode (cfg.POOLING_MODE == 'crop',
        # net_utils.py:87-135): affine grid + bilinear sample + 2x2 max-pool
        from style_seqcvae_tpu.ops.roi_crop import roi_crop

        pooled = roi_crop(base_feat, rois_flat,
                          spatial_scale=1.0 / cfg.feat_stride,
                          pooled_height=cfg.pooling_size,
                          pooled_width=cfg.pooling_size, max_pool=True)
    else:
        pooled = roi_pool(base_feat, rois_flat, spatial_scale=1.0 / cfg.feat_stride,
                          pooled_height=cfg.pooling_size, pooled_width=cfg.pooling_size)
    # the gather math promotes through the f32 rois — keep the feature dtype
    # so a bf16-compute backbone flows through layer4 unchanged (f32 no-op)
    pooled = pooled.astype(base_feat.dtype)
    if cfg.backbone == "vgg16":
        from style_seqcvae_tpu.models.detector import vgg

        return vgg.head_to_tail(params["vgg"], pooled)       # (R, 4096)
    return resnet.head_to_tail(params["resnet"], pooled)     # (R, 2048)


def _stable_bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary_cross_entropy_with_logits, reduction='none'."""
    return (jnp.maximum(logits, 0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _cb_example_weights(labels_mh, samples_per_cls, beta, n_cls):
    """Per-example CB weight Σ_c labels·((1-β)/(1-β^n_c)), the w_c row
    normalized to sum to num_classes (faster_rcnn.py:293-303). Rows with no
    positive label get weight 0 — padded rows vanish for free."""
    # clamp counts to >=1: a class with ZERO training instances makes
    # (1-beta)/(1-beta^0) = inf and the normalization inf/inf = NaN for the
    # WHOLE weight vector, NaN-ing every loss through the shared trunk. The
    # reference never sees n=0 (real COCO-Attributes counts are all
    # positive, cocoatts.py count pruning); any corpus exercising a subset
    # of the attribute inventory does. Zero-count classes have no positive
    # labels, so their (now finite) weight only affects the normalizer.
    eff = 1.0 - jnp.power(beta, jnp.maximum(samples_per_cls, 1.0))
    w = (1.0 - beta) / eff
    w = w / jnp.sum(w) * n_cls
    return jnp.sum(w[None, :] * labels_mh, axis=1, keepdims=True)     # (R, 1)


def cb_sigmoid_loss(labels_mh: jnp.ndarray, logits: jnp.ndarray,
                    samples_per_cls: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Class-balanced sigmoid BCE (faster_rcnn.py:278-313): per-example
    weight = Σ_c labels·((1-β)/(1-β^n_c)) normalized to num_classes."""
    per_ex = _cb_example_weights(labels_mh, samples_per_cls, beta,
                                 logits.shape[-1])
    return per_ex * _stable_bce_with_logits(logits, labels_mh)         # (R, C)


def cb_focal_loss(labels_mh: jnp.ndarray, logits: jnp.ndarray,
                  samples_per_cls: jnp.ndarray, beta: float,
                  gamma: float) -> jnp.ndarray:
    """Class-balanced FOCAL loss (reference faster_rcnn.py:246-276 via the
    CB_loss 'focal' branch :306-307). Unlike the other branches it reduces
    to a SCALAR inside CB_loss itself: Σ w·exp(-γ·y·x - γ·softplus(-x))·BCE
    normalized by the positive-label count. Dead in the reference's own run
    config (call site :194 hard-codes 'sigmoid'); provided for the listed
    capability. Zero-label rows carry zero CB weight, so fixed-shape
    padding rows vanish without extra masking; an all-zero labels tensor is
    guarded to 0 (the reference would divide by zero)."""
    per_ex = _cb_example_weights(labels_mh, samples_per_cls, beta,
                                 logits.shape[-1])
    bce = _stable_bce_with_logits(logits, labels_mh)
    # reference modulator: exp(-γ·y·x - γ·log(1+exp(-x))); softplus(-x) is
    # the overflow-stable form of log(1+exp(-x))
    modulator = jnp.exp(-gamma * labels_mh * logits
                        - gamma * jax.nn.softplus(-logits))
    total = jnp.sum(per_ex * modulator * bce)
    return total / jnp.maximum(jnp.sum(labels_mh), 1.0)


def cb_softmax_loss(labels_mh: jnp.ndarray, logits: jnp.ndarray,
                    samples_per_cls: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Class-balanced 'softmax' branch (faster_rcnn.py:309-311) — the
    reference quirk preserved verbatim: the row softmax of the logits is
    fed to binary_cross_entropy_with_logits AS IF it were logits (the
    probabilities are re-sigmoided inside the BCE)."""
    per_ex = _cb_example_weights(labels_mh, samples_per_cls, beta,
                                 logits.shape[-1])
    pred = jax.nn.softmax(logits, axis=-1)
    return per_ex * _stable_bce_with_logits(pred, labels_mh)           # (R, C)


def detector_forward_train(params, cfg: DetectorConfig, batch, key):
    """batch: images (B, H, W, 3), im_info (B, 3), gt_boxes (B, G, 5),
    num_gt (B,), gt_atts (B, G, n_att). Returns loss dict (reference
    trainval_net.py:345-346 combination is done by the caller)."""
    images, im_info = batch["images"], batch["im_info"]
    gt_boxes, num_gt, gt_atts = batch["gt_boxes"], batch["num_gt"], batch["gt_atts"]
    B, H, W, _ = images.shape

    base_feat = _backbone(params, cfg, images)
    fh, fw = base_feat.shape[1], base_feat.shape[2]
    anchors = jnp.asarray(shifted_anchors(
        fh, fw, cfg.feat_stride,
        generate_anchors(cfg.feat_stride, cfg.anchor_ratios, cfg.anchor_scales)))

    cls_logits, bbox_deltas = rpn_heads(params["rpn"], base_feat)
    k_at, k_pt = jax.random.split(key)

    rois, _, roi_valid = proposal_layer(
        cls_logits, bbox_deltas, anchors, im_info,
        pre_nms_top_n=cfg.rpn.pre_nms_top_n, post_nms_top_n=cfg.rpn.post_nms_top_n,
        nms_thresh=cfg.rpn.nms_thresh)

    labels_a, targets_a, in_w_a, out_w_a = anchor_target(
        (fh, fw), anchors, gt_boxes, num_gt, im_info, k_at, cfg.rpn)
    rpn_loss_cls, rpn_loss_box = rpn_losses(
        cls_logits, bbox_deltas, labels_a, targets_a, in_w_a, out_w_a)

    rois_s, labels, bbox_targets, inside_w, labels_atts, fg_mask = proposal_target(
        rois, roi_valid, gt_boxes, num_gt, gt_atts, k_pt, cfg.pt)

    R = cfg.pt.rois_per_image
    pooled_feat = _pool_rois(params, cfg, base_feat, rois_s.reshape(B * R, 5))

    cls_score = _linear(params["cls_score"], pooled_feat)          # (BR, C)
    bbox_pred = _linear(params["bbox_pred"], pooled_feat)
    labels_flat = labels.reshape(B * R).astype(jnp.int32)
    if not cfg.class_agnostic:
        bp = bbox_pred.reshape(B * R, -1, 4)
        bbox_pred = jnp.take_along_axis(bp, labels_flat[:, None, None], axis=1)[:, 0, :]

    logp = jax.nn.log_softmax(cls_score, axis=-1)
    loss_cls = -jnp.mean(jnp.take_along_axis(logp, labels_flat[:, None], axis=-1))

    # reference: outside weights == inside weights (fg indicator); sum over
    # the 4 coords (dim=[1]) then mean over all B*R rois.
    loss_bbox = smooth_l1_loss(
        bbox_pred.reshape(B * R, 4), bbox_targets.reshape(B * R, 4),
        inside_w.reshape(B * R, 4), inside_w.reshape(B * R, 4),
        sigma=1.0, reduce_dims=(1,))

    losses = {"rpn_cls": rpn_loss_cls, "rpn_box": rpn_loss_box,
              "rcnn_cls": loss_cls, "rcnn_box": loss_bbox}

    if cfg.num_att_classes:
        att_logits = _linear(params["cls_score_atts"], pooled_feat)
        atts_flat = labels_atts.reshape(B * R, -1)
        att_counts = jnp.asarray(batch["att_counts"], jnp.float32)
        if cfg.cb_loss_type == "focal":
            # focal reduces to a scalar inside CB_loss; the reference's
            # [valid].mean() on a 0-d tensor would crash, so the scalar IS
            # the loss (divergence noted in the docstring).
            loss_atts = cb_focal_loss(atts_flat, att_logits, att_counts,
                                      cfg.cb_beta, cfg.cb_gamma)
        else:
            if cfg.cb_loss_type == "sigmoid":
                cb = cb_sigmoid_loss(atts_flat, att_logits, att_counts,
                                     cfg.cb_beta)
            elif cfg.cb_loss_type == "softmax":
                cb = cb_softmax_loss(atts_flat, att_logits, att_counts,
                                     cfg.cb_beta)
            else:
                raise ValueError(f"unknown cb_loss_type {cfg.cb_loss_type!r}")
            has_atts = jnp.sum(atts_flat, axis=1) > 0               # (BR,)
            # reference: CB_loss[valid_indices].mean() over (rows-with-atts, C)
            denom = jnp.maximum(jnp.sum(has_atts) * cb.shape[1], 1)
            loss_atts = jnp.sum(jnp.where(has_atts[:, None], cb, 0.0)) / denom
        any_atts = jnp.sum(atts_flat) > 0
        losses["rcnn_cls_atts"] = jnp.where(any_atts, loss_atts, 0.0)

    losses["total"] = (losses["rpn_cls"] + losses["rpn_box"] + losses["rcnn_cls"]
                       + cfg.att_loss_weight * losses.get("rcnn_cls_atts", 0.0)
                       + losses["rcnn_box"])
    return losses


def detector_forward_test(params, cfg: DetectorConfig, images, im_info,
                          post_nms_top_n: int = 300, pre_nms_top_n: int = 6000,
                          nms_thresh: float = 0.7):
    """Inference forward (test_net.py:338-365 up to bbox decode inputs).

    Returns dict with rois (B, P, 5), roi_valid, cls_prob (B, P, C),
    cls_prob_atts (B, P, A), bbox_pred (B, P, 4C), pooled_feat (B, P, 2048)
    — the per-RoI outputs the feature extractor consumes."""
    B = images.shape[0]
    base_feat = _backbone(params, cfg, images)
    fh, fw = base_feat.shape[1], base_feat.shape[2]
    anchors = jnp.asarray(shifted_anchors(
        fh, fw, cfg.feat_stride,
        generate_anchors(cfg.feat_stride, cfg.anchor_ratios, cfg.anchor_scales)))
    cls_logits, bbox_deltas = rpn_heads(params["rpn"], base_feat)
    rois, _, roi_valid = proposal_layer(
        cls_logits, bbox_deltas, anchors, im_info,
        pre_nms_top_n=pre_nms_top_n, post_nms_top_n=post_nms_top_n,
        nms_thresh=nms_thresh)

    P = rois.shape[1]
    pooled_feat = _pool_rois(params, cfg, base_feat, rois.reshape(B * P, 5),
                             inference=True)
    cls_prob = jax.nn.softmax(_linear(params["cls_score"], pooled_feat), axis=-1)
    bbox_pred = _linear(params["bbox_pred"], pooled_feat)
    out = {
        "rois": rois, "roi_valid": roi_valid,
        "cls_prob": cls_prob.reshape(B, P, -1),
        "bbox_pred": bbox_pred.reshape(B, P, -1),
        "pooled_feat": pooled_feat.reshape(B, P, -1),
    }
    if cfg.num_att_classes:
        out["cls_prob_atts"] = jax.nn.sigmoid(
            _linear(params["cls_score_atts"], pooled_feat)).reshape(B, P, -1)
    return out


def detector_trainable_labels(params, freeze_backbone: bool = True) -> Any:
    """Label pytree for the optimizer: frozen backbone pieces per
    resnet.trainable_label, everything else trainable.

    ``freeze_backbone=False`` — from-scratch training: the reference's
    conv1/layer1/BN-affine freeze (resnet.py:255-291) exists to protect
    PRETRAINED weights; with a random init it pins random early layers
    forever (round-5 finding: the frozen-random trunk caps held-out AP50
    near chance while losses still decrease). Only the BN running
    statistics stay frozen (identity stats; trainable scale/offset subsume
    the affine)."""

    def label(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if not freeze_backbone:
            if keys[-1] in ("mean", "var"):
                return "never"
            # the stem conv sees PIXEL-scale inputs: its init folds in
            # 1/_INPUT_PIXEL_STD (resnet.py:60-67) so its gradients are
            # ~std× larger AND its weights ~std× smaller than every other
            # layer's — the optimizer rescales this label's effective lr by
            # 1/std² or from-scratch training NaNs within tens of steps
            if (("conv1" in keys or "conv1_1" in keys)
                    and not any(k.startswith("layer") for k in keys)):
                return "input_conv"
            return "always"
        if "resnet" in keys:
            return resnet.trainable_label([k for k in keys if k != "resnet"])
        if "vgg" in keys:
            from style_seqcvae_tpu.models.detector import vgg

            return vgg.trainable_label([k for k in keys if k != "vgg"])
        return "always"

    return jax.tree_util.tree_map_with_path(label, params)
