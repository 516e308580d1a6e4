"""Proposal-target layer: RoI sampling + per-RoI target assignment.

TPU-native redesign of frcnn/lib/model/rpn/
proposal_target_layer_cascade.py:33-251 — samples ``rois_per_image`` (128)
RoIs per image with up to ``fg_fraction`` foreground, assigns class labels,
regression targets (normalized by precomputed means/stds), and **propagates
per-RoI multi-hot attribute labels** (the Style-SeqCVAE modification,
reference :157-238: attributes gathered from the assigned GT, zeroed for
background).

The per-image Python branches (fg>0&bg>0 / fg-only / bg-only,
reference :170-220) become masked arithmetic under ``jnp.where``; fg
sampling is uniform WITHOUT replacement, bg WITH replacement — matching the
reference's randperm / rand*N choices. GT boxes are appended to the
proposal set like the reference's cascade variant does NOT do — we follow
the reference exactly (proposals only).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from style_seqcvae_tpu.ops.boxes import bbox_overlaps, bbox_transform


class ProposalTargetConfig(NamedTuple):
    rois_per_image: int = 128
    fg_fraction: float = 0.25
    fg_thresh: float = 0.5
    bg_thresh_hi: float = 0.5
    bg_thresh_lo: float = 0.0
    bbox_normalize_means: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    bbox_normalize_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    num_classes: int = 81


def proposal_target(rois, roi_valid, gt_boxes, num_gt, gt_atts, key,
                    cfg: ProposalTargetConfig):
    """rois (B, P, 5); roi_valid (B, P) bool; gt_boxes (B, G, 5) with class
    id in col 4; num_gt (B,); gt_atts (B, G, n_att) multi-hot.

    Returns (rois (B, R, 5), labels (B, R), bbox_targets (B, R, 4),
    inside_w (B, R, 4), labels_atts (B, R, n_att), fg_mask (B, R))."""
    B, P, _ = rois.shape
    R = cfg.rois_per_image
    fg_per_image = int(round(cfg.fg_fraction * R))

    def per_image(rois_i, valid_i, gt, n_gt, atts, k):
        G = gt.shape[0]
        gt_valid = jnp.arange(G) < n_gt
        ov = bbox_overlaps(rois_i[:, 1:5], gt[:, :4])
        ov = jnp.where(gt_valid[None, :] & valid_i[:, None], ov, -1.0)
        max_ov = jnp.max(ov, axis=1)
        gt_assign = jnp.argmax(ov, axis=1)

        fg_mask = max_ov >= cfg.fg_thresh
        bg_mask = (max_ov < cfg.bg_thresh_hi) & (max_ov >= cfg.bg_thresh_lo) & valid_i
        n_fg_avail = jnp.sum(fg_mask)
        n_bg_avail = jnp.sum(bg_mask)

        k1, k3 = jax.random.split(k)
        # fg indices in random order (priority sort, without replacement)
        fg_pri = jnp.where(fg_mask, jax.random.uniform(k1, (P,)), -1.0)
        fg_order = jnp.argsort(-fg_pri)                     # random fg first
        # deterministic bg list (bg indices first); sampling WITH replacement
        # below matches the reference's rand*N pick (:196-199)
        bg_list = jnp.argsort(~bg_mask)

        # number of fg sampled (reference :180-218)
        both = (n_fg_avail > 0) & (n_bg_avail > 0)
        n_fg = jnp.where(both, jnp.minimum(fg_per_image, n_fg_avail),
                         jnp.where(n_fg_avail > 0, R, 0))

        slots = jnp.arange(R)
        is_fg_slot = slots < n_fg

        # fg slot i ← fg_order[i mod n_fg_avail] (mod for the fg-only branch
        # which samples WITH replacement, reference :202-206)
        fg_pick = fg_order[jnp.where(n_fg_avail > 0,
                                     slots % jnp.maximum(n_fg_avail, 1), 0)]
        # bg slots ← uniform with replacement over bg_list[0:n_bg_avail]
        rnd = jax.random.uniform(k3, (R,))
        bg_pick = bg_list[jnp.floor(rnd * jnp.maximum(n_bg_avail, 1)).astype(jnp.int32)]
        keep = jnp.where(is_fg_slot, fg_pick, bg_pick)

        labels = gt[gt_assign[keep], 4]
        labels = jnp.where(is_fg_slot, labels, 0.0)
        atts_out = atts[gt_assign[keep]]
        atts_out = jnp.where(is_fg_slot[:, None], atts_out, 0.0)

        rois_out = rois_i[keep]
        gt_rois = gt[gt_assign[keep], :4]
        targets = bbox_transform(rois_out[:, 1:5], gt_rois)
        targets = ((targets - jnp.asarray(cfg.bbox_normalize_means))
                   / jnp.asarray(cfg.bbox_normalize_stds))
        targets = jnp.where(is_fg_slot[:, None], targets, 0.0)
        inside_w = jnp.where(is_fg_slot[:, None],
                             jnp.ones((R, 4)), jnp.zeros((R, 4)))
        return rois_out, labels, targets, inside_w, atts_out, is_fg_slot

    keys = jax.random.split(key, B)
    rois_o, labels, targets, inside_w, atts_o, fg_slots = jax.vmap(per_image)(
        rois, roi_valid, gt_boxes, num_gt, gt_atts, keys)
    # restamp batch index column
    batch_col = jnp.broadcast_to(
        jnp.arange(B, dtype=rois_o.dtype)[:, None], (B, R))
    rois_o = rois_o.at[:, :, 0].set(batch_col)
    return rois_o, labels, targets, inside_w, atts_o, fg_slots
