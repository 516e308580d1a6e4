"""Bottom-up feature + attribute extraction (the detector→captioner bridge).

Behavioral mirror of frcnn/test_net.py ``--feat_extract``
(:311-542): device forward → bbox decode (un-normalize deltas, class-
specific columns, clip, divide by im_scale) → per-class score threshold +
NMS(0.3) → global cap at ``max_per_image`` via the score-threshold rule →
pack GT / detected attribute streams → features.h5 row.

Two selection implementations share the algorithm (test_net.py:379-482):

* host (:func:`select_detections`) — exact reference semantics including
  its quirks (per-class independent NMS, cap by the max_per_image-th
  highest score with >= comparison, class-major output order). Used by the
  features.h5 writer, where stream order is part of the schema.
* device (:func:`select_detections_device`) — fixed-shape jnp analogue
  (vmapped per-class NMS + global top-k) that fuses into the detector
  forward so e2e serving never round-trips the (P, 2048) pooled features
  through the host. Parity-tested against the host version.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from style_seqcvae_tpu.ops.nms import nms_reference
from style_seqcvae_tpu.utils.features_io import pack_obj_atts, pack_obj_atts_det


def decode_boxes(rois_xyxy: np.ndarray, bbox_pred: np.ndarray, im_info,
                 bbox_normalize_stds, bbox_normalize_means, im_scale: float,
                 num_classes: int, class_agnostic: bool = False) -> np.ndarray:
    """test_net.py:345-365: un-normalize deltas, decode, clip, rescale."""
    from style_seqcvae_tpu.ops.boxes import bbox_transform_inv, clip_boxes
    import jax.numpy as jnp

    deltas = np.asarray(bbox_pred, np.float32)
    stds = np.tile(np.asarray(bbox_normalize_stds, np.float32),
                   1 if class_agnostic else num_classes)
    means = np.tile(np.asarray(bbox_normalize_means, np.float32),
                    1 if class_agnostic else num_classes)
    deltas = deltas * stds + means
    pred = np.asarray(bbox_transform_inv(jnp.asarray(rois_xyxy), jnp.asarray(deltas)))
    pred = np.asarray(clip_boxes(jnp.asarray(pred), float(im_info[0]), float(im_info[1])))
    return pred / im_scale


def select_detections(
    scores: np.ndarray,          # (P, C) softmax probs
    pred_boxes: np.ndarray,      # (P, 4C) decoded, image scale
    pooled_feat: np.ndarray,     # (P, F)
    scores_atts: Optional[np.ndarray] = None,   # (P, A) sigmoid
    rois_label: Optional[np.ndarray] = None,    # (P,) GT class per roi
    gt_atts: Optional[np.ndarray] = None,       # (P, A) GT multi-hot
    *,
    thresh: float = 0.5,
    nms_thresh: float = 0.3,
    max_per_image: int = 100,
    class_agnostic: bool = False,
    start_index: int = 1,
) -> Dict[str, np.ndarray]:
    """Per-class NMS + global cap (test_net.py:379-482). Returns arrays over
    the selected boxes: boxes, scores, class_ids, features, and (optionally)
    att_scores, gt_labels, gt_att_rows."""
    C = scores.shape[1]
    per_class: List[Dict[str, np.ndarray]] = []
    for j in range(start_index, C):
        inds = np.where(scores[:, j] > thresh)[0]
        if len(inds) == 0:
            continue
        cls_scores = scores[inds, j]
        order = np.argsort(-cls_scores)
        if class_agnostic:
            cls_boxes = pred_boxes[inds, :4]
        else:
            cls_boxes = pred_boxes[inds, j * 4:(j + 1) * 4]
        keep = nms_reference(cls_boxes[order], cls_scores[order], nms_thresh)
        sel = inds[order][keep]
        entry = {"boxes": (cls_boxes[order][keep]), "scores": cls_scores[order][keep],
                 "class_ids": np.full(len(keep), j, np.int64),
                 "features": pooled_feat[sel]}
        if scores_atts is not None:
            entry["att_scores"] = scores_atts[sel]
        if rois_label is not None:
            entry["gt_labels"] = np.asarray(rois_label)[sel]
        if gt_atts is not None:
            entry["gt_att_rows"] = np.asarray(gt_atts)[sel]
        per_class.append(entry)

    if not per_class:
        return {k: np.zeros((0,)) for k in
                ("boxes", "scores", "class_ids", "features")}

    all_scores = np.concatenate([e["scores"] for e in per_class])
    if max_per_image > 0 and len(all_scores) > max_per_image:
        image_thresh = np.sort(all_scores)[-max_per_image]
        per_class = [
            {k: v[e["scores"] >= image_thresh] for k, v in e.items()}
            for e in per_class
        ]

    out: Dict[str, np.ndarray] = {}
    for k in per_class[0]:
        out[k] = np.concatenate([e[k] for e in per_class], axis=0)
    return out


def decode_boxes_jax(rois_xyxy, bbox_pred, im_info, bbox_normalize_stds,
                     bbox_normalize_means, im_scale, num_classes: int,
                     class_agnostic: bool = False):
    """Device analogue of :func:`decode_boxes` (test_net.py:345-365) —
    pure jnp so it fuses into a larger program. ``im_scale`` may be a
    traced scalar."""
    import jax.numpy as jnp

    from style_seqcvae_tpu.ops.boxes import bbox_transform_inv, clip_boxes

    reps = 1 if class_agnostic else num_classes
    stds = jnp.tile(jnp.asarray(bbox_normalize_stds, jnp.float32), reps)
    means = jnp.tile(jnp.asarray(bbox_normalize_means, jnp.float32), reps)
    deltas = bbox_pred.astype(jnp.float32) * stds + means
    pred = bbox_transform_inv(rois_xyxy.astype(jnp.float32), deltas)
    pred = clip_boxes(pred, im_info[0], im_info[1])
    return pred / im_scale


def select_detections_device(scores, pred_boxes, pooled_feat,
                             scores_atts=None, *,
                             thresh: float = 0.05, nms_thresh: float = 0.3,
                             max_per_image: int = 100, start_index: int = 1):
    """Fixed-shape device analogue of :func:`select_detections` for ONE
    image: per-class greedy NMS (vmapped over classes) + global top-
    ``max_per_image`` by score (test_net.py:379-482). The host version's
    global cap keeps every box tied at the threshold score and orders the
    output class-major; this one returns exactly ``max_per_image`` rows in
    descending-score order with a validity mask — a pure reordering plus
    tie-truncation, which the captioner's permutation-invariant attention
    cannot see. The exact class-major stream (features.h5 parity) stays on
    the host path.

    Returns dict of fixed-shape arrays: features (M, F) with invalid rows
    zeroed (row 0 forced to ones when nothing survives, matching the
    bench/CLI fallback), boxes (M, 4), scores (M,), class_ids (M,),
    valid (M,) bool, and att_scores (M, A) when ``scores_atts`` given."""
    import jax
    import jax.numpy as jnp

    from style_seqcvae_tpu.ops.nms import nms

    P, C = scores.shape
    assert C >= 2, "class-specific boxes expected (class_agnostic not supported on the device path; use the host select_detections)"
    ncls = C - start_index
    cls_scores = scores[:, start_index:].astype(jnp.float32).T      # (ncls, P)
    boxes_pc = pred_boxes.reshape(P, C, 4).transpose(1, 0, 2)[start_index:]
    valid = cls_scores > thresh
    # the nms contract wants padding rows at score <= 0; non-candidates
    # sort last and can only suppress each other
    nms_scores = jnp.where(valid, cls_scores, 0.0)

    def one_class(b, s):
        return nms(b.astype(jnp.float32), s, nms_thresh)[1]

    keep = jax.vmap(one_class)(boxes_pc, nms_scores)                # (ncls, P)
    cand = valid & keep
    flat = jnp.where(cand, cls_scores, -1.0).reshape(-1)            # (ncls·P,)
    k = min(max_per_image, int(flat.shape[0]))
    top_s, top_i = jax.lax.top_k(flat, k)
    ok = top_s > -0.5
    box_idx = top_i % P
    feats = jnp.where(ok[:, None], pooled_feat[box_idx], 0.0)
    # no survivors → single all-ones row (bench/CLI zero-detection fallback)
    none = ~ok.any()
    feats = feats.at[0].set(jnp.where(none, 1.0, feats[0]))
    out = {
        "features": feats,
        "boxes": jnp.where(ok[:, None], boxes_pc.reshape(-1, 4)[top_i], 0.0),
        "scores": jnp.where(ok, top_s, 0.0),
        "class_ids": jnp.where(ok, top_i // P + start_index, 0),
        "valid": ok,
    }
    if scores_atts is not None:
        out["att_scores"] = jnp.where(ok[:, None], scores_atts[box_idx], 0.0)
    return out


def extraction_row(selected: Dict[str, np.ndarray], att_pred_thresh: float = 0.3
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the (features, obj_atts, obj_atts_det) h5 row
    (test_net.py:503-542)."""
    feats = np.asarray(selected.get("features", np.zeros((0, 0))), np.float32)
    obj_atts = np.zeros((0,), np.uint8)
    if "gt_labels" in selected and np.asarray(selected["gt_labels"]).sum() > 0:
        att_lists = [np.nonzero(row)[0] for row in selected["gt_att_rows"]]
        obj_atts = pack_obj_atts(np.asarray(selected["gt_labels"], np.int64), att_lists)
    obj_atts_det = np.zeros((0,), np.float32)
    if "att_scores" in selected and len(selected.get("class_ids", [])) > 0 and \
            "gt_labels" in selected and np.asarray(selected["gt_labels"]).sum() > 0:
        obj_atts_det = pack_obj_atts_det(selected["class_ids"],
                                         selected["att_scores"], att_pred_thresh)
    return feats, obj_atts, obj_atts_det


