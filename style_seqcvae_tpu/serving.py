"""Single-dispatch serving: raw image(s) → N diverse constrained captions.

The reference has no serving story — its inference path is three processes
and two file handoffs: ``frcnn/test_net.py --feat_extract`` writes
features.h5 (test_net.py:297-306), the captioning dataset rebuilds one FSM
per (image, z-sample) on the host (datasets.py:470-580), and
``var_updown/scripts/inference.py`` decodes at batch size 1. Round 2/3 of
this framework collapsed that to two chained device dispatches
(bench.py::bench_serving_latency); the host FSM build was the remaining
reason the decode could not compile together with the detector.

With the on-device cbs_simple constraint selection + FSM table build
(``decoding/device_fsm.py``) the WHOLE request is one XLA program:

    detector forward → on-device bbox decode + per-class NMS + global cap
    → per-z random attribute constraints → exception-form FSM tables
    → (z × batch × states × beam) CBS decode → best-beam selection

One dispatch = one ~30 ms tunnel round-trip instead of two, and XLA
schedules detector and decode in a single executable.
"""

from __future__ import annotations

import functools
from typing import Optional

from style_seqcvae_tpu.data.latents import AttributeEmbedTable
from style_seqcvae_tpu.decoding.device_fsm import (
    AttributeWordformTable,
    build_tables_device,
    select_attribute_constraints,
)


def attribute_embeds_device(att_scores, valid, embed_table: AttributeEmbedTable,
                            att_thresh: float):
    """Device-side mirror of ``LatentDictionary.translate_obj_atts``
    (updown_captioner.py:509-532) for the mode-2 attention prior.

    att_scores (..., M, A) per-box attribute sigmoid scores; valid (..., M)
    box mask. A box's embedding is the mean of the table rows of its
    detected attributes (score > ``att_thresh``, matching the
    ``pack_obj_atts_det`` threshold the h5/inference path applies), skipping
    attributes with no dictionary entry; zero when none. Returns
    (..., M, z_space) float32."""
    import jax.numpy as jnp

    table = jnp.asarray(embed_table.table, jnp.float32)
    has = jnp.asarray(embed_table.has)
    m = (att_scores > att_thresh) & has & valid[..., None]     # (..., M, A)
    cnt = jnp.sum(m, axis=-1, keepdims=True)                   # (..., M, 1)
    total = jnp.matmul(m.astype(jnp.float32), table)           # (..., M, z)
    return total / jnp.maximum(cnt, 1).astype(jnp.float32)


def make_serve_fn(det_cfg, cap_cfg, wordform_table: AttributeWordformTable,
                  *,
                  n_z: int = 20,
                  beam_size: int = 5,
                  max_boxes: int = 100,
                  det_thresh: float = 0.05,
                  det_nms_thresh: float = 0.3,
                  att_thresh: float = 0.3,
                  max_constraints: int = 3,
                  per_z_fsm: bool = True,
                  rpn_pre_nms_top_n: int = 6000,
                  rpn_post_nms_top_n: int = 300,
                  rpn_nms_thresh: float = 0.7,
                  bbox_normalize_stds=(0.1, 0.1, 0.2, 0.2),
                  bbox_normalize_means=(0.0, 0.0, 0.0, 0.0),
                  att_embed_table: Optional[AttributeEmbedTable] = None,
                  dtype="bfloat16"):
    """Build the single-program serving function.

    Returns ``serve(det_params, cap_params, images (B,H,W,3),
    im_info (B,3), sentiment (B,1), key) -> (captions (Z,B,T),
    log_probs (Z,B), num_constraints (B,), checksum ())`` — jitted; fetch
    the checksum scalar to synchronize over the axon tunnel.

    ``per_z_fsm`` mirrors MODEL.STATE_MACHINE_PER_Z_SAMPLE: each z-sample
    re-rolls the random attribute pick (datasets.py:582-602).
    """
    import jax
    import jax.numpy as jnp

    from style_seqcvae_tpu.decoding.cbs_fast import constrained_beam_search_fast
    from style_seqcvae_tpu.decoding.select import select_best_beam_simple_jax
    from style_seqcvae_tpu.models.captioner import (
        make_decode_context, make_optimized_step_fn)
    from style_seqcvae_tpu.models.detector.extract import (
        decode_boxes_jax, select_detections_device)
    from style_seqcvae_tpu.models.detector.faster_rcnn import detector_forward_test
    from style_seqcvae_tpu.models.updown_cell import init_cell_state

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    seq = cap_cfg.max_caption_length
    feat_dim = cap_cfg.image_feature_size
    if cap_cfg.sentiment_vae == 2 and att_embed_table is None:
        raise ValueError(
            "cap_cfg.sentiment_vae == 2 (latent-dictionary attribute prior) "
            "needs att_embed_table (LatentDictionary.embed_table of the "
            "attribute-head names) — without it the decode would silently "
            "run with a zero-mean prior and diverge from scripts/inference.py")

    @jax.jit
    def serve(det_params, cap_params, images, im_info, sentiment, key):
        batch = images.shape[0]
        out = detector_forward_test(
            det_params, det_cfg, images, im_info,
            post_nms_top_n=rpn_post_nms_top_n,
            pre_nms_top_n=rpn_pre_nms_top_n, nms_thresh=rpn_nms_thresh)
        if "cls_prob_atts" not in out:
            raise ValueError(
                "serving needs a detector with an attribute head "
                "(num_att_classes > 0) — cbs_simple constraints come from "
                "the per-RoI attribute scores")

        def one_image(rois, bbox_pred, cls_prob, cls_prob_atts, pooled, inf):
            pred_boxes = decode_boxes_jax(
                rois[:, 1:5], bbox_pred, inf, bbox_normalize_stds,
                bbox_normalize_means, inf[2], det_cfg.num_classes)
            return select_detections_device(
                cls_prob, pred_boxes, pooled, cls_prob_atts,
                thresh=det_thresh, nms_thresh=det_nms_thresh,
                max_per_image=max_boxes)

        sel = jax.vmap(one_image)(out["rois"], out["bbox_pred"],
                                  out["cls_prob"], out["cls_prob_atts"],
                                  out["pooled_feat"], im_info)
        feats = sel["features"]
        pad = max_boxes - feats.shape[1]
        if pad > 0:
            feats = jnp.concatenate(
                [feats, jnp.zeros((batch, pad, feat_dim), feats.dtype)],
                axis=1)
        feats = feats.astype(jdtype)

        obj_att_embeds = None
        if cap_cfg.sentiment_vae == 2:
            obj_att_embeds = attribute_embeds_device(
                sel["att_scores"], sel["valid"], att_embed_table, att_thresh)
            epad = max_boxes - obj_att_embeds.shape[1]
            if epad > 0:
                obj_att_embeds = jnp.concatenate(
                    [obj_att_embeds,
                     jnp.zeros((batch, epad, obj_att_embeds.shape[2]),
                               obj_att_embeds.dtype)], axis=1)

        key, sel_key, dec_key = jax.random.split(key, 3)
        n_fsm = n_z if per_z_fsm else 1
        sel_keys = jax.random.split(sel_key, n_fsm * batch).reshape(
            n_fsm, batch, -1)
        att_ids, num_given = jax.vmap(jax.vmap(
            lambda c, v, s, k: select_attribute_constraints(
                c, v, s, wordform_table, k, att_thresh=att_thresh,
                max_constraints=max_constraints),
            in_axes=(0, 0, 0, 0)), in_axes=(None, None, None, 0))(
            sel["class_ids"], sel["valid"], sel["att_scores"], sel_keys)
        num_given = num_given[0]                       # z-invariant (B,)
        tables = jax.vmap(jax.vmap(functools.partial(
            build_tables_device, table=wordform_table,
            max_constraints=max_constraints)))(att_ids)   # (n_fsm, B, S, E)
        if not per_z_fsm:
            tables = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (n_z,) + x.shape[1:]), tables)

        ctx = make_decode_context(cap_params, cap_cfg, feats,
                                  sentiment=sentiment,
                                  obj_att_embeds=obj_att_embeds)
        step = make_optimized_step_fn(cap_params, cap_cfg, ctx,
                                      return_raw=True)
        init_state = init_cell_state((batch,), cap_cfg.hidden_size, jdtype)
        start = jnp.full((batch,), cap_cfg.boundary_index)

        def one_z(z_key, tables_z):
            seqs, lp = constrained_beam_search_fast(
                step, start, init_state, tables_z, z_key, max_steps=seq,
                beam_size=beam_size, per_node_beam_size=beam_size // 2,
                end_index=cap_cfg.boundary_index, raw_step=True)
            return select_best_beam_simple_jax(
                seqs, lp, num_given, cap_cfg.min_constraints_to_satisfy)

        best, best_lp = jax.vmap(one_z)(jax.random.split(dec_key, n_z),
                                        tables)
        return best, best_lp, num_given, jnp.sum(best_lp.astype(jnp.float32))

    return serve
