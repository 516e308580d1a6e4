"""Feature-extraction pipeline tests: per-class NMS selection, max-per-image
cap, packed attribute streams, and the features.h5 schema round-trip."""

import numpy as np

from style_seqcvae_tpu.models.detector.extract import extraction_row, select_detections
from style_seqcvae_tpu.utils.features_io import (
    FeaturesReader,
    FeaturesWriter,
    pack_obj_atts,
    pack_obj_atts_det,
    unpack_obj_atts,
    unpack_obj_atts_det,
)


def test_pack_unpack_roundtrip():
    stream = pack_obj_atts([3, 7], [[1, 5], []])
    np.testing.assert_array_equal(stream, [3, 101, 105, 7])
    rec = unpack_obj_atts(stream)
    assert rec == [[3, [[1, 1], [5, 1]]], [7, []]]

    att_scores = np.zeros((2, 10), np.float32)
    att_scores[0, 2] = 0.8
    att_scores[1, 4] = 0.5
    att_scores[1, 6] = 0.2  # below 0.3 thresh → dropped
    det = pack_obj_atts_det([3, 7], att_scores)
    np.testing.assert_allclose(det, [3, 102, 0.8, 7, 104, 0.5], atol=1e-6)
    rec = unpack_obj_atts_det(det)
    assert rec[0][0] == 3 and rec[0][1][0][0] == 2
    assert abs(rec[1][1][0][1] - 0.5) < 1e-6


def test_select_detections_per_class_nms_and_cap():
    rng = np.random.RandomState(0)
    P, C, F = 30, 4, 8
    scores = rng.rand(P, C).astype(np.float32)
    # two overlapping boxes with high class-1 scores → NMS keeps one
    pred_boxes = np.tile(rng.rand(P, 1) * 50, (1, 4 * C)).astype(np.float32)
    pred_boxes[:, 1::4] += 20  # make y2 > y1 etc.
    pred_boxes[:, 2::4] += 30
    pred_boxes[:, 3::4] += 40
    pred_boxes[0, 4:8] = [10, 10, 50, 50]
    pred_boxes[1, 4:8] = [12, 12, 52, 52]   # IoU > 0.3 with box 0
    scores[0, 1] = 0.95
    scores[1, 1] = 0.90
    feats = rng.randn(P, F).astype(np.float32)

    out = select_detections(scores, pred_boxes, feats, thresh=0.5,
                            nms_thresh=0.3, max_per_image=10)
    cls1 = out["class_ids"] == 1
    b = out["boxes"][cls1]
    # box 1 suppressed by box 0
    assert not any(np.allclose(x, [12, 12, 52, 52]) for x in b)
    assert any(np.allclose(x, [10, 10, 50, 50]) for x in b)
    assert len(out["scores"]) <= 10 + C  # cap is by score threshold (>=)

    # features correspond to selected rois
    assert out["features"].shape[1] == F


def test_extraction_row_and_h5_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    n_sel, F, A = 5, 16, 12
    selected = {
        "features": rng.randn(n_sel, F).astype(np.float32),
        "class_ids": np.array([3, 5, 5, 9, 2]),
        "att_scores": (rng.rand(n_sel, A) * 0.6).astype(np.float32),
        "gt_labels": np.array([3, 5, 0, 9, 2]),
        "gt_att_rows": (rng.rand(n_sel, A) > 0.6).astype(np.float32),
    }
    feats, obj_atts, obj_atts_det = extraction_row(selected)
    assert feats.shape == (n_sel, F)
    rec = unpack_obj_atts(obj_atts)
    assert len(rec) == n_sel and rec[0][0] == 3 and rec[2][0] == 0

    path = str(tmp_path / "features.h5")
    w = FeaturesWriter(path, 2)
    w.write(0, 1234, feats, obj_atts, obj_atts_det)
    w.write(1, 5678, feats[:2], pack_obj_atts([1, 2], [[0], []]),
            np.zeros((0,), np.float32))
    w.close()

    r = FeaturesReader(path)
    assert sorted(r.image_ids) == [1234, 5678]
    f, atts = r[1234]
    assert f.shape == (n_sel, F)
    assert len(atts) == n_sel
    f2, atts2 = r[5678]
    assert f2.shape == (2, F)
    assert atts2 == [[1, [[0, 1]]], [2, []]]

    rdet = FeaturesReader(path, use_obj_att_preds=True)
    fdet, attsdet = rdet[1234]
    assert len(attsdet) == n_sel


def test_select_detections_device_matches_host():
    """Device per-class NMS + global cap selects the same (class, box) set
    as the host reference algorithm (random scores → no threshold ties);
    features ride along row-for-row."""
    import jax.numpy as jnp

    from style_seqcvae_tpu.models.detector.extract import (
        select_detections_device)

    rng = np.random.RandomState(5)
    P, C, F = 40, 6, 16
    scores = rng.dirichlet(np.ones(C), size=P).astype(np.float32)
    boxes = rng.uniform(0, 80, (P, 4)).astype(np.float32)
    boxes = np.concatenate([np.minimum(boxes[:, :2], boxes[:, 2:]),
                            np.maximum(boxes[:, :2], boxes[:, 2:]) + 4], 1)
    pred_boxes = np.tile(boxes, (1, C)).astype(np.float32)
    feats = rng.randn(P, F).astype(np.float32)
    atts = rng.rand(P, 7).astype(np.float32)

    for cap in (100, 8):           # uncapped and capped
        host = select_detections(scores, pred_boxes, feats, scores_atts=atts,
                                 thresh=0.15, nms_thresh=0.5,
                                 max_per_image=cap)
        dev = select_detections_device(
            jnp.asarray(scores), jnp.asarray(pred_boxes), jnp.asarray(feats),
            jnp.asarray(atts), thresh=0.15, nms_thresh=0.5,
            max_per_image=cap)
        ok = np.asarray(dev["valid"])
        assert ok.sum() == len(host["scores"]), cap
        host_set = sorted(zip(host["class_ids"].tolist(),
                              np.round(host["scores"], 5).tolist()))
        dev_set = sorted(zip(np.asarray(dev["class_ids"])[ok].tolist(),
                             np.round(np.asarray(dev["scores"])[ok], 5).tolist()))
        assert host_set == dev_set, cap
        # features follow their box: match rows by score
        hs = np.argsort(-host["scores"], kind="stable")
        np.testing.assert_allclose(np.asarray(dev["features"])[ok],
                                   host["features"][hs], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dev["att_scores"])[ok],
                                   host["att_scores"][hs], rtol=1e-6)
        # invalid rows zeroed
        assert np.all(np.asarray(dev["features"])[~ok] == 0)


def test_select_detections_device_empty_fallback():
    import jax.numpy as jnp

    from style_seqcvae_tpu.models.detector.extract import (
        select_detections_device)

    P, C, F = 10, 4, 8
    scores = np.full((P, C), 0.01, np.float32)   # nothing above threshold
    pred_boxes = np.zeros((P, 4 * C), np.float32)
    feats = np.zeros((P, F), np.float32)
    dev = select_detections_device(jnp.asarray(scores),
                                   jnp.asarray(pred_boxes),
                                   jnp.asarray(feats), thresh=0.5,
                                   max_per_image=5)
    assert not np.asarray(dev["valid"]).any()
    np.testing.assert_array_equal(np.asarray(dev["features"])[0],
                                  np.ones(F))


def test_vis_detections_caps_boxes_and_threshold():
    """net_utils.py:50-60 parity: at most 10 boxes per call, strict
    score > thresh, per-class color stable across processes (crc32)."""
    import zlib

    from style_seqcvae_tpu.utils.visualize import _COLORS, vis_detections

    im = np.zeros((60, 200, 3), np.uint8)
    # 12 high-score boxes: only the first 10 are drawn (reference caps
    # at minimum(10, N)); plus one below and one exactly AT the threshold
    dets = np.asarray([[5 + 15 * i, 5, 15 + 15 * i, 30, 0.95]
                       for i in range(12)], np.float32)
    dets[10, 4] = 0.2     # 11th row below threshold anyway
    out = vis_detections(im, "dog", dets, thresh=0.8)
    assert im.sum() == 0  # input untouched (copy-returning)
    color = np.array(_COLORS[zlib.crc32(b"dog") % len(_COLORS)])
    drawn = (out == color).all(axis=-1)
    assert drawn[5:31, 5].any()                      # box 0 outline
    # 12th box capped out (rows below neighbours' label strips, y > 13)
    assert not drawn[14:31, 5 + 15 * 11].any()

    # exactly-at-threshold is skipped (reference draws score > thresh);
    # 0.75 is exactly representable in float32, unlike 0.8
    out2 = vis_detections(np.zeros((40, 40, 3), np.uint8), "dog",
                          np.asarray([[5, 5, 30, 30, 0.75]], np.float32),
                          thresh=0.75)
    assert out2.sum() == 0


def test_device_e2e_extract_to_decode_chain():
    """The bench config-5 device pipeline at tiny dims on CPU: detector
    test forward → vmapped decode_boxes_jax + select_detections_device →
    fixed-shape features → captioner CBS decode, all inside jit — guards
    the shape/dtype plumbing the TPU bench relies on."""
    import jax
    import jax.numpy as jnp

    from style_seqcvae_tpu.decoding.cbs_fast import (
        constrained_beam_search_fast, fsm_to_tables, stack_fsm_tables)
    from style_seqcvae_tpu.models.captioner import (
        CaptionerConfig, init_captioner, make_decode_context,
        make_optimized_step_fn)
    from style_seqcvae_tpu.models.detector.extract import (
        decode_boxes_jax, select_detections_device)
    from style_seqcvae_tpu.models.detector.faster_rcnn import (
        DetectorConfig, detector_forward_test, init_detector)
    from style_seqcvae_tpu.models.detector.rpn import RPNConfig
    from style_seqcvae_tpu.models.detector.targets import ProposalTargetConfig
    from style_seqcvae_tpu.models.updown_cell import init_cell_state

    B, MAXB, FDIM, V = 2, 6, 2048, 40
    det_cfg = DetectorConfig(
        num_classes=5, num_att_classes=0, anchor_scales=(2, 4),
        anchor_ratios=(0.5, 1.0, 2.0),
        rpn=RPNConfig(anchor_scales=(2, 4), pre_nms_top_n=64,
                      post_nms_top_n=12),
        pt=ProposalTargetConfig(rois_per_image=8))
    det_params = init_detector(jax.random.PRNGKey(0), det_cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, 64, 96, 3).astype(np.float32) * 255)
    im_info = jnp.asarray(np.tile([64.0, 96.0, 1.0], (B, 1)).astype(np.float32))

    stds = (0.1, 0.1, 0.2, 0.2)
    means = (0.0, 0.0, 0.0, 0.0)

    @jax.jit
    def extract_feats(p, im, info):
        out = detector_forward_test(p, det_cfg, im, info,
                                    post_nms_top_n=12, pre_nms_top_n=64)

        def one_image(rois, bbox_pred, cls_prob, pooled, inf):
            pred_boxes = decode_boxes_jax(rois[:, 1:5], bbox_pred, inf,
                                          stds, means, inf[2],
                                          det_cfg.num_classes)
            sel = select_detections_device(cls_prob, pred_boxes, pooled,
                                           thresh=0.05, nms_thresh=0.3,
                                           max_per_image=MAXB)
            return sel["features"]

        return jax.vmap(one_image)(out["rois"], out["bbox_pred"],
                                   out["cls_prob"], out["pooled_feat"], info)

    feats = extract_feats(det_params, images, im_info)
    assert feats.shape == (B, MAXB, FDIM)
    assert np.isfinite(np.asarray(feats)).all()

    cap_cfg = CaptionerConfig(
        vocab_size=V, image_feature_size=FDIM, embedding_size=8,
        hidden_size=6, attention_projection_size=4, z_space=3,
        sentiment_vae=1, simple_vae=False, max_caption_length=5)
    cap = init_captioner(jax.random.PRNGKey(1), cap_cfg)
    f = np.zeros((4, 4, V), np.uint8)
    for s in range(4):
        f[s, s, :] = 1
    f[0, 1, 5] = 1
    f[0, 0, 5] = 0
    tables = stack_fsm_tables([fsm_to_tables(f)] * B)

    @jax.jit
    def decode(cap, feats):
        ctx = make_decode_context(cap, cap_cfg, feats,
                                  sentiment=jnp.ones((B, 1)))
        step = make_optimized_step_fn(cap, cap_cfg, ctx, return_raw=True)
        start = jnp.full((B,), cap_cfg.boundary_index)
        st = init_cell_state((B,), cap_cfg.hidden_size, jnp.float32)
        seqs, lp = constrained_beam_search_fast(
            step, start, st, tables, jax.random.PRNGKey(2), max_steps=5,
            beam_size=3, per_node_beam_size=2,
            end_index=cap_cfg.boundary_index, raw_step=True)
        return seqs, lp

    seqs, lp = decode(cap, feats)
    assert seqs.shape == (B, 4, 3, 5)
    assert np.isfinite(np.asarray(lp)[np.asarray(lp) > -1e18]).all()
