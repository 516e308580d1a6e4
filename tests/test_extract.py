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
