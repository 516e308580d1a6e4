"""Native C++ kernel tests vs the pure-python references."""

import numpy as np
import pytest

from style_seqcvae_tpu import native
from style_seqcvae_tpu.ops.nms import nms_reference
from style_seqcvae_tpu.utils.features_io import (
    pack_obj_atts,
    pack_obj_atts_det,
    unpack_obj_atts,
    unpack_obj_atts_det,
)


def test_native_builds():
    assert native.native_available(), "native library failed to build"


def test_native_iou_matches_jax():
    rng = np.random.RandomState(0)
    boxes = rng.rand(20, 4).astype(np.float32) * 50
    boxes[:, 2:] += boxes[:, :2] + 5
    query = rng.rand(7, 4).astype(np.float32) * 50
    query[:, 2:] += query[:, :2] + 5
    got = native.iou_matrix(boxes, query)
    import jax.numpy as jnp
    from style_seqcvae_tpu.ops.boxes import bbox_overlaps

    want = np.asarray(bbox_overlaps(jnp.asarray(boxes), jnp.asarray(query)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_native_nms_matches_reference():
    rng = np.random.RandomState(1)
    for _ in range(3):
        ctr = rng.rand(50, 2) * 40
        wh = rng.rand(50, 2) * 25 + 2
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
        scores = rng.rand(50).astype(np.float32)
        np.testing.assert_array_equal(native.nms(boxes, scores, 0.5),
                                      nms_reference(boxes, scores, 0.5))


def test_rle_roundtrip_and_area():
    rng = np.random.RandomState(2)
    mask = (rng.rand(13, 17) > 0.6).astype(np.uint8)
    counts = native.rle_encode(mask)
    assert counts.sum() == 13 * 17
    rec = native.rle_decode(counts, 13, 17)
    np.testing.assert_array_equal(rec, mask)
    assert native.rle_area(counts) == mask.sum()

    # all-zero and all-one masks
    z = np.zeros((4, 4), np.uint8)
    np.testing.assert_array_equal(native.rle_decode(native.rle_encode(z), 4, 4), z)
    o = np.ones((4, 4), np.uint8)
    np.testing.assert_array_equal(native.rle_decode(native.rle_encode(o), 4, 4), o)


def test_native_unpack_matches_python():
    stream = pack_obj_atts([3, 7, 9], [[1, 5], [], [2]])
    assert native.unpack_obj_atts(stream) == unpack_obj_atts(stream)

    att_scores = np.zeros((2, 10), np.float32)
    att_scores[0, 2] = 0.8
    att_scores[1, 4] = 0.5
    det = pack_obj_atts_det([3, 7], att_scores)
    got = native.unpack_obj_atts_det(det)
    want = unpack_obj_atts_det(det)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0]
        for (gi, gs), (wi, ws) in zip(g[1], w[1]):
            assert gi == wi and abs(gs - ws) < 1e-6


def test_native_lcs_matches_python_dp():
    from style_seqcvae_tpu.evaluation.metrics import _lcs_len

    rng = np.random.RandomState(11)
    a_seqs, b_seqs = [], []
    for _ in range(50):
        a_seqs.append(rng.randint(0, 20, rng.randint(0, 30)).astype(np.int32))
        b_seqs.append(rng.randint(0, 20, rng.randint(0, 30)).astype(np.int32))
    a_seqs.append(np.empty((0,), np.int32))   # empty-vs-nonempty
    b_seqs.append(np.arange(5, dtype=np.int32))
    got = native.lcs_lens(a_seqs, b_seqs)
    if got is None:
        import pytest
        pytest.skip("native library unavailable")
    want = [_lcs_len([str(x) for x in a], [str(x) for x in b])
            for a, b in zip(a_seqs, b_seqs)]
    np.testing.assert_array_equal(got, np.asarray(want, np.int32))
