"""Pallas NMS vs the golden CPU reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.ops.nms import nms_reference
from style_seqcvae_tpu.ops.pallas.nms import nms_pallas


def random_boxes(rng, n):
    ctr = rng.rand(n, 2) * 60
    wh = rng.rand(n, 2) * 30 + 2
    return np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)


def test_pallas_nms_matches_reference():
    rng = np.random.RandomState(0)
    for n in (60, 128, 200):
        boxes = random_boxes(rng, n)
        scores = rng.rand(n).astype(np.float32)
        want = nms_reference(boxes, scores, 0.5)
        keep_idx, keep_mask = nms_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                         0.5, interpret=True)
        got = np.asarray(keep_idx)
        got = got[got >= 0]
        np.testing.assert_array_equal(got, want)
        assert np.asarray(keep_mask).sum() == len(want)


def test_pallas_nms_max_out():
    rng = np.random.RandomState(1)
    boxes = random_boxes(rng, 96)
    scores = rng.rand(96).astype(np.float32)
    keep_idx, _ = nms_pallas(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                             max_out=10, interpret=True)
    assert keep_idx.shape == (10,)
