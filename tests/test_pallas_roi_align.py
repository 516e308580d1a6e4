"""Pallas RoIAlign vs the pure-XLA implementation (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.ops.pallas.roi_align import roi_align_pallas
from style_seqcvae_tpu.ops.roi_align import roi_align


def test_pallas_roi_align_matches_xla():
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 12, 14, 8).astype(np.float32)
    rois = np.array([
        [0, 0, 0, 100, 120],
        [0, 16, 8, 64, 96],
        [1, 5, 5, 40, 30],
        [1, 100, 100, 110, 105],
        [0, 0, 0, 3, 3],
    ], np.float32)
    want = roi_align(jnp.asarray(feats), jnp.asarray(rois), spatial_scale=1 / 8.0,
                     pooled_height=7, pooled_width=7, sampling_ratio=2)
    got = roi_align_pallas(jnp.asarray(feats), jnp.asarray(rois),
                           spatial_scale=1 / 8.0, pooled_height=7,
                           pooled_width=7, sampling_ratio=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
