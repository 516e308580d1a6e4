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


def test_pallas_roi_align_nondefault_pool_and_sampling():
    """Loop-form kernel (round 3) must stay exact for non-default pooled
    size / sampling ratio (the bin index arithmetic is now computed from a
    fori_loop counter rather than unrolled Python ints)."""
    import numpy as np
    import jax.numpy as jnp

    from style_seqcvae_tpu.ops.roi_align import roi_align
    from style_seqcvae_tpu.ops.pallas.roi_align import roi_align_pallas

    rng = np.random.RandomState(7)
    feat = jnp.asarray(rng.rand(2, 11, 13, 256).astype(np.float32))
    rois = np.concatenate(
        [rng.randint(0, 2, (17, 1)).astype(np.float32),
         rng.rand(17, 4).astype(np.float32) * 150], axis=1)
    rois[:, 3] = rois[:, 1] + rng.rand(17) * 60 + 4
    rois[:, 4] = rois[:, 2] + rng.rand(17) * 60 + 4
    rois = jnp.asarray(rois)
    kw = dict(spatial_scale=1 / 16., pooled_height=3, pooled_width=3,
              sampling_ratio=1)
    a = roi_align(feat, rois, **kw)
    b = roi_align_pallas(feat, rois, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
