"""Golden tests for detector ops: RoIAlign vs a scalar numpy transcription of
the CUDA kernel math, NMS vs the CPU-reference algorithm, bbox transforms vs
manual computation."""

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.ops.boxes import (
    bbox_overlaps,
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
)
from style_seqcvae_tpu.ops.nms import nms, nms_reference
from style_seqcvae_tpu.ops.roi_align import roi_align, roi_pool


def np_bilinear(feat, y, x):
    """Scalar bilinear_interpolate (ROIAlign_cuda.cu:16-60 semantics)."""
    H, W = feat.shape[:2]
    if y < -1.0 or y > H or x < -1.0 or x > W:
        return np.zeros(feat.shape[-1], feat.dtype)
    y, x = max(y, 0.0), max(x, 0.0)
    y_low, x_low = int(np.floor(y)), int(np.floor(x))
    y_low, x_low = min(y_low, H - 1), min(x_low, W - 1)
    y_high, x_high = min(y_low + 1, H - 1), min(x_low + 1, W - 1)
    ly, lx = min(max(y - y_low, 0.0), 1.0), min(max(x - x_low, 0.0), 1.0)
    hy, hx = 1 - ly, 1 - lx
    return (hy * hx * feat[y_low, x_low] + hy * lx * feat[y_low, x_high]
            + ly * hx * feat[y_high, x_low] + ly * lx * feat[y_high, x_high])


def np_roi_align(feats, rois, scale, ph, pw, sr):
    R = rois.shape[0]
    C = feats.shape[-1]
    out = np.zeros((R, ph, pw, C), np.float32)
    for r in range(R):
        b = int(rois[r, 0])
        x1, y1, x2, y2 = rois[r, 1:] * scale
        rw, rh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        bw, bh = rw / pw, rh / ph
        for i in range(ph):
            for j in range(pw):
                acc = np.zeros(C, np.float32)
                for iy in range(sr):
                    for ix in range(sr):
                        y = y1 + i * bh + (iy + 0.5) * bh / sr
                        x = x1 + j * bw + (ix + 0.5) * bw / sr
                        acc += np_bilinear(feats[b], y, x)
                out[r, i, j] = acc / (sr * sr)
    return out


def test_roi_align_matches_scalar_reference():
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 12, 14, 5).astype(np.float32)
    rois = np.array([
        [0, 0, 0, 100, 120],
        [0, 16, 8, 64, 96],
        [1, 5, 5, 40, 30],
        [1, 100, 100, 110, 105],   # partially out of range after scaling
        [0, 0, 0, 3, 3],           # tiny roi → min size clamp
    ], np.float32)
    scale = 1.0 / 8.0
    want = np_roi_align(feats, rois, scale, 7, 7, 2)
    got = roi_align(jnp.asarray(feats), jnp.asarray(rois), spatial_scale=scale,
                    pooled_height=7, pooled_width=7, sampling_ratio=2)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_roi_align_gradient_is_scatter():
    """Autodiff backward must match finite differences (the CUDA backward
    kernel is the transpose scatter of the forward gather)."""
    rng = np.random.RandomState(1)
    feats = rng.randn(1, 6, 6, 2).astype(np.float32)
    rois = np.array([[0, 2, 2, 30, 30]], np.float32)

    def f(x):
        return jnp.sum(roi_align(x, jnp.asarray(rois), spatial_scale=1 / 8.0,
                                 pooled_height=2, pooled_width=2,
                                 sampling_ratio=2) ** 2)

    g = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    eps = 1e-3
    for (b, i, j, c) in [(0, 0, 0, 0), (0, 2, 3, 1), (0, 1, 1, 0)]:
        fp = feats.copy(); fp[b, i, j, c] += eps
        fm = feats.copy(); fm[b, i, j, c] -= eps
        num = (float(f(jnp.asarray(fp))) - float(f(jnp.asarray(fm)))) / (2 * eps)
        np.testing.assert_allclose(g[b, i, j, c], num, atol=2e-2)


def test_roi_pool_basic():
    rng = np.random.RandomState(2)
    feats = rng.randn(1, 8, 8, 3).astype(np.float32)
    # x2=y2=56 → round(56/8)=7 → roi size 8 → exact 4-wide bins
    rois = np.array([[0, 0, 0, 56, 56]], np.float32)
    out = roi_pool(jnp.asarray(feats), jnp.asarray(rois), spatial_scale=1 / 8.0,
                   pooled_height=2, pooled_width=2)
    want00 = feats[0, :4, :4].max(axis=(0, 1))
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], want00, atol=1e-5)
    want11 = feats[0, 4:, 4:].max(axis=(0, 1))
    np.testing.assert_allclose(np.asarray(out)[0, 1, 1], want11, atol=1e-5)


def test_nms_matches_reference():
    rng = np.random.RandomState(3)
    for trial in range(5):
        N = 60
        ctr = rng.rand(N, 2) * 50
        wh = rng.rand(N, 2) * 30 + 2
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
        scores = rng.rand(N).astype(np.float32)
        want = nms_reference(boxes, scores, 0.5)
        keep_idx, keep_mask = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
        got = np.asarray(keep_idx)
        got = got[got >= 0]
        np.testing.assert_array_equal(got, want)
        assert np.asarray(keep_mask).sum() == len(want)


def test_nms_max_out_truncates():
    boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110], [200, 200, 210, 210]],
                        jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep_idx, _ = nms(boxes, scores, 0.5, max_out=2)
    np.testing.assert_array_equal(np.asarray(keep_idx), [0, 1])


def test_bbox_transform_roundtrip():
    rng = np.random.RandomState(4)
    ex = np.abs(rng.randn(10, 4) * 20); ex[:, 2:] += ex[:, :2] + 5
    gt = np.abs(rng.randn(10, 4) * 20); gt[:, 2:] += gt[:, :2] + 5
    deltas = bbox_transform(jnp.asarray(ex, jnp.float32), jnp.asarray(gt, jnp.float32))
    rec = np.asarray(bbox_transform_inv(jnp.asarray(ex, jnp.float32), deltas))
    # Faithful reference quirk (bbox_transform.py:95-101): with +1-width
    # convention, reconstruction yields x1/y1 exact but x2/y2 = gt + 1.
    np.testing.assert_allclose(rec[:, :2], gt[:, :2], atol=1e-3)
    np.testing.assert_allclose(rec[:, 2:], gt[:, 2:] + 1.0, atol=1e-3)


def test_clip_and_overlaps():
    boxes = jnp.asarray([[-5, -5, 30, 40], [10, 10, 200, 150]], jnp.float32)
    c = clip_boxes(boxes, 100, 120)
    np.testing.assert_allclose(np.asarray(c), [[0, 0, 30, 40], [10, 10, 119, 99]])

    a = jnp.asarray([[0, 0, 9, 9]], jnp.float32)       # area 100
    b = jnp.asarray([[0, 0, 9, 9], [5, 0, 14, 9], [20, 20, 29, 29]], jnp.float32)
    iou = np.asarray(bbox_overlaps(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 50 / 150, 0.0], atol=1e-6)


class TestRoiCrop:
    """RoICrop (pooling_mode='crop'): affine-grid + bilinear sampler golden
    against torch F.affine_grid/F.grid_sample(align_corners=True), the exact
    ops the reference composes in _crop_pool_layer (net_utils.py:87-135)."""

    def _fixture(self):
        rng = np.random.RandomState(0)
        feats = rng.randn(2, 12, 16, 3).astype(np.float32)
        rois = np.array([
            [0, 8.0, 4.0, 120.0, 90.0],
            [1, 0.0, 0.0, 60.0, 60.0],
            [0, 32.0, 16.0, 200.0, 150.0],
        ], np.float32)
        return feats, rois

    def test_matches_torch_stn(self):
        import torch
        import torch.nn.functional as TF

        from style_seqcvae_tpu.ops.roi_crop import (
            affine_grid, affine_theta, grid_sample)

        feats, rois = self._fixture()
        H, W, scale, G = 12, 16, 1.0 / 16.0, 14

        theta_j = affine_theta(jnp.asarray(rois), H, W, scale)
        grid_j = affine_grid(theta_j, G, G)
        out_j = grid_sample(jnp.asarray(feats), jnp.asarray(rois[:, 0]), grid_j)

        # torch side: identical theta formula (net_utils.py:93-101)
        x1 = torch.from_numpy(rois[:, 1] * scale)
        y1 = torch.from_numpy(rois[:, 2] * scale)
        x2 = torch.from_numpy(rois[:, 3] * scale)
        y2 = torch.from_numpy(rois[:, 4] * scale)
        zero = torch.zeros_like(x1)
        theta_t = torch.stack([
            torch.stack([(x2 - x1) / (W - 1), zero,
                         (x1 + x2 - W + 1) / (W - 1)], 1),
            torch.stack([zero, (y2 - y1) / (H - 1),
                         (y1 + y2 - H + 1) / (H - 1)], 1)], 1)
        grid_t = TF.affine_grid(theta_t, torch.Size((3, 1, G, G)),
                                align_corners=True)
        bottom = torch.from_numpy(feats).permute(0, 3, 1, 2)[
            rois[:, 0].astype(int)]
        out_t = TF.grid_sample(bottom, grid_t, align_corners=True,
                               padding_mode="zeros").permute(0, 2, 3, 1)

        np.testing.assert_allclose(np.asarray(grid_j),
                                   grid_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), atol=1e-5)

    def test_crop_pool_layer_shape_and_grad(self):
        from style_seqcvae_tpu.ops.roi_crop import roi_crop

        feats, rois = self._fixture()

        def f(x):
            return jnp.sum(roi_crop(x, jnp.asarray(rois), spatial_scale=1 / 16.0,
                                    pooled_height=7, pooled_width=7) ** 2)

        out = roi_crop(jnp.asarray(feats), jnp.asarray(rois),
                       spatial_scale=1 / 16.0, pooled_height=7, pooled_width=7)
        assert out.shape == (3, 7, 7, 3)
        g = jax.grad(f)(jnp.asarray(feats))
        assert np.isfinite(np.asarray(g)).all() and float(jnp.sum(jnp.abs(g))) > 0

    def test_detector_forward_crop_mode(self):
        """pooling_mode='crop' flows through the detector forward."""
        from style_seqcvae_tpu.models.detector.faster_rcnn import (
            DetectorConfig, detector_forward_test, init_detector)
        from style_seqcvae_tpu.models.detector.rpn import RPNConfig

        cfg = DetectorConfig(num_classes=5, num_att_classes=4,
                             pooling_mode="crop",
                             rpn=RPNConfig())
        params = init_detector(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(1, 64, 80, 3).astype(np.float32) * 255)
        info = jnp.asarray([[64.0, 80.0, 1.0]], np.float32)
        out = detector_forward_test(params, cfg, images, info,
                                    post_nms_top_n=10, pre_nms_top_n=50)
        assert np.isfinite(np.asarray(out["pooled_feat"])).all()
