"""Pallas TPU RoIAlign.

TPU-native analogue of the reference CUDA kernel (frcnn/lib/model/csrc/
cuda/ROIAlign_cuda.cu:16-60): grid over RoIs; the per-RoI batch index is
scalar-prefetched so the BlockSpec index_map DMAs exactly that image's
feature map into VMEM (a stride-16 C4 map of a 600×1000 image is ~10 MB —
within the 16 MB VMEM budget); the 7×7 bins × sampling grid are then
computed with dynamic VMEM loads, vectorized over channels (the lane
dimension).

Forward only — training uses the pure-XLA gather (ops/roi_align.py) whose
autodiff provides the scatter backward; this kernel targets the extraction
path where RoIAlign runs hundreds of times per image.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(batch_idx_ref, rois_flat_ref, feat_ref, out_ref, *,
            spatial_scale: float, pooled: int, sampling: int,
            height: int, width: int):
    # rois ride in flat as a scalar-prefetch operand: SMEM windows pad each
    # row to 512 B, so a 2-D (R, 5) window blows the 1 MB SMEM budget at
    # batched-extraction R, while the flat (R*5,) form stays at 4 bytes/elem
    r = pl.program_id(0)
    x1 = rois_flat_ref[5 * r + 1] * spatial_scale
    y1 = rois_flat_ref[5 * r + 2] * spatial_scale
    x2 = rois_flat_ref[5 * r + 3] * spatial_scale
    y2 = rois_flat_ref[5 * r + 4] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    bin_w = roi_w / pooled
    bin_h = roi_h / pooled

    def sample(y, x):
        """Bilinear sample (C,) with the CUDA boundary rules."""
        empty = (y < -1.0) | (y > height) | (x < -1.0) | (x > width)
        y = jnp.clip(y, 0.0, None)
        x = jnp.clip(x, 0.0, None)
        y0 = jnp.minimum(jnp.floor(y).astype(jnp.int32), height - 1)
        x0 = jnp.minimum(jnp.floor(x).astype(jnp.int32), width - 1)
        y1i = jnp.minimum(y0 + 1, height - 1)
        x1i = jnp.minimum(x0 + 1, width - 1)
        ly = jnp.clip(y - y0.astype(y.dtype), 0.0, 1.0)
        lx = jnp.clip(x - x0.astype(x.dtype), 0.0, 1.0)
        def at(yy, xx):
            return feat_ref[0, pl.ds(yy, 1), pl.ds(xx, 1), :][0, 0, :]

        v = ((1 - ly) * (1 - lx) * at(y0, x0)
             + (1 - ly) * lx * at(y0, x1i)
             + ly * (1 - lx) * at(y1i, x0)
             + ly * lx * at(y1i, x1i))
        return jnp.where(empty, 0.0, v)

    inv = 1.0 / (sampling * sampling)

    # fori_loop over the pooled bins, NOT a static 7×7 unroll: the unrolled
    # form emits pooled²·sampling²·4 dynamic VMEM loads (784 at defaults)
    # and the remote Mosaic compile of that body costs 60-240 s — paid at
    # executable LOAD by every process, cache hit or not (the persistent
    # XLA cache stores the Mosaic payload as MLIR, compiled per-load). The
    # looped body has 49× fewer ops and compiles in seconds; runtime is
    # unchanged (the kernel is DMA-bound on the feature-window fill).
    def bin_body(i, carry):
        ph = i // pooled
        pw = i % pooled
        phf = ph.astype(jnp.float32)
        pwf = pw.astype(jnp.float32)
        acc = jnp.zeros(feat_ref.shape[-1:], jnp.float32)
        for iy in range(sampling):
            for ix in range(sampling):
                y = y1 + (phf + (iy + 0.5) / sampling) * bin_h
                x = x1 + (pwf + (ix + 0.5) / sampling) * bin_w
                acc = acc + sample(y, x)
        # accumulate in f32, store in the feature dtype (bf16 inference);
        # dynamic sublane store is fine in f32 (16-bit dtypes are not,
        # which is why the kernel runs f32 internally)
        out_ref[0, ph, pw, :] = (acc * inv).astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, pooled * pooled, bin_body, 0, unroll=False)


def roi_align_pallas(features: jnp.ndarray, rois: jnp.ndarray, *,
                     spatial_scale: float, pooled_height: int = 7,
                     pooled_width: int = 7, sampling_ratio: int = 2,
                     interpret: bool = False) -> jnp.ndarray:
    """features (B, H, W, C) float32; rois (R, 5) → (R, PH, PW, C)."""
    assert pooled_height == pooled_width, "square pooling only"
    # Mosaic restricts dynamic sublane indexing for 16-bit dtypes (the
    # bilinear gathers use per-sample dynamic W offsets) — run the kernel in
    # f32 and hand the caller back its dtype. The pooled map is tiny; the
    # cast cost is negligible next to the backbone convs.
    out_dtype = features.dtype
    features = features.astype(jnp.float32)
    rois = rois.astype(jnp.float32)
    B, H, W, C = features.shape
    R = rois.shape[0]
    batch_idx = rois[:, 0].astype(jnp.int32)

    # Channel-split grid: the (1, H, W, c_block) feature window must fit the
    # ~16 MB scoped-VMEM budget double-buffered. A full-C block of a
    # 608×928 canvas map is 9.0 MB — fine at small batch, but Mosaic's
    # buffering pushed it past the budget at extraction bs=16; capping the
    # block at ≤4 MB keeps the kernel batch-size-independent. RoIAlign is
    # pointwise across channels, so the split is free.
    # step down in multiples of 128 (Mosaic lane tiling) that divide C; a
    # non-dividing or non-128-multiple block would fail Mosaic or silently
    # fall back to the full-C window this split exists to avoid
    c_block = C
    if H * W * C * 4 > 4 * 2 ** 20:
        if C % 128 == 0:
            for cand in range(C - 128, 0, -128):
                if C % cand == 0 and H * W * cand * 4 <= 4 * 2 ** 20:
                    c_block = cand
                    break
            else:
                if C > 128:
                    c_block = 128
        if c_block == C:
            # The full-C window exceeds the 4 MB budget and cannot shrink:
            # either C is not a 128 multiple (pad channels), or C is
            # already at the 128-lane minimum and the SPATIAL map is too
            # big. Say so instead of failing mysteriously inside Mosaic
            # (shipped backbones are C=1024/512 and never hit this).
            import warnings
            advice = ("pad channels to a multiple of 128" if C % 128
                      else "the spatial map is too large for a single-"
                           "lane-group window — reduce the canvas")
            warnings.warn(
                f"roi_align_pallas: feature window {H}x{W}x{C} is "
                f"{H * W * C * 4 / 2**20:.1f} MB with no usable channel "
                f"split — VMEM may overflow at large batch; {advice}",
                stacklevel=2)
    n_c = C // c_block

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,            # batch_idx (index_map) + flat rois
        grid=(R, n_c),
        in_specs=[
            pl.BlockSpec((1, H, W, c_block),
                         lambda r, c, bidx, rflat: (bidx[r], 0, 0, c),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, pooled_height, pooled_width, c_block),
                               lambda r, c, bidx, rflat: (r, 0, 0, c),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_kernel, spatial_scale=spatial_scale, pooled=pooled_height,
                sampling=sampling_ratio, height=H, width=W),
        out_shape=jax.ShapeDtypeStruct((R, pooled_height, pooled_width, C),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(batch_idx, rois.reshape(-1), features).astype(out_dtype)
