"""RoICrop — spatial-transformer RoI pooling (affine grid + bilinear sample).

TPU-native equivalent of the reference's third pooling mode
(``cfg.POOLING_MODE == 'crop'``): the roi box becomes a 2×3 affine theta
(frcnn/lib/model/utils/net_utils.py:87-181 ``_crop_pool_layer`` /
``_affine_grid_gen``), ``F.affine_grid`` generates normalized sample
coordinates, the CUDA ``roi_crop`` kernel
(frcnn/lib/model/roi_crop/src/roi_crop.c BilinearSampler semantics)
bilinearly samples, and an optional 2×2 max-pool halves the 2× grid
(``cfg.CROP_RESIZE_WITH_MAX_POOL``).

Design: all three stages are one fused XLA program — the (R, G, G, 2) grid
is computed in registers, the four bilinear corners gather from the flat
(B·H·W, C) feature tensor (the same gather pattern as
:mod:`style_seqcvae_tpu.ops.roi_align`, which XLA vectorizes well on TPU),
and autodiff of the gather gives the scatter-add backward of
roi_crop.c:updateGradInput. Torch-0.4-era ``align_corners=True`` grid
semantics (x = -1 ↦ column 0, x = +1 ↦ column W-1) and zero padding
outside the feature map, matching the C kernel's ``between()`` guards.
"""

from __future__ import annotations

import jax.numpy as jnp


def affine_theta(rois: jnp.ndarray, height: int, width: int,
                 spatial_scale: float) -> jnp.ndarray:
    """rois (R, 5) ``[batch_idx, x1, y1, x2, y2]`` (image coords) →
    theta (R, 2, 3), the box-to-affine matrix of net_utils.py:93-101."""
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale
    zero = jnp.zeros_like(x1)
    row_x = jnp.stack([(x2 - x1) / (width - 1), zero,
                       (x1 + x2 - width + 1) / (width - 1)], axis=1)
    row_y = jnp.stack([zero, (y2 - y1) / (height - 1),
                       (y1 + y2 - height + 1) / (height - 1)], axis=1)
    return jnp.stack([row_x, row_y], axis=1)          # (R, 2, 3)


def affine_grid(theta: jnp.ndarray, grid_h: int, grid_w: int) -> jnp.ndarray:
    """theta (R, 2, 3) → normalized xy sampling grid (R, grid_h, grid_w, 2)
    with torch ``F.affine_grid(..., align_corners=True)`` semantics (the
    default of the torch era the reference targets)."""
    ys = jnp.linspace(-1.0, 1.0, grid_h)
    xs = jnp.linspace(-1.0, 1.0, grid_w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")      # (gh, gw)
    base = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)   # (gh, gw, 3)
    # out[r, i, j, :] = theta[r] @ [x, y, 1]
    return jnp.einsum("ijk,rlk->rijl", base, theta)   # (R, gh, gw, 2) xy


def grid_sample(features: jnp.ndarray, batch_idx: jnp.ndarray,
                grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample: features (B, H, W, C), batch_idx (R,), grid
    (R, gh, gw, 2) normalized xy → (R, gh, gw, C); zero padding outside
    (roi_crop.c ``between()`` guards / torch padding_mode='zeros')."""
    B, H, W, C = features.shape
    ix = (grid[..., 0] + 1.0) * 0.5 * (W - 1)         # align_corners=True
    iy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    lx = ix - x0
    ly = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = features.reshape(B * H * W, C)
    roi_base = batch_idx.astype(jnp.int32)[:, None, None] * (H * W)

    def corner(yc, xc, w):
        inside = (yc >= 0) & (yc < H) & (xc >= 0) & (xc < W)
        yc = jnp.clip(yc, 0, H - 1)
        xc = jnp.clip(xc, 0, W - 1)
        vals = flat[(roi_base + yc * W + xc).reshape(-1)]
        vals = vals.reshape(grid.shape[:3] + (C,))
        return vals * (w * inside.astype(w.dtype))[..., None]

    out = (corner(y0i, x0i, (1 - ly) * (1 - lx))
           + corner(y0i, x0i + 1, (1 - ly) * lx)
           + corner(y0i + 1, x0i, ly * (1 - lx))
           + corner(y0i + 1, x0i + 1, ly * lx))
    return out.astype(features.dtype)


def roi_crop(features: jnp.ndarray, rois: jnp.ndarray, *,
             spatial_scale: float, pooled_height: int = 7,
             pooled_width: int = 7, max_pool: bool = True) -> jnp.ndarray:
    """The full ``_crop_pool_layer``: features (B, H, W, C), rois (R, 5) →
    (R, PH, PW, C). ``max_pool=True`` samples a 2× grid then 2×2-max-pools
    (cfg.CROP_RESIZE_WITH_MAX_POOL, net_utils.py:126-135)."""
    B, H, W, C = features.shape
    gh = pooled_height * 2 if max_pool else pooled_height
    gw = pooled_width * 2 if max_pool else pooled_width
    theta = affine_theta(rois, H, W, spatial_scale)
    grid = affine_grid(theta, gh, gw)
    crops = grid_sample(features, rois[:, 0], grid)
    if max_pool:
        R = crops.shape[0]
        crops = crops.reshape(R, pooled_height, 2, pooled_width, 2, C)
        crops = jnp.max(crops, axis=(2, 4))
    return crops
