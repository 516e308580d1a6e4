"""ResNet backbone for the detector — NHWC, frozen BatchNorm.

TPU-native equivalent of frcnn/lib/model/faster_rcnn/resnet.py:105-294:
``RCNN_base`` = conv1..layer3 (stride 16, 1024 ch) and ``_head_to_tail`` =
layer4 + global average pool → 2048-d bottom-up feature (resnet.py:292-294).
All BatchNorms run in inference mode with constant statistics (the reference
freezes every BN via ``Set_bn_fix`` / eval, resnet.py:255-291); conv1 and
layer1 are non-trainable at FIXED_BLOCKS=1.

Layout: NHWC activations, HWIO kernels (TPU-preferred). Weight import from
torchvision checkpoints transposes OIHW → HWIO.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

LAYERS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def _conv_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0] * shape[1] * shape[2]
    std = jnp.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


def _bn_init(ch, dtype=jnp.float32):
    return {"scale": jnp.ones((ch,), dtype), "offset": jnp.zeros((ch,), dtype),
            "mean": jnp.zeros((ch,), dtype), "var": jnp.ones((ch,), dtype)}


def init_bottleneck(key, in_ch, planes, stride, dtype=jnp.float32) -> Dict[str, Any]:
    k = jax.random.split(key, 4)
    # conv3 zero-init: each residual branch starts as identity so from-
    # scratch activations stay bounded through 50/101 layers (torchvision
    # zero_init_residual, applied to the conv because BN is frozen here).
    # Irrelevant when importing pretrained torch weights.
    p = {
        "conv1": _conv_init(k[0], (1, 1, in_ch, planes), dtype), "bn1": _bn_init(planes, dtype),
        "conv2": _conv_init(k[1], (3, 3, planes, planes), dtype), "bn2": _bn_init(planes, dtype),
        "conv3": jnp.zeros((1, 1, planes, planes * 4), dtype), "bn3": _bn_init(planes * 4, dtype),
    }
    if stride != 1 or in_ch != planes * 4:
        p["downsample"] = {"conv": _conv_init(k[3], (1, 1, in_ch, planes * 4), dtype),
                           "bn": _bn_init(planes * 4, dtype)}
    return p


# Caffe-convention inputs are PIXEL-scale (mean-subtracted BGR, std ≈ 60-70
# on natural images) and the frozen-BN trunk never normalizes them.
# Pretrained weights absorb that scale; a from-scratch He-init conv1 does
# not, so random-init activations start ~70x too large (measured on the
# synthetic detection corpus: trunk std 92, RPN logit absmax 60, rcnn CE 16
# at init) and training diverges at any practical lr. Folding the input std
# into conv1's RANDOM init fixes from-scratch training and is irrelevant to
# the pretrained-import path (init is overwritten).
_INPUT_PIXEL_STD = 57.6


def init_resnet(key, depth: int = 101, dtype=jnp.float32) -> Dict[str, Any]:
    blocks = LAYERS[depth]
    keys = jax.random.split(key, 5)
    params: Dict[str, Any] = {
        "conv1": _conv_init(keys[0], (7, 7, 3, 64), dtype) / _INPUT_PIXEL_STD,
        "bn1": _bn_init(64, dtype),
    }
    in_ch = 64
    for li, (n, planes) in enumerate(zip(blocks, (64, 128, 256, 512)), start=1):
        layer: List[Dict[str, Any]] = []
        lkeys = jax.random.split(keys[li], n)
        for bi in range(n):
            stride = 1 if (li == 1 or bi > 0) else 2
            layer.append(init_bottleneck(lkeys[bi], in_ch, planes, stride, dtype))
            in_ch = planes * 4
        params[f"layer{li}"] = layer
    return params


def _bn(x, p):
    inv = jax.lax.rsqrt(p["var"] + 1e-5)
    return (x - p["mean"]) * inv * p["scale"] + p["offset"]


def _conv(x, w, stride=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bottleneck(x, p, stride):
    # caffe-style stride placement: the STRIDE SITS ON THE 1x1 conv1, not
    # the 3x3 conv2 (reference resnet.py:71-74, the "# change" block) —
    # torchvision puts it on conv2; with imported reference weights the two
    # compute different features, so this must match the reference.
    out = jax.nn.relu(_bn(_conv(x, p["conv1"], stride), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"]), p["bn2"]))
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        x = _bn(_conv(x, p["downsample"]["conv"], stride), p["downsample"]["bn"])
    return jax.nn.relu(out + x)


def _layer(x, blocks, first_stride, remat: bool = False):
    fn = _bottleneck
    if remat:
        # rematerialize each bottleneck's internals in the backward pass:
        # only block outputs are saved, trading ~30% extra forward FLOPs for
        # the activation memory that otherwise caps the train batch (HBM OOM
        # at bs=16 on one 16 GB v5e without this)
        fn = jax.checkpoint(_bottleneck, static_argnums=(2,))
    for bi, p in enumerate(blocks):
        x = fn(x, p, first_stride if bi == 0 else 1)
    return x


def backbone(params, images: jnp.ndarray, remat: bool = False) -> jnp.ndarray:
    """images (B, H, W, 3) BGR mean-subtracted → C4 features (B, H/16, W/16, 1024)."""
    x = jax.nn.relu(_bn(_conv(images, params["conv1"], stride=2, padding=[(3, 3), (3, 3)]),
                        params["bn1"]))
    # stem max-pool: MaxPool2d(3, 2, padding=0, ceil_mode=True) (reference
    # resnet.py:113 "# change") — windows start at row/col 0 with -inf
    # padding only at the END when needed for the ceil shape; a symmetric
    # padding=1 floor pool would shift every window by one and change the
    # output size for odd inputs.
    ph = (x.shape[1] - 3) % 2
    pw = (x.shape[2] - 3) % 2
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                              [(0, 0), (0, ph), (0, pw), (0, 0)])
    x = _layer(x, params["layer1"], 1, remat)
    x = _layer(x, params["layer2"], 2, remat)
    x = _layer(x, params["layer3"], 2, remat)
    return x


def head_to_tail(params, pooled: jnp.ndarray) -> jnp.ndarray:
    """RoI-pooled (R, 7, 7, 1024) → layer4 → GAP → (R, 2048) bottom-up
    feature (resnet.py:292-294)."""
    x = _layer(pooled, params["layer4"], 2)
    return jnp.mean(x, axis=(1, 2))


def trainable_label(path_keys: List[str]) -> str:
    """'never' for frozen pieces (conv1/bn*/layer1 + all BN stats), matching
    FIXED_BLOCKS=1 + Set_bn_fix (resnet.py:255-291)."""
    keys = [str(k) for k in path_keys]
    if any(k.startswith("bn") or k in ("scale", "offset", "mean", "var",
                                       "downsample_bn") or k == "bn" for k in keys):
        return "never"
    if "conv1" in keys and not any(k.startswith("layer") for k in keys):
        return "never"
    if "layer1" in keys:
        return "never"
    return "always"
