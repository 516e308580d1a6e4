"""VGG16 backbone variant for the detector.

Mirror of frcnn/lib/model/faster_rcnn/vgg16.py:19-60: features = conv1_1..
conv5_3 (13 convs, 4 maxpools → stride 16, 512 ch, last pool dropped),
head = fc6/fc7 (4096) on the flattened 7×7 RoI, first two conv blocks
frozen. The reference VGG variant carries NO attribute head (SURVEY §2.2).
NHWC/HWIO layout; torchvision ``features.N`` / ``classifier.N`` names map
via :func:`import_vgg_state_dict`.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

# conv channels per block (torchvision vgg16.features layout)
_CFG = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]


def init_vgg16(key, dtype=jnp.float32) -> Dict[str, Any]:
    params: Dict[str, Any] = {"convs": []}
    in_ch = 3
    keys = jax.random.split(key, 16)
    ki = 0
    for out_ch, n in _CFG:
        for _ in range(n):
            fan_in = 3 * 3 * in_ch
            std = jnp.sqrt(2.0 / fan_in)
            if ki == 0:
                # fold the caffe pixel-scale input std into the first
                # conv's random init (see resnet._INPUT_PIXEL_STD)
                from style_seqcvae_tpu.models.detector.resnet import (
                    _INPUT_PIXEL_STD)

                std = std / _INPUT_PIXEL_STD
            params["convs"].append({
                "w": jax.random.normal(keys[ki], (3, 3, in_ch, out_ch), dtype) * std,
                "b": jnp.zeros((out_ch,), dtype)})
            in_ch = out_ch
            ki += 1
    bound = 1.0 / jnp.sqrt(512 * 7 * 7)
    params["fc6"] = {"w": jax.random.uniform(keys[13], (512 * 7 * 7, 4096),
                                             minval=-bound, maxval=bound, dtype=dtype),
                     "b": jnp.zeros((4096,), dtype)}
    bound = 1.0 / jnp.sqrt(4096)
    params["fc7"] = {"w": jax.random.uniform(keys[14], (4096, 4096),
                                             minval=-bound, maxval=bound, dtype=dtype),
                     "b": jnp.zeros((4096,), dtype)}
    return params


def _conv(x, p):
    return jax.lax.conv_general_dilated(
        x, p["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _pool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def backbone(params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) → conv5_3 features (B, H/16, W/16, 512)."""
    x = images
    ci = 0
    for bi, (_, n) in enumerate(_CFG):
        for _ in range(n):
            x = jax.nn.relu(_conv(x, params["convs"][ci]))
            ci += 1
        if bi < 4:  # last maxpool dropped (vgg16.py keeps stride 16)
            x = _pool(x)
    return x


def head_to_tail(params, pooled: jnp.ndarray) -> jnp.ndarray:
    """RoI-pooled (R, 7, 7, 512) → fc6/fc7 → (R, 4096).

    torch flattens NCHW (C, H, W); transpose before the fc so imported fc6
    weights line up."""
    r = pooled.shape[0]
    flat = jnp.transpose(pooled, (0, 3, 1, 2)).reshape(r, -1)
    x = jax.nn.relu(jnp.dot(flat, params["fc6"]["w"],
                            preferred_element_type=jnp.float32) + params["fc6"]["b"])
    x = jax.nn.relu(jnp.dot(x, params["fc7"]["w"],
                            preferred_element_type=jnp.float32) + params["fc7"]["b"])
    return x


def trainable_label(path_keys: List[str]) -> str:
    """First two conv blocks (indices 0..3) frozen (vgg16.py:39-42)."""
    keys = [str(k) for k in path_keys]
    if "convs" in keys:
        for k in keys:
            if k.startswith("[") and k.strip("[]").isdigit():
                return "never" if int(k.strip("[]")) < 4 else "always"
    return "always"


def import_vgg_state_dict(sd) -> Dict[str, Any]:
    """torchvision vgg16 names → our tree (conv OIHW→HWIO)."""
    import numpy as np

    def npy(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params: Dict[str, Any] = {"convs": []}
    for i in conv_idx:
        params["convs"].append({
            "w": jnp.asarray(np.transpose(npy(sd[f"features.{i}.weight"]), (2, 3, 1, 0))),
            "b": jnp.asarray(npy(sd[f"features.{i}.bias"]))})
    params["fc6"] = {"w": jnp.asarray(npy(sd["classifier.0.weight"]).T),
                     "b": jnp.asarray(npy(sd["classifier.0.bias"]))}
    params["fc7"] = {"w": jnp.asarray(npy(sd["classifier.3.weight"]).T),
                     "b": jnp.asarray(npy(sd["classifier.3.bias"]))}
    return params
