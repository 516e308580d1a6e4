"""One-way PyTorch → JAX weight importers (SURVEY §5.4).

Maps reference checkpoint state_dicts onto this framework's parameter
pytrees for parity validation:

* :func:`import_captioner_state_dict` — var_updown ``UpDownCaptioner``
  (module names from var_updown/var_updown/models/updown_captioner.py /
  modules/updown_cell.py): embedding, attention/encoder/decoder LSTM cells
  (fused), BUTD attention projections, fc_mean/fc_log_var, tied output
  projection.
* :func:`import_resnet_state_dict` — torchvision / jwyang ResNet weights
  (OIHW → HWIO transpose, BN running stats → frozen stats).
* :func:`import_detector_state_dict` — jwyang ``resnet(_fasterRCNN)``
  layout: RCNN_base Sequential indices [0 conv1, 1 bn1, 4 layer1, 5 layer2,
  6 layer3], RCNN_top = layer4, RPN heads, cls/bbox/attribute heads.

State dicts may contain torch tensors or numpy arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from style_seqcvae_tpu.ops.lstm import from_torch_lstm_cell


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data:
        data = data["model"]
    # DataParallel prefix strip (checkpointing.py:90-93)
    return { (k[7:] if k.startswith("module.") else k): v for k, v in data.items()}


def _lstm(sd: Mapping, prefix: str):
    return from_torch_lstm_cell(
        _np(sd[prefix + ".weight_ih"]), _np(sd[prefix + ".weight_hh"]),
        _np(sd[prefix + ".bias_ih"]), _np(sd[prefix + ".bias_hh"]))


def import_captioner_state_dict(sd: Mapping, params: Dict[str, Any]) -> Dict[str, Any]:
    """Fill our captioner params pytree from a reference state dict.
    ``params`` provides the structure (from init_captioner)."""
    import jax.numpy as jnp

    cell = params["cell"]._replace(
        attention_lstm=_lstm(sd, "_updown_cell._attention_lstm_cell"),
        encoder_lstm=_lstm(sd, "_updown_cell._language_lstm_cell_encoder"),
        decoder_lstm=_lstm(sd, "_updown_cell._language_lstm_cell_decoder"),
        attention=params["cell"].attention._replace(
            w_query=jnp.asarray(_np(
                sd["_updown_cell._butd_attention._query_vector_projection_layer.weight"]).T),
            w_image=jnp.asarray(_np(
                sd["_updown_cell._butd_attention._image_features_projection_layer.weight"]).T),
            w_attend=jnp.asarray(_np(
                sd["_updown_cell._butd_attention._attention_layer.weight"])[0]),
        ),
        fc_mean_w=jnp.asarray(_np(sd["_updown_cell.fc_mean.weight"]).T),
        fc_mean_b=jnp.asarray(_np(sd["_updown_cell.fc_mean.bias"])),
        fc_log_var_w=jnp.asarray(_np(sd["_updown_cell.fc_log_var.weight"]).T),
        fc_log_var_b=jnp.asarray(_np(sd["_updown_cell.fc_log_var.bias"])),
    )
    out = dict(params)
    out["cell"] = cell
    out["embedding"] = jnp.asarray(_np(sd["_embedding_layer.weight"]))
    if "output_projection" in params:
        out["output_projection"] = {
            "w": jnp.asarray(_np(sd["_output_projection.0.weight"]).T),
            "b": jnp.asarray(_np(sd["_output_projection.0.bias"])),
        }
    elif "_output_layer.weight" in sd:
        out["output_layer"] = {
            "w": jnp.asarray(_np(sd["_output_layer.weight"]).T),
            "b": jnp.asarray(_np(sd["_output_layer.bias"])),
        }
    return out


def import_baseline_state_dict(sd: Mapping, params: Dict[str, Any]) -> Dict[str, Any]:
    """updown-baseline captioner (single language LSTM)."""
    import jax.numpy as jnp

    cell = params["cell"]._replace(
        attention_lstm=_lstm(sd, "_updown_cell._attention_lstm_cell"),
        language_lstm=_lstm(sd, "_updown_cell._language_lstm_cell"),
        attention=params["cell"].attention._replace(
            w_query=jnp.asarray(_np(
                sd["_updown_cell._butd_attention._query_vector_projection_layer.weight"]).T),
            w_image=jnp.asarray(_np(
                sd["_updown_cell._butd_attention._image_features_projection_layer.weight"]).T),
            w_attend=jnp.asarray(_np(
                sd["_updown_cell._butd_attention._attention_layer.weight"])[0]),
        ))
    out = dict(params)
    out["cell"] = cell
    out["embedding"] = jnp.asarray(_np(sd["_embedding_layer.weight"]))
    if "output_projection" in params:
        out["output_projection"] = {
            "w": jnp.asarray(_np(sd["_output_projection.0.weight"]).T),
            "b": jnp.asarray(_np(sd["_output_projection.0.bias"])),
        }
    return out


def _conv(sd: Mapping, name: str):
    import jax.numpy as jnp

    return jnp.asarray(np.transpose(_np(sd[name]), (2, 3, 1, 0)))  # OIHW→HWIO


def _bn(sd: Mapping, prefix: str):
    import jax.numpy as jnp

    return {"scale": jnp.asarray(_np(sd[prefix + ".weight"])),
            "offset": jnp.asarray(_np(sd[prefix + ".bias"])),
            "mean": jnp.asarray(_np(sd[prefix + ".running_mean"])),
            "var": jnp.asarray(_np(sd[prefix + ".running_var"]))}


def _bottleneck(sd: Mapping, prefix: str) -> Dict[str, Any]:
    p = {"conv1": _conv(sd, prefix + ".conv1.weight"), "bn1": _bn(sd, prefix + ".bn1"),
         "conv2": _conv(sd, prefix + ".conv2.weight"), "bn2": _bn(sd, prefix + ".bn2"),
         "conv3": _conv(sd, prefix + ".conv3.weight"), "bn3": _bn(sd, prefix + ".bn3")}
    if prefix + ".downsample.0.weight" in sd:
        p["downsample"] = {"conv": _conv(sd, prefix + ".downsample.0.weight"),
                           "bn": _bn(sd, prefix + ".downsample.1")}
    return p


def import_resnet_state_dict(sd: Mapping, depth: int = 101) -> Dict[str, Any]:
    """torchvision-style names: conv1/bn1/layerX.Y.*."""
    from style_seqcvae_tpu.models.detector.resnet import LAYERS

    blocks = LAYERS[depth]
    params: Dict[str, Any] = {"conv1": _conv(sd, "conv1.weight"),
                              "bn1": _bn(sd, "bn1")}
    for li, n in enumerate(blocks, start=1):
        params[f"layer{li}"] = [_bottleneck(sd, f"layer{li}.{bi}")
                                for bi in range(n)]
    return params


def import_detector_state_dict(sd: Mapping, depth: int = 101,
                               num_anchors: int = 12) -> Dict[str, Any]:
    """jwyang resnet(_fasterRCNN) layout → our detector params tree."""
    import jax.numpy as jnp
    from style_seqcvae_tpu.models.detector.resnet import LAYERS

    blocks = LAYERS[depth]
    resnet_params: Dict[str, Any] = {
        "conv1": _conv(sd, "RCNN_base.0.weight"),
        "bn1": _bn(sd, "RCNN_base.1"),
    }
    for li, (seq_idx, n) in enumerate(zip((4, 5, 6), blocks[:3]), start=1):
        resnet_params[f"layer{li}"] = [
            _bottleneck(sd, f"RCNN_base.{seq_idx}.{bi}") for bi in range(n)]
    resnet_params["layer4"] = [
        _bottleneck(sd, f"RCNN_top.0.{bi}") for bi in range(blocks[3])]

    def linear(prefix):
        return {"w": jnp.asarray(_np(sd[prefix + ".weight"]).T),
                "b": jnp.asarray(_np(sd[prefix + ".bias"]))}

    def conv_head(prefix):
        return {"w": _conv(sd, prefix + ".weight"),
                "b": jnp.asarray(_np(sd[prefix + ".bias"]))}

    # RPN cls channel layout: reference packs (2, A) (bg channels first,
    # rpn.py reshape(B, 2, A*H, W)); ours is (A, 2). Permute output channels.
    rpn_cls = conv_head("RCNN_rpn.RPN_cls_score")
    perm = np.arange(2 * num_anchors).reshape(2, num_anchors).T.reshape(-1)
    rpn_cls = {"w": rpn_cls["w"][..., perm], "b": rpn_cls["b"][perm]}

    params: Dict[str, Any] = {
        "resnet": resnet_params,
        "rpn": {"conv": conv_head("RCNN_rpn.RPN_Conv"),
                "cls": rpn_cls,
                "bbox": conv_head("RCNN_rpn.RPN_bbox_pred")},
        "cls_score": linear("RCNN_cls_score"),
        "bbox_pred": linear("RCNN_bbox_pred"),
    }
    if "RCNN_cls_score_atts.weight" in sd:
        params["cls_score_atts"] = linear("RCNN_cls_score_atts")
    return params
