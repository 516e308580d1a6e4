"""Device mesh + sharding rules — the framework's distribution layer.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(var_updown/scripts/train.py:123-124, frcnn/trainval_net.py:308-309). The
TPU-native replacement (SURVEY.md §2.6/§5.8):

* a 2-D ``jax.sharding.Mesh`` with axes ``(data, model)``;
* **DP**: batch dimension of every input sharded over ``data``; XLA inserts
  the gradient ``psum`` over ICI automatically under ``jit``;
* **TP (model axis)**: the large vocabulary-facing matrices (embedding
  table, tied output projection) and the fused LSTM gate matrices are
  sharded over ``model``; XLA inserts the activation collectives;
* **FSDP-style param sharding** (optional): large parameter leaves sharded
  over ``data`` and all-gathered on use.

Multi-host uses ``jax.distributed.initialize`` + the same code — no
hand-written collectives anywhere: see :mod:`.multihost`
(``maybe_initialize_distributed`` + per-process local→global batch
assembly). :func:`shard_batch` / :func:`shard_detector_batch` route
through ``jax.make_array_from_process_local_data`` automatically when
running multi-process.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_data: int = -1, num_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if num_data == -1:
        num_data = n // num_model
    assert num_data * num_model == n, (
        f"mesh {num_data}x{num_model} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs: shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def _batch_leaf_spec(ndim: int, leading_scan_axis: bool) -> P:
    """Partition spec for one batch leaf: batch dim over ``data``; with a
    (K, batch, …) steps-per-dispatch stack, axis 1 is the batch."""
    if leading_scan_axis:
        return P(None, DATA_AXIS) if ndim >= 2 else P()
    return P(DATA_AXIS) if ndim >= 1 else P()


def _put_leaf(mesh: Mesh, x, spec: P):
    """Place one host array with ``spec``. Single-process: plain
    ``device_put`` of the global array. Multi-process (multi-host): ``x``
    is this process's LOCAL shard and the global array is assembled via
    ``jax.make_array_from_process_local_data`` (SURVEY.md §5.8) — each
    process feeds only the rows its addressable devices own."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


def shard_batch(mesh: Mesh, batch, leading_scan_axis: bool = False):
    """Place every array in a batch pytree with batch-dim sharding
    (process-local shards when running multi-host, see :func:`_put_leaf`).

    ``leading_scan_axis``: the leaves carry a (K, batch, …) steps-per-
    dispatch stack — shard axis 1 (the batch) and replicate the scan axis."""

    def put(x):
        if x is None:
            return None
        x = jnp.asarray(x)
        return _put_leaf(mesh, x, _batch_leaf_spec(x.ndim, leading_scan_axis))

    return jax.tree_util.tree_map(put, batch)


# fields of the detector batch that are NOT batch-leading (replicated)
_DETECTOR_REPLICATED = ("att_counts",)


def shard_detector_batch(mesh: Mesh, batch, leading_scan_axis: bool = False):
    """Detector batches mix batch-leading arrays (images, gt_boxes, …) with
    global ones (att_counts, the per-class attribute frequencies) — shard
    the former over ``data``, replicate the latter.

    ``leading_scan_axis``: the per-step fields carry a (K, batch, …)
    steps-per-dispatch stack — shard axis 1 (the batch), replicate the
    scan axis."""
    out = {}
    for k, v in batch.items():
        if v is None:
            out[k] = None
            continue
        v = jnp.asarray(v)
        if k in _DETECTOR_REPLICATED or v.ndim == 0:
            spec = P()
        elif leading_scan_axis:
            spec = P(None, DATA_AXIS) if v.ndim >= 2 else P()
        else:
            spec = P(DATA_AXIS)
        out[k] = _put_leaf(mesh, v, spec)
    return out


def replicate(mesh: Mesh, tree):
    """device_put a pytree fully replicated over the mesh (params for
    decode; the TP train path uses :func:`shard_params` instead)."""
    sh = NamedSharding(mesh, P())

    def put(x):
        return None if x is None else jax.device_put(jnp.asarray(x), sh)

    return jax.tree_util.tree_map(put, tree)


def decode_grid_specs(mesh: Mesh, n_z: int, batch: int):
    """Placement of the (z, batch, states, beam) decode grid on the data
    axis (SURVEY.md §2.6 "batch/beam sharding for inference"). The z and
    batch elements are fully independent (per-element beam/state math, no
    cross-element reductions), so sharding either axis is a pure DP split.
    Prefer z (always = N_Z_SAMPLES, typically 20, and present even at
    batch 1 — the reference's own loop shape, inference.py:138), else
    batch, else replicate.

    Returns ``(zmajor_spec, batch_spec)``: the spec for z-major ``(Z, B,…)``
    stacks (FSM tables) and for batch-leading ``(B,…)`` arrays (features,
    sentiment, num_constraints)."""
    nd = mesh.shape[DATA_AXIS]
    if n_z % nd == 0:
        return P(DATA_AXIS), P()
    if batch % nd == 0:
        return P(None, DATA_AXIS), P(DATA_AXIS)
    if nd > 1:
        # Neither grid axis divides the data axis: the decode would run
        # FULLY REPLICATED on every chip — a silent loss of all decode
        # parallelism (e.g. 20 z-samples on a 3-chip mesh). Make it loud;
        # callers can pad n_z up to a multiple of the mesh (extra samples
        # are free diversity) or batch to a divisible group size.
        import warnings
        warnings.warn(
            f"decode_grid_specs: neither n_z={n_z} nor batch={batch} "
            f"divides the {nd}-device data axis — decoding will run fully "
            "replicated (single-chip work on every chip). Pad n_z or batch "
            "to a multiple of the mesh to restore decode parallelism.",
            stacklevel=2)
    return P(), P()


# Explicit per-leaf TP layout for the captioner/baseline param trees,
# keyed by path SUFFIX (exact match on the trailing components). Every leaf
# of both trees must resolve through this table — an unmatched leaf raises,
# so a param rename breaks loudly instead of silently de-sharding.
#
# Model-axis TP: embedding (V, E) → vocab rows over model; tied/untied
# output projection (H, V) → vocab columns (and its (V,) bias) over model;
# the three fused (in, 4H) LSTM gate matrices → gate columns over model.
# Small projections/biases replicate; FSDP-eligible 2-D leaves shard over
# data when ``shard_params_over_data`` (if divisible, else replicate).
_PARAM_SPEC_TABLE = (
    (("embedding",), P(MODEL_AXIS, None), False),
    (("output_layer", "w"), P(None, MODEL_AXIS), False),
    (("output_layer", "b"), P(MODEL_AXIS), False),
    (("attention_lstm", "w"), P(None, MODEL_AXIS), False),
    (("encoder_lstm", "w"), P(None, MODEL_AXIS), False),
    (("decoder_lstm", "w"), P(None, MODEL_AXIS), False),
    (("language_lstm", "w"), P(None, MODEL_AXIS), False),   # baseline family
    (("attention_lstm", "b"), P(), False),
    (("encoder_lstm", "b"), P(), False),
    (("decoder_lstm", "b"), P(), False),
    (("language_lstm", "b"), P(), False),
    (("attention", "w_query"), P(), True),
    (("attention", "w_image"), P(), True),
    (("attention", "w_attend"), P(), False),
    (("fc_mean_w",), P(), True),
    (("fc_mean_b",), P(), False),
    (("fc_log_var_w",), P(), True),
    (("fc_log_var_b",), P(), False),
    # tied-embedding head (embedding_size 300/600 → the production shape):
    # h → Linear(H, E) → tanh → ·embᵀ. The (H, E) projection is small —
    # replicate (FSDP-eligible); the vocab dimension is already covered by
    # the sharded embedding table.
    (("output_projection", "w"), P(), True),
    (("output_projection", "b"), P(), False),
)


def _path_keys(path):
    return tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def param_sharding(mesh: Mesh, params, shard_params_over_data: bool = False):
    """Sharding pytree for the captioner/baseline parameters, resolved
    through the explicit :data:`_PARAM_SPEC_TABLE` (no substring guessing).

    ``shard_params_over_data``: FSDP-style memory scaling — eligible
    replicated 2-D leaves shard dim 0 (or dim 1) over ``data`` when the
    dimension divides the mesh's data size."""
    nd = mesh.shape[DATA_AXIS]

    def divisible(spec, leaf):
        return all(ax is None or leaf.shape[d] % mesh.shape[ax] == 0
                   for d, ax in enumerate(spec))

    def spec_of(path, leaf):
        keys = _path_keys(path)
        for suffix, spec, fsdp in _PARAM_SPEC_TABLE:
            if keys[-len(suffix):] == suffix:
                if fsdp and shard_params_over_data and leaf.ndim == 2:
                    if leaf.shape[0] % nd == 0:
                        return P(DATA_AXIS, None)
                    if leaf.shape[1] % nd == 0:
                        return P(None, DATA_AXIS)
                # odd vocab / hidden sizes fall back to replication rather
                # than failing device_put with an indivisible shard
                return spec if divisible(spec, leaf) else P()
        raise ValueError(
            f"param leaf {'.'.join(keys)} (shape {getattr(leaf, 'shape', '?')}) "
            "has no entry in _PARAM_SPEC_TABLE — add an explicit spec for it "
            "(parallel/mesh.py) so its sharding is a decision, not an accident")

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_of(path, leaf)), params)


def shard_params(mesh: Mesh, params, shard_params_over_data: bool = False):
    shardings = param_sharding(mesh, params, shard_params_over_data)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
