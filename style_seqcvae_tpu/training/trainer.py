"""Captioner training step and loop.

Mirrors the reference loop (var_updown/scripts/train.py:154-188): loss =
mean(reconstruction) + mean(kld)/KLD_WEIGHT, SGD step with clip + schedules,
per-step scalars. The step is one jitted function; under a mesh the batch is
data-sharded and XLA all-reduces gradients over ICI.
"""

from __future__ import annotations

import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from style_seqcvae_tpu.models.captioner import CaptionerConfig, train_forward
from style_seqcvae_tpu.training.optimizer import make_captioner_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    rng: jax.Array

    @property
    def step(self) -> jnp.ndarray:
        return self.opt_state.step


def create_train_state(params, config, model_cfg: CaptionerConfig,
                       rng: jax.Array) -> Tuple[TrainState, Any]:
    tx = make_captioner_optimizer(config, params, model_cfg.tie_embeddings)
    return TrainState(params=params, opt_state=tx.init(params), rng=rng), tx


def _compute_cast(tree, dtype):
    """Cast float leaves for mixed-precision compute; grads flow back f32
    through the cast's vjp (same scheme as the detector's --bf16-compute)."""
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def _make_train_body(tx, model_cfg: CaptionerConfig, kld_weight: float,
                     compute_dtype=None):
    """The (state, batch) → (state, metrics) step body shared by the
    per-dispatch and scan-chained train steps."""

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng, step_rng = jax.random.split(state.rng)

        def loss_fn(params):
            out = train_forward(_compute_cast(params, compute_dtype), model_cfg,
                                _compute_cast(batch, compute_dtype), step_rng)
            reconstr = jnp.mean(out["loss"])
            kld = jnp.mean(out["kld"])
            return reconstr + kld / kld_weight, (reconstr, kld)

        (loss, (reconstr, kld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        metrics = {"loss": loss, "reconstr_loss": reconstr, "kld_loss": kld}
        return TrainState(new_params, new_opt_state, rng), metrics

    return train_step


def make_train_step(tx, model_cfg: CaptionerConfig, kld_weight: float,
                    compute_dtype=None):
    """Returns jitted ``train_step(state, batch) -> (state, metrics)``.

    ``compute_dtype=jnp.bfloat16``: bf16 forward/backward with f32 master
    params + optimizer (bf16 keeps the f32 exponent range → no loss
    scaling). Measured 1.38× per-step on one v5e at the reference shape
    (bs=150, E=600/H=900/z=150); see BASELINE.md "captioner mixed precision"."""
    return jax.jit(_make_train_body(tx, model_cfg, kld_weight, compute_dtype),
                   donate_argnums=(0,))


def make_chained_train_step(tx, model_cfg: CaptionerConfig, kld_weight: float,
                            compute_dtype=None):
    """K optimizer steps in ONE dispatch: ``chained(state, batches)`` scans
    the single-step body over batch leaves stacked on a leading (K, …)
    axis, returning the final state and per-step metrics stacked (K,).

    Every dispatch over the axon tunnel pays ~30 ms of latency (CLAUDE.md);
    a bs=32 reference-shape step is ~25 ms of device time, so chaining is up
    to ~2× wall-clock on small batches. Mathematically identical to K
    sequential ``make_train_step`` calls — the scan carries the same
    TrainState (optimizer step counts, freeze-schedule masks, PRNG stream)
    through the same body (equivalence test:
    test_training.py::test_chained_step_equals_sequential)."""
    body = _make_train_body(tx, model_cfg, kld_weight, compute_dtype)

    def chained(state: TrainState, batches: Dict[str, jnp.ndarray]):
        return jax.lax.scan(body, state, batches)

    return jax.jit(chained, donate_argnums=(0,))


def _gather_corpus_rows(batch, feats_table):
    """Device-side corpus gather: ``feats_table`` is either the features
    array alone or a dict of per-image tables ({"image_features": ...,
    "obj_att_embeds": ...} for mode 2 — lifting the old host-features
    fallback), every one indexed by the batch's ``feat_idx`` column."""
    b = dict(batch)
    idx = b.pop("feat_idx")
    if isinstance(feats_table, dict):
        for k, tbl in feats_table.items():
            b[k] = tbl[idx]
    else:
        b["image_features"] = feats_table[idx]
    return b


def make_corpus_train_step(tx, model_cfg: CaptionerConfig, kld_weight: float,
                           compute_dtype=None):
    """``step(state, feats_table, batch)`` — the batch carries a
    ``feat_idx`` (B,) int32 column instead of ``image_features``; the
    (num_images, boxes, F) corpus table lives on device (replicated over
    the mesh) and the step gathers its rows inside the compiled program.
    Identical math to ``make_train_step`` on the gathered features; the
    table is a jit ARGUMENT (not donated, not a baked constant)."""
    body = _make_train_body(tx, model_cfg, kld_weight, compute_dtype)

    def step(state: TrainState, feats_table, batch):
        return body(state, _gather_corpus_rows(batch, feats_table))

    return jax.jit(step, donate_argnums=(0,))


def make_corpus_chained_train_step(tx, model_cfg: CaptionerConfig,
                                   kld_weight: float, compute_dtype=None):
    """K-steps-per-dispatch variant of :func:`make_corpus_train_step`:
    ``chained(state, feats_table, batches)`` with ``batches["feat_idx"]``
    stacked (K, B); the device-side gather happens per scanned step."""
    body = _make_train_body(tx, model_cfg, kld_weight, compute_dtype)

    def chained(state: TrainState, feats_table, batches):
        def one(st, b):
            return body(st, _gather_corpus_rows(b, feats_table))

        return jax.lax.scan(one, state, batches)

    return jax.jit(chained, donate_argnums=(0,))


def make_baseline_train_step(tx, model_cfg: CaptionerConfig,
                             compute_dtype=None):
    """Train step for the non-VAE UpDown baseline family
    (updown-baseline/scripts/train.py:118-146: plain masked-CE loss, same
    SGD/clip/decay chain; no KLD term, no decoder-freeze schedule — the
    label fn marks every baseline param "always"). Same (state, batch) →
    (state, metrics) contract as ``make_train_step`` so train CLIs and
    checkpointing are shared."""
    from style_seqcvae_tpu.models.baseline import baseline_train_forward

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        rng, _ = jax.random.split(state.rng)  # keep the rng stream contract

        def loss_fn(params):
            out = baseline_train_forward(_compute_cast(params, compute_dtype),
                                         model_cfg,
                                         _compute_cast(batch, compute_dtype))
            return jnp.mean(out["loss"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
        metrics = {"loss": loss, "reconstr_loss": loss,
                   "kld_loss": jnp.zeros_like(loss)}
        return TrainState(new_params, new_opt_state, rng), metrics

    return jax.jit(train_step, donate_argnums=(0,))
