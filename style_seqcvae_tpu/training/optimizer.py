"""Optimizer with exact reference training dynamics.

The reference trains with ``torch.optim.SGD(lr, momentum=0.9,
weight_decay=1e-3)`` + ``LambdaLR(1 - it/num_iterations)`` + global-norm
gradient clipping (var_updown/scripts/train.py:126-176), and a two-phase
schedule that freezes the decoder LSTM except every Nth step until iteration
``EPOCH_START_DECODER_TRAINING`` (train.py:154-161). Frozen parameters in
torch receive no gradient: they are excluded from clipping, weight decay is
skipped, and the momentum buffer is untouched.

This module reproduces all of that as one custom optax-style
``GradientTransformation`` over a *label* pytree:

* ``"always"`` — normal trainable parameter,
* ``"never"``  — permanently frozen (the GloVe embedding when tied,
  reference updown_captioner.py:98-100),
* ``"decoder"`` — follows the freeze schedule.

Ordering per step (1-indexed, matching the reference):
zero-frozen-grads → global-norm clip → +wd·p → momentum trace →
-lr·(1-(it-1)/N)·buf.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class SGDFreezeState(NamedTuple):
    step: jnp.ndarray   # int32, number of completed steps
    trace: Any          # momentum buffers (params-shaped)


def make_labels(params, freeze_embedding: bool) -> Any:
    """Default label pytree for the captioner params layout."""

    def label_path(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if "embedding" in keys and "output_projection" not in keys:
            return "never" if freeze_embedding else "always"
        if "decoder_lstm" in keys:
            return "decoder"
        return "always"

    return jax.tree_util.tree_map_with_path(label_path, params)


def sgd_with_freeze_schedule(
    labels: Any,
    *,
    lr: float,
    momentum: float,
    weight_decay: float,
    num_iterations: int,
    clip_norm: float,
    decoder_start_iteration: int,
    decoder_update_every: int,
) -> optax.GradientTransformation:
    flat_labels = jax.tree_util.tree_leaves(labels)

    def init_fn(params):
        return SGDFreezeState(
            step=jnp.zeros((), jnp.int32),
            trace=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        it = state.step + 1  # 1-indexed iteration, like the reference loop
        decoder_active = jnp.logical_or(
            it > decoder_start_iteration, it % decoder_update_every == 0
        ).astype(jnp.float32)

        def active_of(label):
            if label == "always":
                return jnp.float32(1.0)
            if label == "never":
                return jnp.float32(0.0)
            return decoder_active

        grads_flat, treedef = jax.tree_util.tree_flatten(grads)
        params_flat = jax.tree_util.tree_leaves(params)
        trace_flat = jax.tree_util.tree_leaves(state.trace)

        # 1. zero grads of inactive params (torch: requires_grad=False).
        masked = [g * active_of(l) for g, l in zip(grads_flat, flat_labels)]

        # 2. global-norm clip over active grads (torch clip_grad_norm_,
        #    train.py:173). torch uses eps=1e-6 on the denominator.
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in masked))
        scale = jnp.minimum(1.0, clip_norm / (gnorm + 1e-6))
        masked = [g * scale for g in masked]

        # 3. weight decay + momentum trace (skipped entirely when inactive).
        lr_t = lr * (1.0 - (it - 1).astype(jnp.float32) / num_iterations)
        new_trace, updates = [], []
        for g, p, t, l in zip(masked, params_flat, trace_flat, flat_labels):
            a = active_of(l)
            g_eff = g + weight_decay * p * a
            t_new = jnp.where(a > 0, momentum * t + g_eff, t)
            new_trace.append(t_new)
            updates.append(-lr_t * t_new * a)

        return (jax.tree_util.tree_unflatten(treedef, updates),
                SGDFreezeState(step=it, trace=jax.tree_util.tree_unflatten(treedef, new_trace)))

    return optax.GradientTransformation(init_fn, update_fn)


def make_captioner_optimizer(config, params, tie_embeddings: bool) -> optax.GradientTransformation:
    labels = make_labels(params, freeze_embedding=tie_embeddings)
    return sgd_with_freeze_schedule(
        labels,
        lr=config.OPTIM.LR,
        momentum=config.OPTIM.MOMENTUM,
        weight_decay=config.OPTIM.WEIGHT_DECAY,
        num_iterations=config.OPTIM.NUM_ITERATIONS,
        clip_norm=config.OPTIM.CLIP_GRADIENTS,
        decoder_start_iteration=config.OPTIM.EPOCH_START_DECODER_TRAINING,
        decoder_update_every=config.OPTIM.BEFORE_UPDATE_DECODER_EVERY,
    )
