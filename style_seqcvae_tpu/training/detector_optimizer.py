"""Detector optimizer with the reference's per-parameter rules.

frcnn/trainval_net.py:275-292: SGD(momentum=0.9); biases get lr×2 when
TRAIN.DOUBLE_BIAS and weight decay only when TRAIN.BIAS_DECAY; backbone
pieces frozen per resnet.trainable_label. LR decays by GAMMA every
``lr_decay_step`` epochs (:323-325)."""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from style_seqcvae_tpu.models.detector.faster_rcnn import detector_trainable_labels


class DetSGDState(NamedTuple):
    step: jnp.ndarray
    trace: Any


def make_detector_optimizer(params, *, lr: float, momentum: float = 0.9,
                            weight_decay: float = 1e-4, double_bias: bool = False,
                            bias_decay: bool = False,
                            steps_per_epoch: int = 1,
                            lr_decay_step_epochs: int = 4,
                            gamma: float = 0.1,
                            clip_norm: float = 0.0,
                            freeze_backbone: bool = True
                            ) -> optax.GradientTransformation:
    labels = detector_trainable_labels(params, freeze_backbone)

    def is_bias(path) -> bool:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        return keys[-1] == "b"

    bias_flags = jax.tree_util.tree_map_with_path(lambda p, _: is_bias(p), params)
    flat_labels = jax.tree_util.tree_leaves(labels)
    flat_bias = jax.tree_util.tree_leaves(bias_flags)

    def init_fn(params):
        return DetSGDState(jnp.zeros((), jnp.int32),
                           jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        it = state.step + 1
        epoch = it // steps_per_epoch
        decay_pow = (epoch // lr_decay_step_epochs).astype(jnp.float32)
        lr_t = lr * jnp.power(gamma, decay_pow)

        grads_flat, treedef = jax.tree_util.tree_flatten(grads)
        params_flat = jax.tree_util.tree_leaves(params)
        trace_flat = jax.tree_util.tree_leaves(state.trace)

        # "input_conv" (unfrozen from-scratch stem): the folded init makes
        # its grads ~std× larger and weights ~std× smaller — rescale by
        # 1/std² BEFORE clipping so it neither explodes nor dominates the
        # global norm (resnet._INPUT_PIXEL_STD)
        from style_seqcvae_tpu.models.detector.resnet import _INPUT_PIXEL_STD

        scale_of = {"never": 0.0, "input_conv": 1.0 / (_INPUT_PIXEL_STD ** 2)}
        masked = [g * scale_of.get(l, 1.0)
                  for g, l in zip(grads_flat, flat_labels)]
        if clip_norm > 0:
            gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in masked))
            scale = jnp.minimum(1.0, clip_norm / (gnorm + 1e-6))
            masked = [g * scale for g in masked]

        new_trace, updates = [], []
        for g, p, t, l, b in zip(masked, params_flat, trace_flat, flat_labels, flat_bias):
            if l == "never":
                new_trace.append(t)
                updates.append(jnp.zeros_like(p))
                continue
            wd = weight_decay if (not b or bias_decay) else 0.0
            lr_mult = 2.0 if (b and double_bias) else 1.0
            g_eff = g + wd * p
            t_new = momentum * t + g_eff
            new_trace.append(t_new)
            updates.append(-lr_t * lr_mult * t_new)

        return (jax.tree_util.tree_unflatten(treedef, updates),
                DetSGDState(it, jax.tree_util.tree_unflatten(treedef, new_trace)))

    return optax.GradientTransformation(init_fn, update_fn)
