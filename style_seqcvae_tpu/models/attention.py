"""Bottom-up top-down (BUTD) additive attention.

TPU-native redesign of updown-baseline/updown/modules/attention.py:9-125.
Differences from the reference implementation:

* The image-feature projection is computed ONCE per decode (host code calls
  :func:`project_image_features` outside the time-step scan) instead of the
  reference's lru-cache-on-tensor hack (attention.py:99-125), which is both
  unsafe (hashes by object identity) and re-runs under beam expansion.
* The query can carry arbitrary leading "grid" dimensions (batch, z-samples,
  FSM states, beam): ``query (..., H)`` attends over ``(B, N, P)`` features
  with broadcasting — no feature replication to ``batch*beam`` as in the
  reference's ``_decode_step`` (var_updown updown_captioner.py:405-424).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from style_seqcvae_tpu.ops.masked import masked_softmax


class AttentionParams(NamedTuple):
    w_query: jnp.ndarray  # (query_size, projection_size), no bias
    w_image: jnp.ndarray  # (image_feature_size, projection_size), no bias
    w_attend: jnp.ndarray  # (projection_size,), no bias


def init_attention(key: jax.Array, query_size: int, image_feature_size: int,
                   projection_size: int, dtype=jnp.float32) -> AttentionParams:
    """Torch ``nn.Linear`` default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kq, ki, ka = jax.random.split(key, 3)

    def uni(k, shape, fan_in):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(k, shape, minval=-bound, maxval=bound, dtype=dtype)

    return AttentionParams(
        w_query=uni(kq, (query_size, projection_size), query_size),
        w_image=uni(ki, (image_feature_size, projection_size), image_feature_size),
        w_attend=uni(ka, (projection_size,), projection_size),
    )


def project_image_features(params: AttentionParams, image_features: jnp.ndarray) -> jnp.ndarray:
    """(B, N, F) → (B, N, P). Call once per decode, outside the step scan."""
    return jnp.dot(image_features, params.w_image, preferred_element_type=jnp.float32
                   ).astype(image_features.dtype)


def attention_weights(params: AttentionParams, query: jnp.ndarray,
                      projected_image_features: jnp.ndarray,
                      image_features_mask: jnp.ndarray) -> jnp.ndarray:
    """Additive attention: ``w_a · tanh(W_q q + W_v V)`` → masked softmax.

    query: (B, ..., H) — any number of inner grid dims between batch and H.
    projected_image_features: (B, N, P); image_features_mask: (B, N).
    Returns weights of shape (B, ..., N).
    """
    proj_query = jnp.dot(query, params.w_query, preferred_element_type=jnp.float32
                         ).astype(query.dtype)
    # Broadcast: (B, ..., 1, P) + (B, 1..., N, P)
    extra = proj_query.ndim - 2  # inner grid dims
    pv = projected_image_features.reshape(
        (projected_image_features.shape[0],) + (1,) * extra + projected_image_features.shape[1:]
    )
    logits = jnp.tanh(proj_query[..., None, :] + pv) @ params.w_attend
    mask = image_features_mask.reshape(
        (image_features_mask.shape[0],) + (1,) * extra + (image_features_mask.shape[-1],)
    )
    return masked_softmax(logits, jnp.broadcast_to(mask, logits.shape), axis=-1)
