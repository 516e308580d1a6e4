"""Non-variational UpDown baseline captioner.

TPU-native redesign of updown-baseline/updown/{modules/updown_cell.py:11-198,
models/updown_captioner.py:18-423}: attention LSTM + BUTD attention + ONE
language LSTM (no CVAE split, no z). State dict {h1, c1, h2, c2}
(updown_cell.py:126-131); wiring: attention input
``[token_emb, avg_feats, h1, h2]`` (:124-128), language input
``[attended, h1, h2]`` (:142-146). Same frozen-GloVe tied output head and
beam/CBS inference as the Style-SeqCVAE model.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.models.attention import (
    AttentionParams,
    attention_weights,
    init_attention,
    project_image_features,
)
from style_seqcvae_tpu.models.captioner import (
    CaptionerConfig,
    add_boundary_tokens,
    output_logits,
)
from style_seqcvae_tpu.models.updown_cell import _attend, image_feature_stats
from style_seqcvae_tpu.ops.lstm import LSTMCellParams, init_lstm_cell, lstm_cell


class BaselineCellParams(NamedTuple):
    attention_lstm: LSTMCellParams
    attention: AttentionParams
    language_lstm: LSTMCellParams


class BaselineState(NamedTuple):
    h1: jnp.ndarray
    c1: jnp.ndarray
    h2: jnp.ndarray
    c2: jnp.ndarray


def init_baseline(key: jax.Array, cfg: CaptionerConfig,
                  embedding_table: Optional[np.ndarray] = None,
                  dtype=jnp.float32) -> Dict[str, Any]:
    k_attn, k_att, k_lang, k_emb, k_proj, k_out = jax.random.split(key, 6)
    F, E, H, P = (cfg.image_feature_size, cfg.embedding_size, cfg.hidden_size,
                  cfg.attention_projection_size)
    params: Dict[str, Any] = {
        "cell": BaselineCellParams(
            attention_lstm=init_lstm_cell(k_attn, E + F + 2 * H, H, dtype),
            attention=init_attention(k_att, H, F, P, dtype),
            language_lstm=init_lstm_cell(k_lang, F + 2 * H, H, dtype)),
    }
    if embedding_table is not None:
        emb = jnp.asarray(embedding_table, dtype)
    else:
        emb = jax.random.normal(k_emb, (cfg.vocab_size, E), dtype)
        emb = emb.at[cfg.pad_index].set(0.0)
    params["embedding"] = emb

    from style_seqcvae_tpu.models.init_utils import torch_linear

    def linear(k, fan_in, out):
        return torch_linear(k, fan_in, out, dtype)

    if cfg.tie_embeddings:
        params["output_projection"] = linear(k_proj, H, E)
    else:
        params["output_layer"] = linear(k_out, H, cfg.vocab_size)
    return params


def baseline_cell_step(params: BaselineCellParams, token_embedding: jnp.ndarray,
                       state: BaselineState, *, image_features, projected_image_features,
                       averaged_image_features, image_features_mask):
    grid = token_embedding.shape[:-1]
    extra = len(grid) - 1

    def bcast(x):
        return x.reshape((x.shape[0],) + (1,) * extra + x.shape[1:]) if extra else x

    avg = jnp.broadcast_to(bcast(averaged_image_features),
                           grid + averaged_image_features.shape[-1:])
    attn_in = jnp.concatenate([token_embedding, avg, state.h1, state.h2], axis=-1)
    h1, c1 = lstm_cell(params.attention_lstm, attn_in, state.h1, state.c1)
    attn_w = attention_weights(params.attention, h1, projected_image_features,
                               image_features_mask)
    attended = _attend(attn_w, image_features)
    lang_in = jnp.concatenate([attended, h1, state.h2], axis=-1)
    h2, c2 = lstm_cell(params.language_lstm, lang_in, state.h2, state.c2)
    return h2, BaselineState(h1, c1, h2, c2)


def init_baseline_state(batch_shape: Tuple[int, ...], hidden_size: int,
                        dtype=jnp.float32) -> BaselineState:
    z = jnp.zeros(batch_shape + (hidden_size,), dtype)
    return BaselineState(z, z, z, z)


def baseline_train_forward(params, cfg: CaptionerConfig,
                           batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Teacher-forced CE loss (length-scaled masked sequence CE like the
    reference baseline, updown_captioner.py:251-287 + :426-437)."""
    image_features = batch["image_features"]
    tokens = add_boundary_tokens(batch["caption_tokens"], cfg.pad_index,
                                 cfg.boundary_index)
    tokens_mask = tokens != cfg.pad_index
    B = image_features.shape[0]

    avg, mask = image_feature_stats(image_features)
    proj = project_image_features(params["cell"].attention, image_features)
    init_state = init_baseline_state((B,), cfg.hidden_size, image_features.dtype)
    token_embs = params["embedding"][tokens[:, :-1].T]

    def scan_step(state, tok_emb):
        h2, new_state = baseline_cell_step(
            params["cell"], tok_emb, state, image_features=image_features,
            projected_image_features=proj, averaged_image_features=avg,
            image_features_mask=mask)
        return new_state, output_logits(params, cfg, h2)

    _, logits_t = jax.lax.scan(scan_step, init_state, token_embs)
    logits = jnp.transpose(logits_t, (1, 0, 2))
    targets = tokens[:, 1:]
    target_mask = tokens_mask[:, 1:].astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    lengths = jnp.sum(target_mask, axis=1)
    per_seq = jnp.sum(nll * target_mask, axis=1) / (lengths + 1e-13)
    return {"loss": lengths * per_seq}


def make_baseline_step_fn(params, cfg: CaptionerConfig, image_features):
    """Decode step function (beam/CBS compatible; rng accepted and unused)."""
    avg, mask = image_feature_stats(image_features)
    proj = project_image_features(params["cell"].attention, image_features)

    def step(tokens, state, rng):
        tok_emb = params["embedding"][tokens]
        h2, new_state = baseline_cell_step(
            params["cell"], tok_emb, state, image_features=image_features,
            projected_image_features=proj, averaged_image_features=avg,
            image_features_mask=mask)
        return jax.nn.log_softmax(output_logits(params, cfg, h2), axis=-1), new_state

    return step
