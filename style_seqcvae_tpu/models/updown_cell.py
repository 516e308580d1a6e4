"""Variational UpDown cell — the Style-SeqCVAE core step.

TPU-native redesign of var_updown/var_updown/modules/updown_cell.py:11-270.
One step of the decoder consists of:

1. attention LSTM over ``[token_emb, mean-pooled feats, h1, h_dec]``
   (reference :143-148),
2. BUTD attention over boxes (reference :151-158),
3. style prior: for ``sentiment_vae == 2`` the per-step prior mean is the
   attention-weighted sum of per-box attribute embeddings (reference
   :160-163); ``simple_vae`` forces a zero mean (:165-166),
4. posterior (training: encoder LSTM → fc_mean / fc_log_var, :176-198) or
   prior (inference, :200-203), reparameterized ``z = eps*sqrt(var)+mean``
   (:206-208),
5. decoder LSTM over ``[attended, h1, h_dec, condition?, z]`` (:211-229).

Design differences (TPU-first):

* Pure function over a params NamedTuple; states are a NamedTuple so the
  whole step nests inside ``jax.lax.scan`` / ``vmap`` (the reference runs a
  Python loop per token).
* All four Linear/LSTM applications are fused-gate single matmuls.
* The step accepts arbitrary inner grid dims (z-samples × FSM states × beam)
  between batch and feature axes; image features are never replicated.
* RNG is an explicit ``jax.random`` key per step (the reference uses the
  global ``torch.randn`` stream, which silently diverges under DataParallel).

Condition widths per mode mirror reference :47-81. The reference hard-codes
150 for mode-2 "glove" conditioning; here it is ``z_space`` (identical for
the published config where Z_SPACE=150).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from style_seqcvae_tpu.models.attention import (
    AttentionParams,
    attention_weights,
    init_attention,
)
from style_seqcvae_tpu.ops.lstm import LSTMCellParams, init_lstm_cell, lstm_cell
from style_seqcvae_tpu.ops.masked import masked_mean


class CellParams(NamedTuple):
    attention_lstm: LSTMCellParams
    attention: AttentionParams
    encoder_lstm: LSTMCellParams
    decoder_lstm: LSTMCellParams
    fc_mean_w: jnp.ndarray      # (H, z)
    fc_mean_b: jnp.ndarray      # (z,)
    fc_log_var_w: jnp.ndarray   # (H, z)
    fc_log_var_b: jnp.ndarray   # (z,)


class CellState(NamedTuple):
    h1: jnp.ndarray
    c1: jnp.ndarray
    h_enc: jnp.ndarray
    c_enc: jnp.ndarray
    h_dec: jnp.ndarray
    c_dec: jnp.ndarray


def condition_size(sentiment_vae: int, simple_vae: bool, latent_embedding: str,
                   z_space: int) -> int:
    """Width of the style condition ``c`` appended to encoder/decoder inputs.

    Mirrors the LSTMCell input widths at reference updown_cell.py:47-81
    (including the precedence: simple_vae → none; senti_word_net or mode 1 →
    scalar; mode 2 glove → z_space)."""
    if simple_vae or sentiment_vae == 0:
        return 0
    if latent_embedding == "senti_word_net" or sentiment_vae == 1:
        return 1
    if sentiment_vae == 2:
        return z_space
    raise NotImplementedError(f"sentiment_vae={sentiment_vae}")


def init_cell(key: jax.Array, image_feature_size: int, embedding_size: int,
              hidden_size: int, attention_projection_size: int, z_space: int,
              sentiment_vae: int, simple_vae: bool, latent_embedding: str,
              dtype=jnp.float32) -> CellParams:
    keys = jax.random.split(key, 6)
    cond = condition_size(sentiment_vae, simple_vae, latent_embedding, z_space)
    attn_in = embedding_size + image_feature_size + 2 * hidden_size
    enc_in = cond + image_feature_size + 2 * hidden_size
    dec_in = cond + image_feature_size + 2 * hidden_size + z_space

    def linear(k, fan_in, fan_out):
        from style_seqcvae_tpu.models.init_utils import torch_linear

        p = torch_linear(k, fan_in, fan_out, dtype)
        return p["w"], p["b"]

    fc_mean_w, fc_mean_b = linear(keys[4], hidden_size, z_space)
    fc_lv_w, fc_lv_b = linear(keys[5], hidden_size, z_space)
    return CellParams(
        attention_lstm=init_lstm_cell(keys[0], attn_in, hidden_size, dtype),
        attention=init_attention(keys[1], hidden_size, image_feature_size,
                                 attention_projection_size, dtype),
        encoder_lstm=init_lstm_cell(keys[2], enc_in, hidden_size, dtype),
        decoder_lstm=init_lstm_cell(keys[3], dec_in, hidden_size, dtype),
        fc_mean_w=fc_mean_w, fc_mean_b=fc_mean_b,
        fc_log_var_w=fc_lv_w, fc_log_var_b=fc_lv_b,
    )


def init_cell_state(batch_shape: Tuple[int, ...], hidden_size: int,
                    dtype=jnp.float32) -> CellState:
    z = jnp.zeros(batch_shape + (hidden_size,), dtype)
    return CellState(z, z, z, z, z, z)


def _attend(attn_w: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """Σ_n w[b, ..., n]·values[b, n, f] as a batched MXU contraction.

    Written as einsum (not broadcast-multiply + reduce) so XLA lowers it to
    dot_general: the elementwise form runs as a VPU reduce-fusion over the
    full (grid, N, F) space — tens of ms per decode at production shapes."""
    B, N = values.shape[0], values.shape[1]
    grid = attn_w.shape[:-1]
    w2 = attn_w.reshape(B, -1, N)
    out = jnp.einsum("bxn,bnf->bxf", w2, values,
                     preferred_element_type=jnp.float32).astype(values.dtype)
    return out.reshape(grid + (values.shape[-1],))


def image_feature_stats(image_features: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean-pooled features + box mask, computed ONCE per decode.

    Reference recomputes this per step behind an lru_cache
    (updown_cell.py:233-270); here it is simply hoisted out of the scan.
    Mask convention is identical: a box is real iff its feature vector is not
    all-zero."""
    mask = (jnp.sum(jnp.abs(image_features), axis=-1) > 0)
    avg = masked_mean(image_features, mask[..., None], axis=-2)
    return avg, mask


def cell_step(
    params: CellParams,
    token_embedding: jnp.ndarray,          # (B, ..., E)
    state: CellState,                      # each (B, ..., H)
    *,
    image_features: jnp.ndarray,           # (B, N, F)
    projected_image_features: jnp.ndarray, # (B, N, P)
    averaged_image_features: jnp.ndarray,  # (B, F)
    image_features_mask: jnp.ndarray,      # (B, N)
    training: bool,
    rng: jax.Array,
    sentiment_vae: int,
    simple_vae: bool,
    latent_embedding: str,
    sentiment: Optional[jnp.ndarray] = None,     # (B, 1) float
    obj_att_embeds: Optional[jnp.ndarray] = None,  # (B, N, z) for mode 2
    prior_mean: Optional[jnp.ndarray] = None,      # (B, z) or broadcastable
    prior_var: Optional[jnp.ndarray] = None,       # (B, z) or broadcastable
    eps: Optional[jnp.ndarray] = None,             # precomputed z-noise
):
    """Returns ``(h_dec, new_state, q_mean, q_log_var, prior_mean, attn_w)``.

    ``q_mean``/``q_log_var`` are the distribution z was drawn from (posterior
    when training, prior otherwise), mirroring the reference's return
    contract (updown_cell.py:231)."""
    grid = token_embedding.shape[:-1]      # (B, ...) leading dims
    extra = len(grid) - 1

    def bcast(x):  # lift (B, D) → (B, 1...,D) for inner grid dims
        return x.reshape((x.shape[0],) + (1,) * extra + x.shape[1:]) if extra else x

    # --- 1. attention LSTM -------------------------------------------------
    avg = jnp.broadcast_to(bcast(averaged_image_features),
                           grid + averaged_image_features.shape[-1:])
    attn_in = jnp.concatenate([token_embedding, avg, state.h1, state.h_dec], axis=-1)
    h1, c1 = lstm_cell(params.attention_lstm, attn_in, state.h1, state.c1)

    # --- 2. BUTD attention + attended features -----------------------------
    attn_w = attention_weights(params.attention, h1, projected_image_features,
                               image_features_mask)          # (B, ..., N)
    attended = _attend(attn_w, image_features)               # (B, ..., F)

    # --- 3. style prior ----------------------------------------------------
    if sentiment_vae == 2 and obj_att_embeds is not None:
        prior_mean = _attend(attn_w, obj_att_embeds)         # (B, ..., z)
    else:
        prior_mean = jnp.broadcast_to(bcast(prior_mean), grid + prior_mean.shape[-1:])
    if simple_vae:
        prior_mean = jnp.zeros_like(prior_mean)
    prior_var_b = jnp.broadcast_to(bcast(prior_var), prior_mean.shape)

    cond = condition_size(sentiment_vae, simple_vae, latent_embedding,
                          prior_mean.shape[-1])
    if cond == 0:
        c = None
    elif latent_embedding == "senti_word_net" and sentiment_vae == 2:
        c = prior_mean[..., 0:1]
    elif sentiment_vae == 1:
        c = jnp.broadcast_to(bcast(sentiment), grid + (1,))
    else:  # mode 2, glove conditioning
        c = prior_mean

    # --- 4. posterior / prior + reparameterize -----------------------------
    if training:
        enc_parts = [attended, h1, state.h_dec] + ([c] if c is not None else [])
        enc_in = jnp.concatenate(enc_parts, axis=-1)
        h_enc, c_enc = lstm_cell(params.encoder_lstm, enc_in, state.h_enc, state.c_enc)
        q_mean = jnp.dot(h_enc, params.fc_mean_w,
                         preferred_element_type=jnp.float32) + params.fc_mean_b
        q_log_var = jnp.dot(h_enc, params.fc_log_var_w,
                            preferred_element_type=jnp.float32) + params.fc_log_var_b
        var = jnp.exp(q_log_var)
        mean = q_mean
    else:
        h_enc, c_enc = state.h_enc, state.c_enc
        mean = prior_mean
        var = prior_var_b
        q_mean, q_log_var = mean, jnp.log(var)

    if eps is None and jnp.issubdtype(jnp.asarray(rng).dtype, jnp.floating):
        # DECODE-ONLY noise plumbing: the beam/CBS searches take an explicit
        # ``noise=`` stack and thread its per-step slices through the step
        # fn's opaque key slot (decoding/beam_search.py, cbs_fast.py) — the
        # training path must pass ``eps=`` explicitly instead (train_forward
        # no longer dtype-sniffs its rng).
        eps = jnp.asarray(rng)
    if eps is not None:
        eps = jnp.broadcast_to(jnp.asarray(eps).astype(mean.dtype), mean.shape)
    else:
        eps = jax.random.normal(rng, mean.shape, dtype=mean.dtype)
    z = eps * jnp.sqrt(var) + mean

    # --- 5. decoder LSTM ---------------------------------------------------
    dec_parts = [attended, h1, state.h_dec] + ([c] if c is not None else []) + [z]
    dec_in = jnp.concatenate(dec_parts, axis=-1)
    h_dec, c_dec = lstm_cell(params.decoder_lstm, dec_in, state.h_dec, state.c_dec)

    new_state = CellState(h1=h1, c1=c1, h_enc=h_enc, c_enc=c_enc,
                          h_dec=h_dec, c_dec=c_dec)
    return h_dec, new_state, q_mean, q_log_var, prior_mean, attn_w
