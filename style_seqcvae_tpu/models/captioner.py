"""Style-SeqCVAE captioner.

TPU-native redesign of var_updown/var_updown/models/updown_captioner.py:20-532.

Train path: the reference's per-token Python loop (updown_captioner.py:282)
is ONE ``jax.lax.scan`` over time steps; per-step masked KL (both closed
forms, reference :298-303) and length-scaled masked CE (reference :457-466)
are computed inside the same compiled program.

Inference path: a step function closure over the (un-replicated) image
features is handed to :mod:`style_seqcvae_tpu.decoding` (beam search / CBS),
with z drawn from the prior per step (updown_cell.py:200-208).

Prior modes (reference updown_captioner.py:250-258):
  0 — standard normal prior (or ``simple_vae``),
  1 — scalar sentiment prior: ``sentiment * 1 * senti_prior_multip``,
  2 — per-step attention-weighted attribute-embedding prior
      (SentiGloVe / SentiWordNet latent dictionaries, reference :76-93).
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.models.attention import project_image_features
from style_seqcvae_tpu.models.updown_cell import (
    CellParams,
    CellState,
    _attend,
    cell_step,
    condition_size,
    image_feature_stats,
    init_cell,
    init_cell_state,
)


class CaptionerConfig(NamedTuple):
    """Static (hashable) model hyperparameters; used as a jit static arg."""
    vocab_size: int
    image_feature_size: int = 2048
    embedding_size: int = 600
    hidden_size: int = 900
    attention_projection_size: int = 768
    z_space: int = 150
    sentiment_vae: int = 0
    simple_vae: bool = True
    latent_embedding: str = "glove"
    latent_embedding_multip: float = 1.0
    prior_std: float = 1.0
    senti_prior_multip: float = 1.0
    max_caption_length: int = 20
    beam_size: int = 1
    use_cbs: bool = False
    cbs_simple: bool = True
    min_constraints_to_satisfy: int = 2
    pad_index: int = 0
    boundary_index: int = 1

    @property
    def tie_embeddings(self) -> bool:
        # Frozen GloVe (300/600) → tied input/output embeddings
        # (reference updown_captioner.py:112-124).
        return self.embedding_size in (300, 600)

    @classmethod
    def from_config(cls, config, vocabulary) -> "CaptionerConfig":
        _C = config
        return cls(
            vocab_size=vocabulary.get_vocab_size(),
            image_feature_size=_C.MODEL.IMAGE_FEATURE_SIZE,
            embedding_size=_C.MODEL.EMBEDDING_SIZE,
            hidden_size=_C.MODEL.HIDDEN_SIZE,
            attention_projection_size=_C.MODEL.ATTENTION_PROJECTION_SIZE,
            z_space=_C.MODEL.Z_SPACE,
            sentiment_vae=int(_C.MODEL.SENTIMENT_VAE),
            simple_vae=bool(_C.MODEL.SIMPLE_VAE),
            latent_embedding=_C.MODEL.LATENT_EMBEDDING,
            latent_embedding_multip=float(_C.MODEL.LATENT_EMBEDDING_MULTIP),
            prior_std=float(_C.MODEL.PRIOR_STD),
            senti_prior_multip=float(_C.MODEL.SENTI_PRIOR_MULTIP),
            max_caption_length=_C.DATA.MAX_CAPTION_LENGTH,
            beam_size=_C.MODEL.BEAM_SIZE,
            use_cbs=bool(_C.MODEL.USE_CBS),
            cbs_simple=bool(_C.MODEL.CBS_SIMPLE),
            min_constraints_to_satisfy=_C.MODEL.MIN_CONSTRAINTS_TO_SATISFY,
            pad_index=vocabulary.unk_index,
            boundary_index=vocabulary.boundary_index,
        )


def hashed_random_embeddings(vocab_tokens, dim: int, pad_index: int) -> np.ndarray:
    """Deterministic stand-in for GloVe when the 5 GB cache is absent.

    The reference falls back to ``2*randn(300)-1`` for OOV words
    (updown_captioner.py:195-197); here every word gets a vector seeded by a
    hash of its text so runs are reproducible without downloads."""
    out = np.zeros((len(vocab_tokens), dim), dtype=np.float32)
    for i, tok in enumerate(vocab_tokens):
        if i == pad_index:
            continue
        seed = int.from_bytes(hashlib.sha256(tok.encode()).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        out[i] = 2.0 * rng.standard_normal(dim).astype(np.float32) - 1.0
    return out


def load_glove_embeddings(vocabulary, dim: int, glove_txt_paths, pad_index: int) -> np.ndarray:
    """Build the frozen embedding table from GloVe-style text files.

    ``glove_txt_paths`` is a list of (path, subdim) whose subdims sum to
    ``dim`` — e.g. [(glove.42B.300d.txt, 300), (deps.words, 300)] reproduces
    the reference's 600-d GloVe+dependency concat (updown_captioner.py:198-217).
    Missing words get hashed-random vectors (reference uses randn)."""
    tokens = [vocabulary.get_token_from_index(i) for i in range(vocabulary.get_vocab_size())]
    wanted = set(tokens)
    pieces = []
    for path, subdim in glove_txt_paths:
        table = hashed_random_embeddings(tokens, subdim, pad_index)
        with open(path, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip().split(" ")
                if parts[0] in wanted and len(parts) == subdim + 1:
                    table[vocabulary.get_token_index(parts[0])] = np.asarray(parts[1:], dtype=np.float32)
        pieces.append(table)
    out = np.concatenate(pieces, axis=1)
    assert out.shape[1] == dim
    out[pad_index] = 0.0
    return out


def init_captioner(key: jax.Array, cfg: CaptionerConfig,
                   embedding_table: Optional[np.ndarray] = None,
                   dtype=jnp.float32) -> Dict[str, Any]:
    """Initialize the full parameter pytree.

    ``embedding_table`` (V, E): frozen GloVe/hashed table; if None a trainable
    table is initialized (reference updown_captioner.py:101-104)."""
    k_cell, k_emb, k_proj, k_out = jax.random.split(key, 4)
    params: Dict[str, Any] = {}
    if embedding_table is not None:
        emb = jnp.asarray(embedding_table, dtype)
    else:
        emb = jax.random.normal(k_emb, (cfg.vocab_size, cfg.embedding_size), dtype)
        emb = emb.at[cfg.pad_index].set(0.0)
    params["embedding"] = emb

    params["cell"] = init_cell(
        k_cell, cfg.image_feature_size, cfg.embedding_size, cfg.hidden_size,
        cfg.attention_projection_size, cfg.z_space, cfg.sentiment_vae,
        cfg.simple_vae, cfg.latent_embedding, dtype)

    from style_seqcvae_tpu.models.init_utils import torch_linear

    def linear(k, fan_in, fan_out, bias=True):
        return torch_linear(k, fan_in, fan_out, dtype, bias)

    if cfg.tie_embeddings:
        # h → Linear(H,E) → tanh → E·embᵀ (tied, no bias).
        params["output_projection"] = linear(k_proj, cfg.hidden_size, cfg.embedding_size)
    else:
        params["output_layer"] = linear(k_out, cfg.hidden_size, cfg.vocab_size)
    return params


def tied_head_projection(params: Dict[str, Any], h_dec: jnp.ndarray) -> jnp.ndarray:
    """Tied head's (…, E) pre-embedding activation: tanh(h·W_proj + b)
    (reference updown_captioner.py:443-444)."""
    return jnp.tanh(
        jnp.dot(h_dec, params["output_projection"]["w"],
                preferred_element_type=jnp.float32).astype(h_dec.dtype)
        + params["output_projection"]["b"])


def output_logits(params: Dict[str, Any], cfg: CaptionerConfig, h_dec: jnp.ndarray) -> jnp.ndarray:
    """Hidden state → vocabulary logits (reference updown_captioner.py:443-445)."""
    if cfg.tie_embeddings:
        proj = tied_head_projection(params, h_dec)
        return jnp.dot(proj, params["embedding"].T,
                       preferred_element_type=jnp.float32).astype(h_dec.dtype)
    return (jnp.dot(h_dec, params["output_layer"]["w"],
                    preferred_element_type=jnp.float32).astype(h_dec.dtype)
            + params["output_layer"]["b"])


def base_prior(cfg: CaptionerConfig, batch_size: int,
               sentiment: Optional[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequence-level prior mean/var (reference updown_captioner.py:250-261).
    Mode-2's per-step attention prior is applied inside the cell."""
    if cfg.sentiment_vae == 1:
        prior_mean = jnp.tile(sentiment.astype(jnp.float32), (1, cfg.z_space)) * cfg.senti_prior_multip
    else:
        prior_mean = jnp.zeros((batch_size, cfg.z_space), jnp.float32)
    prior_var = jnp.full((batch_size, cfg.z_space), float(cfg.prior_std) ** 2, jnp.float32)
    return prior_mean, prior_var


def add_boundary_tokens(caption_tokens: jnp.ndarray, pad_index: int,
                        boundary_index: int) -> jnp.ndarray:
    """(B, T) → (B, T+2) with boundary prepended and appended after the last
    non-pad token (AllenNLP ``add_sentence_boundary_token_ids`` semantics,
    used at reference updown_captioner.py:264-270)."""
    B, T = caption_tokens.shape
    mask = caption_tokens != pad_index
    lengths = jnp.sum(mask.astype(jnp.int32), axis=1)
    out = jnp.full((B, T + 2), pad_index, caption_tokens.dtype)
    out = out.at[:, 1:T + 1].set(jnp.where(mask, caption_tokens, pad_index))
    out = out.at[:, 0].set(boundary_index)
    positions = jnp.arange(T + 2)[None, :]
    out = jnp.where(positions == (lengths + 1)[:, None], boundary_index, out)
    return out


def _per_step_kld(cfg: CaptionerConfig, q_mean, q_log_var, prior_mean, prior_log_var):
    """Both KL closed forms of the reference (updown_captioner.py:298-303)."""
    if cfg.sentiment_vae == 0:
        return -0.5 * jnp.sum(1 + q_log_var - q_mean ** 2 - jnp.exp(q_log_var), axis=-1)
    prior_var = jnp.exp(prior_log_var)
    q_var = jnp.exp(q_log_var)
    kld = 1 + q_log_var - prior_log_var - ((q_mean - prior_mean) ** 2 + q_var) / (prior_var + 1e-5)
    return -0.5 * jnp.sum(kld, axis=-1)


# Unroll factor for the training time-step scan. Hypothesis tested round 3:
# the step is weight-stream bound (~31% of HBM bandwidth re-streams the LSTM
# gate matrices and tied vocab head every scan iteration), so unrolling
# might keep weights resident across k steps. Measured on one v5e at bs=32
# chained-K10 bf16 (ms/step): unroll 1 → 19.2, 2 → 21.4, 4 → 20.8,
# 5 → 20.7 — unrolling is strictly WORSE (XLA re-streams the weights per
# unrolled body anyway and the longer program schedules worse). Kept at 1;
# the knob stays so the measurement is reproducible.
_TRAIN_SCAN_UNROLL = 1


def train_forward(params: Dict[str, Any], cfg: CaptionerConfig, batch: Dict[str, jnp.ndarray],
                  rng: jax.Array, eps: Optional[jnp.ndarray] = None
                  ) -> Dict[str, jnp.ndarray]:
    """Teacher-forced training forward pass.

    batch keys: ``image_features`` (B, N, F); ``caption_tokens`` (B, T) with
    pad=cfg.pad_index; optional ``sentiment`` (B, 1); optional
    ``obj_att_embeds`` (B, N, z) — precomputed mode-2 attribute embedding
    table (host-side analogue of reference ``translate_obj_atts2obj_means``,
    updown_captioner.py:509-532).

    Returns dict with per-sequence ``loss`` (length-scaled masked CE) and
    ``kld`` (masked per-step KL summed over steps) matching the reference's
    output contract (updown_captioner.py:318-323)."""
    image_features = batch["image_features"]
    caption_tokens = batch["caption_tokens"]
    sentiment = batch.get("sentiment")
    obj_att_embeds = batch.get("obj_att_embeds")
    B = image_features.shape[0]

    tokens = add_boundary_tokens(caption_tokens, cfg.pad_index, cfg.boundary_index)
    tokens_mask = (tokens != cfg.pad_index)
    num_steps = tokens.shape[1] - 1

    avg_feats, feats_mask = image_feature_stats(image_features)
    proj_feats = project_image_features(params["cell"].attention, image_features)
    prior_mean, prior_var = base_prior(cfg, B, sentiment)
    prior_log_var = jnp.log(prior_var)

    init_state = init_cell_state((B,), cfg.hidden_size, image_features.dtype)
    if eps is not None:
        # precomputed per-step z-noise (T, ..., z), passed EXPLICITLY (no
        # dtype-sniffing of rng on the production train path) — lets parity
        # tests share eps with a torch reference instead of statistical
        # tolerance; the key column is an unused dummy
        step_keys = jnp.zeros((num_steps,), jnp.uint32)
        eps_stack = jnp.asarray(eps)
    else:
        step_keys = jax.random.split(rng, num_steps)
        eps_stack = None
    input_tokens = tokens[:, :-1].T          # (T, B) scan xs
    token_embs = params["embedding"][input_tokens]  # (T, B, E) one gather

    def scan_step(state: CellState, xs):
        tok_emb, key, eps_t = xs
        h_dec, new_state, q_mean, q_log_var, p_mean, _ = cell_step(
            params["cell"], tok_emb, state,
            image_features=image_features,
            projected_image_features=proj_feats,
            averaged_image_features=avg_feats,
            image_features_mask=feats_mask,
            training=True, rng=key, eps=eps_t,
            sentiment_vae=cfg.sentiment_vae, simple_vae=cfg.simple_vae,
            latent_embedding=cfg.latent_embedding,
            sentiment=sentiment, obj_att_embeds=obj_att_embeds,
            prior_mean=prior_mean, prior_var=prior_var)
        logits = output_logits(params, cfg, h_dec)
        kld = _per_step_kld(cfg, q_mean, q_log_var, p_mean, prior_log_var)
        return new_state, (logits, kld)

    _, (logits_t, kld_t) = jax.lax.scan(
        scan_step, init_state, (token_embs, step_keys, eps_stack),
        unroll=_TRAIN_SCAN_UNROLL)
    logits = jnp.transpose(logits_t, (1, 0, 2))   # (B, T, V)
    klds = kld_t.T * tokens_mask[:, 1:].astype(kld_t.dtype)  # (B, T)

    targets = tokens[:, 1:]
    target_mask = tokens_mask[:, 1:].astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    # Length-scaled masked sequence CE: lengths * mean-per-token
    # (reference updown_captioner.py:457-466 via AllenNLP
    # sequence_cross_entropy_with_logits(average=None)).
    lengths = jnp.sum(target_mask, axis=1)
    per_seq = jnp.sum(nll * target_mask, axis=1) / (lengths + 1e-13)
    loss = lengths * per_seq

    return {"loss": loss, "kld": jnp.sum(klds, axis=1)}


class DecodeContext(NamedTuple):
    """Per-batch precomputed tensors closed over by the decode step fn."""
    image_features: jnp.ndarray
    projected_image_features: jnp.ndarray
    averaged_image_features: jnp.ndarray
    image_features_mask: jnp.ndarray
    prior_mean: jnp.ndarray
    prior_var: jnp.ndarray
    sentiment: Optional[jnp.ndarray]
    obj_att_embeds: Optional[jnp.ndarray]


def make_decode_context(params: Dict[str, Any], cfg: CaptionerConfig,
                        image_features: jnp.ndarray,
                        sentiment: Optional[jnp.ndarray] = None,
                        obj_att_embeds: Optional[jnp.ndarray] = None) -> DecodeContext:
    avg_feats, feats_mask = image_feature_stats(image_features)
    proj_feats = project_image_features(params["cell"].attention, image_features)
    prior_mean, prior_var = base_prior(cfg, image_features.shape[0], sentiment)
    return DecodeContext(image_features, proj_feats, avg_feats, feats_mask,
                         prior_mean, prior_var, sentiment, obj_att_embeds)


def make_step_fn(params: Dict[str, Any], cfg: CaptionerConfig, ctx: DecodeContext,
                 return_raw: bool = False):
    """Build the decoding step function used by greedy/beam/CBS search.

    ``step(tokens, state, rng) -> (log_probs, new_state)`` where ``tokens``
    has shape (B, ...) with arbitrary inner grid dims (beam, FSM states,
    z-samples); log-probs are returned (reference updown_captioner.py:450).
    Image features stay at (B, N, F) — never replicated per beam.

    With ``return_raw=True`` the step returns ``((logits, logz), new_state)``
    where ``log_probs = logits - logz[..., None]`` — searches that only need
    a top-k can select on raw logits (same order) and correct the few
    selected values by the per-row scalar, skipping a full (G, V)
    log_softmax materialization."""

    def step(tokens: jnp.ndarray, state: CellState, rng: jax.Array):
        tok_emb = params["embedding"][tokens]
        h_dec, new_state, _, _, _, _ = cell_step(
            params["cell"], tok_emb, state,
            image_features=ctx.image_features,
            projected_image_features=ctx.projected_image_features,
            averaged_image_features=ctx.averaged_image_features,
            image_features_mask=ctx.image_features_mask,
            training=False, rng=rng,
            sentiment_vae=cfg.sentiment_vae, simple_vae=cfg.simple_vae,
            latent_embedding=cfg.latent_embedding,
            sentiment=ctx.sentiment, obj_att_embeds=ctx.obj_att_embeds,
            prior_mean=ctx.prior_mean, prior_var=ctx.prior_var)
        logits = output_logits(params, cfg, h_dec)
        if return_raw:
            logz = jax.scipy.special.logsumexp(
                logits.astype(jnp.float32), axis=-1)
            return (logits, logz), new_state
        return jax.nn.log_softmax(logits, axis=-1), new_state

    return step


def make_optimized_step_fn(params: Dict[str, Any], cfg: CaptionerConfig,
                           ctx: DecodeContext, return_raw: bool = False,
                           return_prehead: bool = False):
    """Inference step with step-constant LSTM input segments folded out.

    The fused attention-LSTM matmul consumes ``[tok_emb, avg_feats, h1,
    h_dec]`` (updown_cell.py:143-148); ``tok_emb @ W`` depends only on the
    token id (precompute the whole-vocab gate table once) and ``avg @ W``
    only on the image (precompute per batch). The per-step matmul shrinks
    from E+F+2H to 2H input dims — a ~2.5× FLOP cut on the largest matmul.
    The decoder LSTM's sentiment segment (mode 1) folds the same way.

    Exactly equivalent to :func:`make_step_fn` (tested); supports every
    prior mode. Only the inference path (z ~ prior) is implemented."""
    if return_prehead:
        if return_raw:
            raise ValueError("return_prehead and return_raw are conflicting "
                             "step contracts — pick one")
        assert cfg.tie_embeddings, (
            "return_prehead needs the tied output head (the untied head's "
            "(H, V) matrix has no E-dim bottleneck to hand back)")
    cell = params["cell"]
    E, F, H = cfg.embedding_size, cfg.image_feature_size, cfg.hidden_size
    cond = condition_size(cfg.sentiment_vae, cfg.simple_vae,
                          cfg.latent_embedding, cfg.z_space)

    # ---- attention LSTM: split W rows by input segment -------------------
    w_a = cell.attention_lstm.w
    w_a_tok, w_a_avg, w_a_h = w_a[:E], w_a[E:E + F], w_a[E + F:]
    tok_gate_table = jnp.dot(params["embedding"], w_a_tok,
                             preferred_element_type=jnp.float32
                             ).astype(w_a.dtype)                 # (V, 4H)
    avg_gates = jnp.dot(ctx.averaged_image_features, w_a_avg,
                        preferred_element_type=jnp.float32
                        ).astype(w_a.dtype)                      # (B, 4H)

    # ---- decoder LSTM: fold the constant condition segment ---------------
    w_d = cell.decoder_lstm.w
    # input layout: [attended(F), h1(H), h_dec(H), cond?, z] + recurrent h
    sent_gates = None
    if cond == 1 and cfg.sentiment_vae == 1:
        w_d_sent = w_d[F + 2 * H:F + 2 * H + 1]
        sent_gates = jnp.dot(ctx.sentiment.astype(w_d.dtype), w_d_sent,
                             preferred_element_type=jnp.float32
                             ).astype(w_d.dtype)                 # (B, 4H)

    def gate_math(gates, h, c):
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new.astype(h.dtype), c_new.astype(c.dtype)

    from style_seqcvae_tpu.models.attention import attention_weights

    def step(tokens: jnp.ndarray, state: CellState, rng: jax.Array):
        grid = tokens.shape
        extra = len(grid) - 1

        def bcast(x):
            return (x.reshape((x.shape[0],) + (1,) * extra + x.shape[1:])
                    if extra else x)

        # attention LSTM: gather + const + dynamic matmul over
        # [h1, h_dec] (input tail) + h1 (recurrent) — see LSTMCellParams
        # fused layout (input rows then hidden rows).
        xh = jnp.concatenate([state.h1, state.h_dec, state.h1], axis=-1)
        gates = (tok_gate_table[tokens]
                 + jnp.broadcast_to(bcast(avg_gates), grid + (4 * H,))
                 + jnp.dot(xh, w_a_h, preferred_element_type=jnp.float32
                           ).astype(w_a.dtype)
                 + cell.attention_lstm.b)
        h1, c1 = gate_math(gates, state.h1, state.c1)

        attn_w = attention_weights(cell.attention, h1,
                                   ctx.projected_image_features,
                                   ctx.image_features_mask)
        attended = _attend(attn_w, ctx.image_features)

        # prior (mode 2: per-step attention-weighted attribute mean)
        if cfg.sentiment_vae == 2 and ctx.obj_att_embeds is not None:
            prior_mean = _attend(attn_w, ctx.obj_att_embeds)
        else:
            prior_mean = jnp.broadcast_to(bcast(ctx.prior_mean),
                                          grid + ctx.prior_mean.shape[-1:])
        if cfg.simple_vae:
            prior_mean = jnp.zeros_like(prior_mean)
        prior_var = jnp.broadcast_to(bcast(ctx.prior_var), prior_mean.shape)

        if jnp.issubdtype(jnp.asarray(rng).dtype, jnp.floating):
            # precomputed noise slice threaded through the search
            eps = jnp.broadcast_to(rng.astype(prior_mean.dtype), prior_mean.shape)
        else:
            eps = jax.random.normal(rng, prior_mean.shape, prior_mean.dtype)
        z = eps * jnp.sqrt(prior_var) + prior_mean

        # decoder LSTM: dynamic segments [attended, h1, h_dec, (c mode2), z, h_dec]
        parts = [attended, h1, state.h_dec]
        w_rows = [w_d[:F], w_d[F:F + H], w_d[F + H:F + 2 * H]]
        offset = F + 2 * H
        const_gates = cell.decoder_lstm.b
        if sent_gates is not None:
            const_gates = const_gates + jnp.broadcast_to(
                bcast(sent_gates), grid + (4 * H,))
            offset += 1
        elif cond and cfg.sentiment_vae == 2:
            c = (prior_mean[..., 0:1]
                 if cfg.latent_embedding == "senti_word_net" else prior_mean)
            parts.append(c)
            w_rows.append(w_d[offset:offset + c.shape[-1]])
            offset += c.shape[-1]
        parts.append(z)
        w_rows.append(w_d[offset:offset + cfg.z_space])
        parts.append(state.h_dec)                      # recurrent h
        w_rows.append(w_d[offset + cfg.z_space:])
        dyn = jnp.concatenate([p.astype(w_d.dtype) for p in parts], axis=-1)
        w_dyn = jnp.concatenate(w_rows, axis=0)
        gates_d = (jnp.dot(dyn, w_dyn, preferred_element_type=jnp.float32
                           ).astype(w_d.dtype) + const_gates)
        h_dec, c_dec = gate_math(gates_d, state.h_dec, state.c_dec)

        new_state = CellState(h1=h1, c1=c1, h_enc=state.h_enc,
                              c_enc=state.c_enc, h_dec=h_dec, c_dec=c_dec)
        if return_prehead:
            # tied head only: hand back the (…, E) pre-embedding activation
            # so the searcher can fuse the V-matmul into its selection
            # kernel (ops/pallas/vocab_topk_lse.py) — the (…, V) logits
            # never materialize.
            return tied_head_projection(params, h_dec), new_state
        logits = output_logits(params, cfg, h_dec)
        if return_raw:
            logz = jax.scipy.special.logsumexp(
                logits.astype(jnp.float32), axis=-1)
            return (logits, logz), new_state
        return jax.nn.log_softmax(logits, axis=-1), new_state

    return step
