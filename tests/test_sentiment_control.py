"""Mechanism test for the style axis: mode-1 sentiment conditioning must
CONTROL decoded lexicon choice (VERDICT r4 item 1).

Trains a tiny Style-SeqCVAE (SENTIMENT_VAE=1, SIMPLE_VAE=False — the
reference run config, var_updown/configs/config.yaml:52-57) on a synthetic
corpus whose captions carry a polarity word drawn from a pos/neg lexicon
matching the caption's sentiment label, then decodes the SAME images with
sentiment=+1 and sentiment=-1 and asserts the lexicon rates flip. This is
the unit-scale version of the three-stage pipeline's style battery
(scripts/style_report.py over runs/pipeline3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_seqcvae_tpu.config import Config
from style_seqcvae_tpu.decoding.beam_search import beam_search
from style_seqcvae_tpu.models.captioner import (
    CaptionerConfig, init_captioner, make_decode_context,
    make_optimized_step_fn)
from style_seqcvae_tpu.models.updown_cell import init_cell_state
from style_seqcvae_tpu.training.optimizer import make_captioner_optimizer
from style_seqcvae_tpu.training.trainer import TrainState, make_train_step

pytestmark = pytest.mark.slow  # ~500 CPU train steps

PAD, END = 0, 1
N_OBJ, N_POS, N_NEG = 6, 4, 4
OBJ0 = 2                       # token ids: objects then pos then neg words
POS0, NEG0 = OBJ0 + N_OBJ, OBJ0 + N_OBJ + N_POS
V = NEG0 + N_NEG
T = 6


def _corpus(rng, n):
    """Features = noisy object prototypes; caption = 'obj .. senti-word'
    with the polarity word tied to the sentiment label."""
    protos = rng.randn(N_OBJ, 16).astype(np.float32) * 2
    obj = rng.randint(0, N_OBJ, n)
    senti = rng.choice([-1.0, 1.0], (n, 1)).astype(np.float32)
    feats = (protos[obj][:, None, :]
             + 0.2 * rng.randn(n, 4, 16).astype(np.float32))
    toks = np.full((n, T), PAD, np.int32)
    toks[:, 0] = OBJ0 + obj
    word = np.where(senti[:, 0] > 0,
                    POS0 + rng.randint(0, N_POS, n),
                    NEG0 + rng.randint(0, N_NEG, n))
    toks[:, 1] = word
    toks[:, 2] = END
    return feats, toks, senti


def test_mode1_sentiment_conditioning_controls_lexicon():
    cfg = CaptionerConfig(
        vocab_size=V, image_feature_size=16, embedding_size=12,
        hidden_size=16, attention_projection_size=8, z_space=6,
        sentiment_vae=1, simple_vae=False, senti_prior_multip=0.5,
        max_caption_length=T)
    config = Config(config_override=[
        "OPTIM.NUM_ITERATIONS", "600", "OPTIM.LR", "0.3",
        "OPTIM.EPOCH_START_DECODER_TRAINING", "0",
        "MODEL.KLD_WEIGHT", "750"])
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    tx = make_captioner_optimizer(config, params, cfg.tie_embeddings)
    state = TrainState(params=params, opt_state=tx.init(params),
                       rng=jax.random.PRNGKey(1))
    step = make_train_step(tx, cfg, 750.0)

    rng = np.random.RandomState(0)
    first = last = None
    for i in range(500):
        feats, toks, senti = _corpus(rng, 32)
        state, m = step(state, {
            "image_features": jnp.asarray(feats),
            "caption_tokens": jnp.asarray(toks),
            "sentiment": jnp.asarray(senti)})
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert last < 0.5 * first, (first, last)

    # decode the SAME features under both polarities
    feats, _, _ = _corpus(np.random.RandomState(99), 24)
    featsj = jnp.asarray(feats)

    def decode(sentiment):
        sent = jnp.full((24, 1), sentiment, jnp.float32)
        ctx = make_decode_context(state.params, cfg, featsj, sentiment=sent)
        sfn = make_optimized_step_fn(state.params, cfg, ctx)
        init = init_cell_state((24,), cfg.hidden_size, jnp.float32)
        start = jnp.full((24,), END)
        seqs, _ = beam_search(sfn, start, init, jax.random.PRNGKey(3),
                              max_steps=T, beam_size=2,
                              per_node_beam_size=2, end_index=END)
        return np.asarray(seqs[:, 0, :])

    def rates(toks):
        pos = np.any((toks >= POS0) & (toks < NEG0), axis=1).mean()
        neg = np.any(toks >= NEG0, axis=1).mean()
        return pos, neg

    pos_rate_p, neg_rate_p = rates(decode(+1.0))
    pos_rate_n, neg_rate_n = rates(decode(-1.0))
    # conditioning flips the lexicon: strong margin, bounded crossover
    assert pos_rate_p >= 0.75, (pos_rate_p, neg_rate_p)
    assert neg_rate_n >= 0.75, (pos_rate_n, neg_rate_n)
    assert neg_rate_p <= 0.25, (pos_rate_p, neg_rate_p)
    assert pos_rate_n <= 0.25, (pos_rate_n, neg_rate_n)
