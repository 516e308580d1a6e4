"""Baseline (non-VAE) captioner tests: torch-wiring parity of the cell and
full train/decode paths (BASELINE.json config 1: greedy decode on
precomputed features, CPU-runnable)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from style_seqcvae_tpu.decoding.beam_search import beam_search, greedy_decode
from style_seqcvae_tpu.models.baseline import (
    baseline_cell_step,
    baseline_train_forward,
    init_baseline,
    init_baseline_state,
    make_baseline_step_fn,
)
from style_seqcvae_tpu.models.captioner import CaptionerConfig
from style_seqcvae_tpu.ops.lstm import from_torch_lstm_cell

B, N, F, E, H, P, V = 2, 5, 10, 8, 7, 6, 30
CFG = CaptionerConfig(vocab_size=V, image_feature_size=F, embedding_size=E,
                      hidden_size=H, attention_projection_size=P,
                      max_caption_length=6)


def test_baseline_cell_matches_torch_wiring():
    torch.manual_seed(0)
    attn_lstm = torch.nn.LSTMCell(E + F + 2 * H, H)
    lang_lstm = torch.nn.LSTMCell(F + 2 * H, H)
    wq = torch.nn.Linear(H, P, bias=False)
    wv = torch.nn.Linear(F, P, bias=False)
    wa = torch.nn.Linear(P, 1, bias=False)

    rng = np.random.RandomState(0)
    feats = rng.randn(B, N, F).astype(np.float32)
    feats[:, -1] = 0.0
    tok = rng.randn(B, E).astype(np.float32)

    tf = torch.from_numpy(feats)
    mask_t = (tf.abs().sum(-1) > 0).float()
    avg_t = (tf * mask_t.unsqueeze(-1)).sum(1) / mask_t.sum(1, keepdim=True)
    h1 = torch.zeros(B, H)
    h2 = torch.zeros(B, H)
    h1_t, c1_t = attn_lstm(torch.cat([torch.from_numpy(tok), avg_t, h1, h2], 1),
                           (h1, torch.zeros(B, H)))
    logits = wa(torch.tanh(wq(h1_t).unsqueeze(1) + wv(tf))).squeeze(-1)
    probs = torch.softmax(logits.masked_fill(mask_t == 0, -1e30), -1) * mask_t
    att_t = (probs.unsqueeze(-1) * tf).sum(1)
    h2_t, c2_t = lang_lstm(torch.cat([att_t, h1_t, h2], 1),
                           (h2, torch.zeros(B, H)))

    params = init_baseline(jax.random.PRNGKey(0), CFG)
    cell = params["cell"]._replace(
        attention_lstm=from_torch_lstm_cell(
            attn_lstm.weight_ih.detach().numpy(), attn_lstm.weight_hh.detach().numpy(),
            attn_lstm.bias_ih.detach().numpy(), attn_lstm.bias_hh.detach().numpy()),
        language_lstm=from_torch_lstm_cell(
            lang_lstm.weight_ih.detach().numpy(), lang_lstm.weight_hh.detach().numpy(),
            lang_lstm.bias_ih.detach().numpy(), lang_lstm.bias_hh.detach().numpy()),
        attention=params["cell"].attention._replace(
            w_query=jnp.asarray(wq.weight.detach().numpy().T),
            w_image=jnp.asarray(wv.weight.detach().numpy().T),
            w_attend=jnp.asarray(wa.weight.detach().numpy()[0])))

    from style_seqcvae_tpu.models.attention import project_image_features
    from style_seqcvae_tpu.models.updown_cell import image_feature_stats

    avg_j, mask_j = image_feature_stats(jnp.asarray(feats))
    proj_j = project_image_features(cell.attention, jnp.asarray(feats))
    h2_j, state_j = baseline_cell_step(
        cell, jnp.asarray(tok), init_baseline_state((B,), H),
        image_features=jnp.asarray(feats), projected_image_features=proj_j,
        averaged_image_features=avg_j, image_features_mask=mask_j)

    np.testing.assert_allclose(np.asarray(state_j.h1), h1_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h2_j), h2_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(state_j.c2), c2_t.detach().numpy(), atol=2e-5)


def test_baseline_train_and_greedy_decode():
    rng = np.random.RandomState(1)
    params = init_baseline(jax.random.PRNGKey(0), CFG)
    batch = {
        "image_features": jnp.asarray(rng.randn(B, N, F).astype(np.float32)),
        "caption_tokens": jnp.asarray(rng.randint(2, V, (B, 5)).astype(np.int32)),
    }
    out = baseline_train_forward(params, CFG, batch)
    assert out["loss"].shape == (B,)
    assert np.all(np.isfinite(np.asarray(out["loss"])))

    grads = jax.grad(lambda p: baseline_train_forward(p, CFG, batch)["loss"].mean())(params)
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))

    step = make_baseline_step_fn(params, CFG, batch["image_features"])
    toks = greedy_decode(step, jnp.full((B,), CFG.boundary_index),
                         init_baseline_state((B,), H), jax.random.PRNGKey(1),
                         max_steps=6, end_index=CFG.boundary_index)
    assert toks.shape == (B, 6)
    seqs, lp = beam_search(step, jnp.full((B,), CFG.boundary_index),
                           init_baseline_state((B,), H), jax.random.PRNGKey(1),
                           max_steps=6, beam_size=3, end_index=CFG.boundary_index)
    assert seqs.shape == (B, 3, 6)
    # beam search is deterministic for the baseline (no z): rerun identical
    seqs2, _ = beam_search(step, jnp.full((B,), CFG.boundary_index),
                           init_baseline_state((B,), H), jax.random.PRNGKey(99),
                           max_steps=6, beam_size=3, end_index=CFG.boundary_index)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(seqs2))


def test_baseline_train_step_converges():
    """make_baseline_train_step drives loss down with the shared SGD chain
    (updown-baseline/scripts/train.py:118-146 loop semantics: CE only,
    kld metric pinned at 0)."""
    from style_seqcvae_tpu.config import Config
    from style_seqcvae_tpu.training.trainer import (
        create_train_state, make_baseline_train_step)

    rng = np.random.RandomState(2)
    params = init_baseline(jax.random.PRNGKey(3), CFG)
    config = Config(config_override=[
        "OPTIM.LR", "0.1", "OPTIM.NUM_ITERATIONS", "200",
        "OPTIM.CLIP_GRADIENTS", "12.5"])
    state, tx = create_train_state(params, config, CFG, jax.random.PRNGKey(4))
    step = make_baseline_train_step(tx, CFG)
    batch = {
        "image_features": jnp.asarray(rng.randn(B, N, F).astype(np.float32)),
        "caption_tokens": jnp.asarray(rng.randint(2, V, (B, 5)).astype(np.int32)),
    }
    state, m0 = step(state, batch)
    for _ in range(30):
        state, m = step(state, batch)
    assert float(m["kld_loss"]) == 0.0
    assert float(m["loss"]) < 0.5 * float(m0["loss"])
    assert int(state.step) == 31


def test_baseline_harness_cbs_and_beam():
    """DecodeHarness(family="baseline"): CBS decode satisfies constraints
    and is fully deterministic (no z — different keys, same captions)."""
    from style_seqcvae_tpu.data.vocabulary import (
        BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary)
    from style_seqcvae_tpu.decoding.fsm import FiniteStateMachineBuilder
    from style_seqcvae_tpu.decoding.harness import DecodeHarness, detokenize

    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog", "cat", "runs",
                        "sits", "red", "blue", "park"])
    cfg = CaptionerConfig(vocab_size=vocab.get_vocab_size(),
                          image_feature_size=F, embedding_size=E,
                          hidden_size=H, attention_projection_size=P,
                          max_caption_length=7, beam_size=4)
    params = init_baseline(jax.random.PRNGKey(5), cfg)
    feats = jnp.asarray(np.random.RandomState(6).randn(1, N, F).astype(np.float32))

    builder = FiniteStateMachineBuilder(vocab, max_given_constraints=2,
                                        max_words_per_constraint=1)
    builder.add_wordforms("dog", ["dog"])
    builder.add_wordforms("red", ["red"])
    tables, _, _ = builder.build_tables(["dog", "red"])
    harness = DecodeHarness(params, cfg, family="baseline")

    best1, _ = harness.decode_cbs(feats, None, None, [tables],
                                  np.asarray([2]), jax.random.PRNGKey(1), n_z=1)
    best2, _ = harness.decode_cbs(feats, None, None, [tables],
                                  np.asarray([2]), jax.random.PRNGKey(99), n_z=1)
    np.testing.assert_array_equal(np.asarray(best1), np.asarray(best2))
    cap = detokenize(best1[0, 0], vocab, cfg.boundary_index)
    assert "dog" in cap and "red" in cap, cap

    toks1, _ = harness.decode_beam(feats, None, None, jax.random.PRNGKey(2), n_z=1)
    toks2, _ = harness.decode_beam(feats, None, None, jax.random.PRNGKey(3), n_z=1)
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))


def test_harness_batched_cbs_matches_per_image():
    """decode_cbs with per-image FSM lists (B>1) must reproduce the
    single-image decodes exactly for a deterministic model."""
    from style_seqcvae_tpu.data.vocabulary import (
        BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary)
    from style_seqcvae_tpu.decoding.fsm import FiniteStateMachineBuilder
    from style_seqcvae_tpu.decoding.harness import DecodeHarness

    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog", "cat", "runs",
                        "sits", "red", "blue", "park"])
    cfg = CaptionerConfig(vocab_size=vocab.get_vocab_size(),
                          image_feature_size=F, embedding_size=E,
                          hidden_size=H, attention_projection_size=P,
                          max_caption_length=7, beam_size=4)
    params = init_baseline(jax.random.PRNGKey(8), cfg)
    feats = np.random.RandomState(9).randn(3, N, F).astype(np.float32)

    builder = FiniteStateMachineBuilder(vocab, max_given_constraints=2,
                                        max_words_per_constraint=1)
    for w in ("dog", "cat", "red", "blue"):
        builder.add_wordforms(w, [w])
    per_image = [[builder.build_tables(["dog", "red"])[0]],
                 [builder.build_tables(["cat"])[0]],
                 [builder.build_tables(["blue", "cat"])[0]]]
    ncs = np.asarray([2, 1, 2])

    harness = DecodeHarness(params, cfg, family="baseline")
    batched, _ = harness.decode_cbs(feats, None, None, per_image, ncs,
                                    jax.random.PRNGKey(1), n_z=1)
    for b in range(3):
        single, _ = harness.decode_cbs(feats[b:b + 1], None, None,
                                       per_image[b], ncs[b:b + 1],
                                       jax.random.PRNGKey(1), n_z=1)
        np.testing.assert_array_equal(np.asarray(batched[:, b]),
                                      np.asarray(single[:, 0]))
