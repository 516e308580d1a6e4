"""Full-dims TRAINING-step parity against a torch reference replica.

The decode side carries token-identical full-dims evidence
(test_fulldims_parity.py); this file gives the train path the same
treatment (VERDICT r3 next #8): a torch module with the reference's
training wiring — encoder-LSTM posterior q(z|·), per-step reparameterized
z, two-Gaussian KL, length-scaled masked sequence CE
(var_updown/var_updown/models/updown_captioner.py:263-323,
modules/updown_cell.py:86-231) — is built at the REAL run shape
(E=600, H=900, P=768, z=150, V=10k, N=36, T=20, mode-1 sentiment prior),
its state_dict imports through the production ``import_captioner_state_dict``
path, and BOTH sides run one teacher-forced training forward + backward on
the same batch with the SAME precomputed z-noise (``train_forward`` accepts
a (T, B, z) eps stack) — so the comparison is deterministic, not
statistical: per-sequence loss/kld, the total objective
(mean loss + mean kld / KLD_WEIGHT), and per-parameter-group gradient
norms must all agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow  # full-dims fwd+bwd compile, multi-minute

from style_seqcvae_tpu.models.captioner import (
    CaptionerConfig, init_captioner, train_forward)
from style_seqcvae_tpu.utils.torch_import import import_captioner_state_dict

V, B, N = 10000, 3, 36
E, H, P, Z, F = 600, 900, 768, 150, 2048
T = 20
KLD_WEIGHT = 750.0

CFG = CaptionerConfig(vocab_size=V, image_feature_size=F, embedding_size=E,
                      hidden_size=H, attention_projection_size=P, z_space=Z,
                      sentiment_vae=1, simple_vae=False, max_caption_length=T)


class TorchTrainCaptioner(torch.nn.Module):
    """Reference training wiring AND reference state_dict names
    (updown_captioner.py / updown_cell.py) so the production importer maps
    it without aliases. Mode 1: scalar sentiment condition, prior
    N(sentiment·1, prior_std²), senti_prior_multip = prior_std = 1."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(11)
        self._embedding_layer = torch.nn.Embedding(V, E)
        cell = torch.nn.Module()
        cell._attention_lstm_cell = torch.nn.LSTMCell(E + F + 2 * H, H)
        cell._language_lstm_cell_encoder = torch.nn.LSTMCell(1 + F + 2 * H, H)
        cell._language_lstm_cell_decoder = torch.nn.LSTMCell(1 + F + 2 * H + Z, H)
        butd = torch.nn.Module()
        butd._query_vector_projection_layer = torch.nn.Linear(H, P, bias=False)
        butd._image_features_projection_layer = torch.nn.Linear(F, P, bias=False)
        butd._attention_layer = torch.nn.Linear(P, 1, bias=False)
        cell._butd_attention = butd
        cell.fc_mean = torch.nn.Linear(H, Z)
        cell.fc_log_var = torch.nn.Linear(H, Z)
        self._updown_cell = cell
        self._output_projection = torch.nn.Sequential(torch.nn.Linear(H, E))

    def forward(self, feats, tokens_bounded, sentiment, eps):
        """Teacher-forced training forward (updown_captioner.py:263-323).
        feats (B, N, F) with zero rows = padding boxes; tokens_bounded
        (B, T+2) with @@BOUNDARY@@ added; eps (T+1, B, Z) per-step noise.
        Returns (per-seq loss, per-seq kld)."""
        b = feats.shape[0]
        mask = (feats.abs().sum(-1) > 0).float()                   # (B, N)
        avg = (feats * mask.unsqueeze(-1)).sum(1) / mask.sum(1, keepdim=True)
        proj_v = self._updown_cell._butd_attention.\
            _image_features_projection_layer(feats)                # (B, N, P)

        prior_mean = sentiment.expand(b, Z)                        # multip=1
        prior_log_var = torch.zeros(b, Z)                          # std=1

        h1 = c1 = he = ce = hd = cd = feats.new_zeros((b, H))
        num_steps = tokens_bounded.shape[1] - 1
        step_lp, step_kld = [], []
        for t in range(num_steps):
            e = self._embedding_layer(tokens_bounded[:, t])
            h1, c1 = self._updown_cell._attention_lstm_cell(
                torch.cat([e, avg, h1, hd], 1), (h1, c1))
            butd = self._updown_cell._butd_attention
            logits_a = butd._attention_layer(torch.tanh(
                butd._query_vector_projection_layer(h1).unsqueeze(1)
                + proj_v)).squeeze(-1)
            # masked softmax + renormalize (AllenNLP masked_softmax)
            alpha = torch.softmax(logits_a.masked_fill(mask == 0, -1e30), -1)
            alpha = alpha * mask
            att = (alpha.unsqueeze(-1) * feats).sum(1)

            he, ce = self._updown_cell._language_lstm_cell_encoder(
                torch.cat([att, h1, hd, sentiment], 1), (he, ce))
            q_mean = self._updown_cell.fc_mean(he)
            q_log_var = self._updown_cell.fc_log_var(he)
            z = eps[t] * torch.exp(0.5 * q_log_var) + q_mean
            hd, cd = self._updown_cell._language_lstm_cell_decoder(
                torch.cat([att, h1, hd, sentiment, z], 1), (hd, cd))
            logits = (torch.tanh(self._output_projection(hd))
                      @ self._embedding_layer.weight.T)
            step_lp.append(torch.log_softmax(logits, -1))
            # two-Gaussian KL (updown_captioner.py:301-303)
            pv = torch.exp(prior_log_var)
            kld_t = -0.5 * torch.sum(
                1 + q_log_var - prior_log_var
                - ((q_mean - prior_mean) ** 2 + torch.exp(q_log_var))
                / (pv + 1e-5), dim=-1)
            step_kld.append(kld_t)

        log_probs = torch.stack(step_lp, 1)                        # (B, T+1, V)
        targets = tokens_bounded[:, 1:]
        tmask = (targets != 0).float()
        nll = -log_probs.gather(-1, targets.unsqueeze(-1)).squeeze(-1)
        lengths = tmask.sum(1)
        # length-scaled masked sequence CE (sequence_cross_entropy_with_
        # logits(average=None) × lengths, updown_captioner.py:457-466)
        loss = lengths * (nll * tmask).sum(1) / (lengths + 1e-13)
        kld = (torch.stack(step_kld, 1) * tmask).sum(1)
        return loss, kld


def _group_grad_norms_torch(model):
    g = {n: p.grad.detach() for n, p in model.named_parameters()}

    def lstm(prefix):
        w = float(torch.sqrt(g[f"{prefix}.weight_ih"].pow(2).sum()
                             + g[f"{prefix}.weight_hh"].pow(2).sum()))
        return w, float(g[f"{prefix}.bias_ih"].norm())

    out = {}
    out["embedding"] = float(g["_embedding_layer.weight"].norm())
    for name, prefix in (
            ("attention_lstm", "_updown_cell._attention_lstm_cell"),
            ("encoder_lstm", "_updown_cell._language_lstm_cell_encoder"),
            ("decoder_lstm", "_updown_cell._language_lstm_cell_decoder")):
        out[f"{name}.w"], out[f"{name}.b"] = lstm(prefix)
    out["w_query"] = float(
        g["_updown_cell._butd_attention._query_vector_projection_layer.weight"].norm())
    out["w_image"] = float(
        g["_updown_cell._butd_attention._image_features_projection_layer.weight"].norm())
    out["w_attend"] = float(
        g["_updown_cell._butd_attention._attention_layer.weight"].norm())
    out["fc_mean_w"] = float(g["_updown_cell.fc_mean.weight"].norm())
    out["fc_mean_b"] = float(g["_updown_cell.fc_mean.bias"].norm())
    out["fc_log_var_w"] = float(g["_updown_cell.fc_log_var.weight"].norm())
    out["fc_log_var_b"] = float(g["_updown_cell.fc_log_var.bias"].norm())
    out["output_projection.w"] = float(g["_output_projection.0.weight"].norm())
    out["output_projection.b"] = float(g["_output_projection.0.bias"].norm())
    return out


def _group_grad_norms_jax(grads):
    cell = grads["cell"]

    def norm(x):
        return float(jnp.sqrt(jnp.sum(jnp.square(x))))

    out = {"embedding": norm(grads["embedding"])}
    for name in ("attention_lstm", "encoder_lstm", "decoder_lstm"):
        lstm = getattr(cell, name)
        out[f"{name}.w"] = norm(lstm.w)
        out[f"{name}.b"] = norm(lstm.b)
    out["w_query"] = norm(cell.attention.w_query)
    out["w_image"] = norm(cell.attention.w_image)
    out["w_attend"] = norm(cell.attention.w_attend)
    for name in ("fc_mean_w", "fc_mean_b", "fc_log_var_w", "fc_log_var_b"):
        out[name] = norm(getattr(cell, name))
    out["output_projection.w"] = norm(grads["output_projection"]["w"])
    out["output_projection.b"] = norm(grads["output_projection"]["b"])
    return out


def test_fulldims_train_step_loss_kld_and_grad_parity():
    rng = np.random.RandomState(0)
    feats = rng.randn(B, N, F).astype(np.float32)
    feats[0, N - 4:] = 0.0                      # padding boxes on image 0
    tokens = rng.randint(2, V, (B, T)).astype(np.int32)
    tokens[1, 14:] = 0                          # ragged caption lengths
    tokens[2, 9:] = 0
    sentiment = rng.choice([-1.0, 1.0], (B, 1)).astype(np.float32)
    eps = rng.randn(T + 1, B, Z).astype(np.float32)

    model = TorchTrainCaptioner()

    # ---- torch forward + backward ----
    feats_t = torch.from_numpy(feats)
    sent_t = torch.from_numpy(sentiment)
    # boundary framing (AllenNLP add_sentence_boundary_token_ids)
    bounded = np.zeros((B, T + 2), np.int64)
    for i in range(B):
        row = tokens[i][tokens[i] != 0]
        bounded[i, 0] = 1
        bounded[i, 1:1 + len(row)] = row
        bounded[i, 1 + len(row)] = 1
    loss_t, kld_t = model(feats_t, torch.from_numpy(bounded), sent_t,
                          torch.from_numpy(eps))
    total_t = loss_t.mean() + kld_t.mean() / KLD_WEIGHT
    total_t.backward()
    torch_norms = _group_grad_norms_torch(model)

    # ---- jax: imported params, same batch, same eps ----
    params = init_captioner(jax.random.PRNGKey(0), CFG)
    params = import_captioner_state_dict(model.state_dict(), params)
    batch = {"image_features": jnp.asarray(feats),
             "caption_tokens": jnp.asarray(tokens),
             "sentiment": jnp.asarray(sentiment)}

    def loss_fn(p):
        out = train_forward(p, CFG, batch, jax.random.PRNGKey(0),
                            eps=jnp.asarray(eps))
        return (jnp.mean(out["loss"]) + jnp.mean(out["kld"]) / KLD_WEIGHT,
                out)

    (total_j, out_j), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))(params)

    # per-sequence loss and kld, and the total objective
    np.testing.assert_allclose(np.asarray(out_j["loss"]),
                               loss_t.detach().numpy(), rtol=5e-4)
    np.testing.assert_allclose(np.asarray(out_j["kld"]),
                               kld_t.detach().numpy(), rtol=5e-4)
    np.testing.assert_allclose(float(total_j), float(total_t.detach()),
                               rtol=5e-4)

    # per-parameter-group gradient norms
    jax_norms = _group_grad_norms_jax(grads)
    assert set(jax_norms) == set(torch_norms)
    for k in sorted(torch_norms):
        np.testing.assert_allclose(
            jax_norms[k], torch_norms[k], rtol=2e-3,
            err_msg=f"gradient-norm mismatch for {k}")
