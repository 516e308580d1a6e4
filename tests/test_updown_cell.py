"""Golden parity of the variational UpDown cell against a PyTorch composition
wired exactly like the reference (var_updown/var_updown/modules/
updown_cell.py:86-231): attention LSTM → BUTD attention → per-mode prior /
posterior heads. The stochastic tail (reparameterize + decoder LSTM) is
covered by the LSTM parity test; here we verify everything deterministic
(h1, attention weights, attended features, q_mean, q_log_var, prior_mean)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from style_seqcvae_tpu.models.updown_cell import (
    cell_step,
    condition_size,
    image_feature_stats,
    init_cell,
    init_cell_state,
)
from style_seqcvae_tpu.models.attention import project_image_features
from style_seqcvae_tpu.ops.lstm import from_torch_lstm_cell

B, N, F, E, H, P, Z = 3, 6, 10, 8, 7, 5, 4


def torch_masked_softmax(logits, mask):
    probs = torch.softmax(logits.masked_fill(mask == 0, -1e30), dim=-1)
    return probs * mask


def build_torch_side(sentiment_vae, simple_vae, latent_embedding, seed=0):
    torch.manual_seed(seed)
    cond = condition_size(sentiment_vae, simple_vae, latent_embedding, Z)
    attn_lstm = torch.nn.LSTMCell(E + F + 2 * H, H)
    enc_lstm = torch.nn.LSTMCell(cond + F + 2 * H, H)
    wq = torch.nn.Linear(H, P, bias=False)
    wv = torch.nn.Linear(F, P, bias=False)
    wa = torch.nn.Linear(P, 1, bias=False)
    fc_mean = torch.nn.Linear(H, Z)
    fc_log_var = torch.nn.Linear(H, Z)
    return attn_lstm, enc_lstm, wq, wv, wa, fc_mean, fc_log_var


def to_jax_params(torch_side, key, mode=0, simple=True, lat="glove"):
    """Build jax CellParams carrying the torch weights."""
    attn_lstm, enc_lstm, wq, wv, wa, fc_mean, fc_log_var = torch_side
    params = init_cell(key, F, E, H, P, Z, mode, simple, lat)

    def conv(cell):
        return from_torch_lstm_cell(
            cell.weight_ih.detach().numpy(), cell.weight_hh.detach().numpy(),
            cell.bias_ih.detach().numpy(), cell.bias_hh.detach().numpy())

    params = params._replace(
        attention_lstm=conv(attn_lstm),
        encoder_lstm=conv(enc_lstm),
        attention=params.attention._replace(
            w_query=jnp.asarray(wq.weight.detach().numpy().T),
            w_image=jnp.asarray(wv.weight.detach().numpy().T),
            w_attend=jnp.asarray(wa.weight.detach().numpy()[0]),
        ),
        fc_mean_w=jnp.asarray(fc_mean.weight.detach().numpy().T),
        fc_mean_b=jnp.asarray(fc_mean.bias.detach().numpy()),
        fc_log_var_w=jnp.asarray(fc_log_var.weight.detach().numpy().T),
        fc_log_var_b=jnp.asarray(fc_log_var.bias.detach().numpy()),
    )
    return params


@pytest.mark.parametrize("mode,simple,lat", [
    (0, True, "glove"),   # simple_vae
    (0, False, "glove"),  # standard-normal CVAE
    (1, False, "glove"),  # scalar sentiment prior
    (2, False, "glove"),  # attribute-embedding prior
])
def test_cell_step_matches_torch_reference_wiring(mode, simple, lat):
    rng = np.random.RandomState(42)
    feats = rng.randn(B, N, F).astype(np.float32)
    feats[:, N - 2:] = 0.0  # padding boxes → mask
    tok_emb = rng.randn(B, E).astype(np.float32)
    sentiment = rng.choice([-1.0, 1.0], (B, 1)).astype(np.float32)
    obj_atts = rng.randn(B, N, Z).astype(np.float32)
    h1 = rng.randn(B, H).astype(np.float32) * 0.1
    c1 = rng.randn(B, H).astype(np.float32) * 0.1
    hd = rng.randn(B, H).astype(np.float32) * 0.1
    prior_mean0 = (np.tile(sentiment, (1, Z)) if mode == 1 else np.zeros((B, Z))).astype(np.float32)
    prior_var0 = np.ones((B, Z), np.float32)

    torch_side = build_torch_side(mode, simple, lat)
    attn_lstm, enc_lstm, wq, wv, wa, fc_mean, fc_log_var = torch_side

    # ---- torch forward (reference wiring, updown_cell.py:123-198) ----
    tf = torch.from_numpy(feats)
    mask_t = (tf.abs().sum(-1) > 0).float()
    avg_t = (tf * mask_t.unsqueeze(-1)).sum(1) / mask_t.sum(1, keepdim=True)
    attn_in = torch.cat([torch.from_numpy(tok_emb), avg_t,
                         torch.from_numpy(h1), torch.from_numpy(hd)], dim=1)
    h1_t, c1_t = attn_lstm(attn_in, (torch.from_numpy(h1), torch.from_numpy(c1)))
    logits_t = wa(torch.tanh(wq(h1_t).unsqueeze(1) + wv(tf))).squeeze(-1)
    alpha_t = torch_masked_softmax(logits_t, mask_t)
    attended_t = (alpha_t.unsqueeze(-1) * tf).sum(1)

    if mode == 2:
        pm_t = (alpha_t.unsqueeze(-1) * torch.from_numpy(obj_atts)).sum(1)
    else:
        pm_t = torch.from_numpy(prior_mean0)
    if simple:
        pm_t = torch.zeros_like(pm_t)

    cond = condition_size(mode, simple, lat, Z)
    parts = [attended_t, h1_t, torch.from_numpy(hd)]
    if cond == 1 and mode == 1:
        parts.append(torch.from_numpy(sentiment))
    elif cond == Z:
        parts.append(pm_t)
    enc_in = torch.cat(parts, dim=1)
    he_t, _ = enc_lstm(enc_in, (torch.zeros(B, H), torch.zeros(B, H)))
    qm_t = fc_mean(he_t)
    qlv_t = fc_log_var(he_t)

    # ---- jax forward ----
    params = to_jax_params(torch_side, jax.random.PRNGKey(0), mode, simple, lat)
    state = init_cell_state((B,), H)._replace(
        h1=jnp.asarray(h1), c1=jnp.asarray(c1), h_dec=jnp.asarray(hd))
    avg_j, mask_j = image_feature_stats(jnp.asarray(feats))
    proj_j = project_image_features(params.attention, jnp.asarray(feats))
    _, new_state, qm_j, qlv_j, pm_j, alpha_j = cell_step(
        params, jnp.asarray(tok_emb), state,
        image_features=jnp.asarray(feats), projected_image_features=proj_j,
        averaged_image_features=avg_j, image_features_mask=mask_j,
        training=True, rng=jax.random.PRNGKey(1),
        sentiment_vae=mode, simple_vae=simple, latent_embedding=lat,
        sentiment=jnp.asarray(sentiment), obj_att_embeds=jnp.asarray(obj_atts),
        prior_mean=jnp.asarray(prior_mean0), prior_var=jnp.asarray(prior_var0))

    np.testing.assert_allclose(np.asarray(new_state.h1), h1_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha_j), alpha_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pm_j), pm_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qm_j), qm_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qlv_j), qlv_t.detach().numpy(), atol=2e-5)


def test_cell_step_grid_dims_consistent_with_flat():
    """A (B, S, K) grid step must equal the flattened (B*S*K,) step —
    validates the broadcasting redesign vs the reference's replication."""
    key = jax.random.PRNGKey(0)
    params = init_cell(key, F, E, H, P, Z, 0, True, "glove")
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, N, F))
    avg, mask = image_feature_stats(feats)
    proj = project_image_features(params.attention, feats)
    S, K = 2, 3
    tok = jax.random.normal(jax.random.PRNGKey(2), (B, S, K, E))
    state = init_cell_state((B, S, K), H)
    pm = jnp.zeros((B, Z))
    pv = jnp.ones((B, Z))

    out_grid, _, _, _, _, _ = cell_step(
        params, tok, state, image_features=feats, projected_image_features=proj,
        averaged_image_features=avg, image_features_mask=mask,
        training=False, rng=jax.random.PRNGKey(3), sentiment_vae=0,
        simple_vae=True, latent_embedding="glove",
        prior_mean=pm, prior_var=pv)

    # flatten grid: replicate features along batch (what the reference does)
    reps = S * K
    feats_f = jnp.repeat(feats, reps, axis=0)
    avg_f, mask_f = image_feature_stats(feats_f)
    proj_f = project_image_features(params.attention, feats_f)
    state_f = init_cell_state((B * reps,), H)
    out_flat, _, _, _, _, _ = cell_step(
        params, tok.reshape(B * reps, E), state_f, image_features=feats_f,
        projected_image_features=proj_f, averaged_image_features=avg_f,
        image_features_mask=mask_f, training=False, rng=jax.random.PRNGKey(3),
        sentiment_vae=0, simple_vae=True, latent_embedding="glove",
        prior_mean=jnp.repeat(pm, reps, axis=0), prior_var=jnp.repeat(pv, reps, axis=0))

    # Identical up to the z-noise: compare the deterministic state h1.
    # (z differs because rng folding differs per layout; h1 precedes z.)
    _, st_grid, *_ = cell_step(
        params, tok, state, image_features=feats, projected_image_features=proj,
        averaged_image_features=avg, image_features_mask=mask,
        training=False, rng=jax.random.PRNGKey(3), sentiment_vae=0,
        simple_vae=True, latent_embedding="glove", prior_mean=pm, prior_var=pv)
    _, st_flat, *_ = cell_step(
        params, tok.reshape(B * reps, E), state_f, image_features=feats_f,
        projected_image_features=proj_f, averaged_image_features=avg_f,
        image_features_mask=mask_f, training=False, rng=jax.random.PRNGKey(3),
        sentiment_vae=0, simple_vae=True, latent_embedding="glove",
        prior_mean=jnp.repeat(pm, reps, axis=0), prior_var=jnp.repeat(pv, reps, axis=0))
    np.testing.assert_allclose(
        np.asarray(st_grid.h1).reshape(B * reps, H), np.asarray(st_flat.h1), atol=1e-5)
