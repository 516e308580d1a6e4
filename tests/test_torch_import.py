"""Weight-importer tests: build torch modules with the reference's module
names, import their state dict, and verify forward parity."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from style_seqcvae_tpu.models.captioner import CaptionerConfig, init_captioner, train_forward
from style_seqcvae_tpu.utils.torch_import import (
    import_captioner_state_dict,
    import_resnet_state_dict,
    load_torch_checkpoint,
)

F, E, H, P, Z, V = 10, 8, 7, 5, 4, 30


def build_reference_named_state_dict(cond=1):
    """State dict with var_updown module names (sentiment_vae=1 widths)."""
    torch.manual_seed(0)
    mods = {
        "_embedding_layer": torch.nn.Embedding(V, E),
        "_updown_cell._attention_lstm_cell": torch.nn.LSTMCell(E + F + 2 * H, H),
        "_updown_cell._language_lstm_cell_encoder": torch.nn.LSTMCell(cond + F + 2 * H, H),
        "_updown_cell._language_lstm_cell_decoder": torch.nn.LSTMCell(cond + F + 2 * H + Z, H),
        "_updown_cell._butd_attention._query_vector_projection_layer":
            torch.nn.Linear(H, P, bias=False),
        "_updown_cell._butd_attention._image_features_projection_layer":
            torch.nn.Linear(F, P, bias=False),
        "_updown_cell._butd_attention._attention_layer": torch.nn.Linear(P, 1, bias=False),
        "_updown_cell.fc_mean": torch.nn.Linear(H, Z),
        "_updown_cell.fc_log_var": torch.nn.Linear(H, Z),
        "_output_projection.0": torch.nn.Linear(H, E),
    }
    sd = {}
    for prefix, mod in mods.items():
        for name, val in mod.state_dict().items():
            sd[f"{prefix}.{name}"] = val
    return sd, mods


def test_captioner_import_forward_parity():
    sd, mods = build_reference_named_state_dict()
    cfg = CaptionerConfig(vocab_size=V, image_feature_size=F, embedding_size=E,
                          hidden_size=H, attention_projection_size=P, z_space=Z,
                          sentiment_vae=1, simple_vae=False, max_caption_length=5)
    # tie_embeddings is False for E=8 → but reference tied head exists; force
    # the output_projection branch by building params with a tied-style cfg.
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    # manually attach output_projection structure for import parity
    params["output_projection"] = {"w": jnp.zeros((H, E)), "b": jnp.zeros((E,))}
    params.pop("output_layer", None)
    params = import_captioner_state_dict(sd, params)

    np.testing.assert_allclose(
        np.asarray(params["embedding"]),
        mods["_embedding_layer"].weight.detach().numpy())
    np.testing.assert_allclose(
        np.asarray(params["cell"].fc_mean_w),
        mods["_updown_cell.fc_mean"].weight.detach().numpy().T)

    # deterministic parts of a training step vs the torch replica wiring
    rng = np.random.RandomState(0)
    feats = rng.randn(2, 6, F).astype(np.float32)
    tok = rng.randn(2, E).astype(np.float32)
    from style_seqcvae_tpu.models.attention import project_image_features
    from style_seqcvae_tpu.models.updown_cell import (
        cell_step, image_feature_stats, init_cell_state)

    avg, mask = image_feature_stats(jnp.asarray(feats))
    proj = project_image_features(params["cell"].attention, jnp.asarray(feats))
    _, state, qm, qlv, _, alpha = cell_step(
        params["cell"], jnp.asarray(tok), init_cell_state((2,), H),
        image_features=jnp.asarray(feats), projected_image_features=proj,
        averaged_image_features=avg, image_features_mask=mask,
        training=True, rng=jax.random.PRNGKey(0), sentiment_vae=1,
        simple_vae=False, latent_embedding="glove",
        sentiment=jnp.ones((2, 1)), prior_mean=jnp.zeros((2, Z)),
        prior_var=jnp.ones((2, Z)))

    # torch forward with the same modules
    tf = torch.from_numpy(feats)
    m = (tf.abs().sum(-1) > 0).float()
    avg_t = (tf * m.unsqueeze(-1)).sum(1) / m.sum(1, keepdim=True)
    h0 = torch.zeros(2, H)
    h1_t, _ = mods["_updown_cell._attention_lstm_cell"](
        torch.cat([torch.from_numpy(tok), avg_t, h0, h0], 1), (h0, h0))
    wq = mods["_updown_cell._butd_attention._query_vector_projection_layer"]
    wv = mods["_updown_cell._butd_attention._image_features_projection_layer"]
    wa = mods["_updown_cell._butd_attention._attention_layer"]
    logits = wa(torch.tanh(wq(h1_t).unsqueeze(1) + wv(tf))).squeeze(-1)
    alpha_t = torch.softmax(logits, -1)
    att_t = (alpha_t.unsqueeze(-1) * tf).sum(1)
    he_t, _ = mods["_updown_cell._language_lstm_cell_encoder"](
        torch.cat([att_t, h1_t, h0, torch.ones(2, 1)], 1), (h0, h0))
    qm_t = mods["_updown_cell.fc_mean"](he_t)

    np.testing.assert_allclose(np.asarray(state.h1), h1_t.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qm), qm_t.detach().numpy(), atol=2e-5)


def test_resnet_import_parity():
    """Import a torchvision-style resnet18-shaped (use 50 here) state dict
    and check a BN+conv output against torch."""
    torch.manual_seed(1)
    conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
    bn1 = torch.nn.BatchNorm2d(64).eval()
    bn1.running_mean.normal_()
    bn1.running_var.uniform_(0.5, 2.0)
    sd = {"conv1.weight": conv1.weight, **{f"bn1.{k}": v for k, v in bn1.state_dict().items()}}
    # minimal blocks for depth-50 structure
    import torch.nn as nn

    for li, (n, planes, in_ch) in enumerate(
            zip((3, 4, 6, 3), (64, 128, 256, 512), (64, 256, 512, 1024)), start=1):
        ch = in_ch
        for bi in range(n):
            pfx = f"layer{li}.{bi}"
            sd[f"{pfx}.conv1.weight"] = torch.randn(planes, ch, 1, 1) * 0.01
            sd[f"{pfx}.conv2.weight"] = torch.randn(planes, planes, 3, 3) * 0.01
            sd[f"{pfx}.conv3.weight"] = torch.randn(planes * 4, planes, 1, 1) * 0.01
            for b in (1, 2, 3):
                pl = planes * 4 if b == 3 else planes
                sd[f"{pfx}.bn{b}.weight"] = torch.ones(pl)
                sd[f"{pfx}.bn{b}.bias"] = torch.zeros(pl)
                sd[f"{pfx}.bn{b}.running_mean"] = torch.zeros(pl)
                sd[f"{pfx}.bn{b}.running_var"] = torch.ones(pl)
            if bi == 0:
                sd[f"{pfx}.downsample.0.weight"] = torch.randn(planes * 4, ch, 1, 1) * 0.01
                sd[f"{pfx}.downsample.1.weight"] = torch.ones(planes * 4)
                sd[f"{pfx}.downsample.1.bias"] = torch.zeros(planes * 4)
                sd[f"{pfx}.downsample.1.running_mean"] = torch.zeros(planes * 4)
                sd[f"{pfx}.downsample.1.running_var"] = torch.ones(planes * 4)
            ch = planes * 4

    params = import_resnet_state_dict(sd, depth=50)
    # conv1+bn1 parity on a small input
    x = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        want = bn1(conv1(x)).numpy()
    from style_seqcvae_tpu.models.detector.resnet import _bn, _conv

    got = _bn(_conv(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    params["conv1"], stride=2, padding=[(3, 3), (3, 3)]),
              params["bn1"])
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-4)


def test_load_checkpoint_strips_dataparallel(tmp_path):
    sd = {"module._embedding_layer.weight": torch.randn(3, 4),
          "module.some.weight": torch.randn(2)}
    path = tmp_path / "ck.pth"
    torch.save({"model": sd}, str(path))
    loaded = load_torch_checkpoint(str(path))
    assert set(loaded) == {"_embedding_layer.weight", "some.weight"}
