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


def _make_resnet50_sd():
    """Random torchvision-style depth-50 state dict (shared by the conv1
    smoke and the full-backbone golden test)."""
    torch.manual_seed(1)
    conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
    bn1 = torch.nn.BatchNorm2d(64).eval()
    bn1.running_mean.normal_()
    bn1.running_var.uniform_(0.5, 2.0)
    sd = {"conv1.weight": conv1.weight, **{f"bn1.{k}": v for k, v in bn1.state_dict().items()}}
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
                sd[f"{pfx}.bn{b}.weight"] = torch.rand(pl) * 0.5 + 0.75
                sd[f"{pfx}.bn{b}.bias"] = torch.randn(pl) * 0.05
                sd[f"{pfx}.bn{b}.running_mean"] = torch.randn(pl) * 0.05
                sd[f"{pfx}.bn{b}.running_var"] = torch.rand(pl) * 0.5 + 0.75
            if bi == 0:
                sd[f"{pfx}.downsample.0.weight"] = torch.randn(planes * 4, ch, 1, 1) * 0.01
                sd[f"{pfx}.downsample.1.weight"] = torch.rand(planes * 4) * 0.5 + 0.75
                sd[f"{pfx}.downsample.1.bias"] = torch.randn(planes * 4) * 0.05
                sd[f"{pfx}.downsample.1.running_mean"] = torch.randn(planes * 4) * 0.05
                sd[f"{pfx}.downsample.1.running_var"] = torch.rand(planes * 4) * 0.5 + 0.75
            ch = planes * 4
    return sd, conv1, bn1


class _RefBottleneck(torch.nn.Module):
    """Torch replica of the reference's caffe-style Bottleneck: STRIDE ON
    CONV1 (1x1), conv2 (3x3) stride 1 (frcnn resnet.py:71-74 "# change")."""

    def __init__(self, in_ch, planes, stride):
        super().__init__()
        import torch.nn as nn

        self.conv1 = nn.Conv2d(in_ch, planes, 1, stride, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or in_ch != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, planes * 4, 1, stride, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        return torch.relu(self.bn3(self.conv3(out)) + r)


class _RefResNet50(torch.nn.Module):
    """Reference-semantics depth-50 trunk: ceil_mode pad-0 stem pool
    (frcnn resnet.py:113 "# change") + caffe-stride bottlenecks; exposes
    the C4 (layer3) output and the layer4+GAP head (resnet.py:292-294)."""

    def __init__(self):
        super().__init__()
        import torch.nn as nn

        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, padding=0, ceil_mode=True)
        layers = []
        ch = 64
        for n, planes, stride in zip((3, 4, 6, 3), (64, 128, 256, 512),
                                     (1, 2, 2, 2)):
            blocks = [_RefBottleneck(ch, planes, stride)]
            ch = planes * 4
            blocks += [_RefBottleneck(ch, planes, 1) for _ in range(n - 1)]
            layers.append(nn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def c4(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        return self.layer3(self.layer2(self.layer1(x)))

    def head(self, pooled):
        return self.layer4(pooled).mean(dim=(2, 3))


def test_resnet_import_parity():
    """conv1+bn1 parity on a small input (importer mapping smoke)."""
    sd, conv1, bn1 = _make_resnet50_sd()
    params = import_resnet_state_dict(sd, depth=50)
    x = torch.randn(1, 3, 16, 16)
    with torch.no_grad():
        want = bn1(conv1(x)).numpy()
    from style_seqcvae_tpu.models.detector.resnet import _bn, _conv

    got = _bn(_conv(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                    params["conv1"], stride=2, padding=[(3, 3), (3, 3)]),
              params["bn1"])
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-4)


def test_resnet_backbone_full_golden_vs_reference_semantics():
    """Full-trunk golden: our backbone()/head_to_tail() must match a torch
    replica of the REFERENCE's modified ResNet (caffe stride-on-conv1
    bottlenecks, ceil_mode pad-0 stem pool — frcnn resnet.py:66-113
    "# change" blocks) on the same imported weights. Odd spatial sizes
    exercise the ceil_mode shape path (37 -> pool 9 vs floor-pad1 10)."""
    sd, _, _ = _make_resnet50_sd()
    params = import_resnet_state_dict(sd, depth=50)

    ref = _RefResNet50().eval()
    ref.load_state_dict({k: v for k, v in sd.items()}, strict=True)

    from style_seqcvae_tpu.models.detector.resnet import backbone, head_to_tail

    torch.manual_seed(3)
    for H, W in ((64, 96), (75, 83)):  # even and odd
        x = torch.randn(1, 3, H, W)
        with torch.no_grad():
            want_c4 = ref.c4(x).numpy()
        got_c4 = np.asarray(backbone(params, jnp.asarray(
            x.numpy().transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
        assert got_c4.shape == want_c4.shape, (got_c4.shape, want_c4.shape)
        np.testing.assert_allclose(got_c4, want_c4, atol=2e-4)

    pooled = torch.randn(3, 1024, 7, 7)
    with torch.no_grad():
        want_head = ref.head(pooled).numpy()
    got_head = np.asarray(head_to_tail(
        params, jnp.asarray(pooled.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got_head, want_head, atol=2e-4)


def test_load_checkpoint_strips_dataparallel(tmp_path):
    sd = {"module._embedding_layer.weight": torch.randn(3, 4),
          "module.some.weight": torch.randn(2)}
    path = tmp_path / "ck.pth"
    torch.save({"model": sd}, str(path))
    loaded = load_torch_checkpoint(str(path))
    assert set(loaded) == {"_embedding_layer.weight", "some.weight"}
