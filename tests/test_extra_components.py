"""Tests for VGG backbone, detection mAP evaluator, and stochastic samplers."""

import jax
import jax.numpy as jnp
import numpy as np

from style_seqcvae_tpu.evaluation.detection_eval import evaluate_detections
from style_seqcvae_tpu.models.detector import vgg


def test_vgg_backbone_shapes_and_head():
    params = vgg.init_vgg16(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32))
    feat = vgg.backbone(params, x)
    assert feat.shape == (1, 4, 4, 512)          # stride 16
    pooled = jnp.asarray(np.random.RandomState(1).randn(3, 7, 7, 512).astype(np.float32))
    out = vgg.head_to_tail(params, pooled)
    assert out.shape == (3, 4096)
    assert np.all(np.isfinite(np.asarray(out)))


def test_vgg_import_torch_parity():
    import torch

    tv = torch.nn.Sequential()  # build name-compatible state dict
    sd = {}
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
             (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
             (512, 512), (512, 512)]
    torch.manual_seed(0)
    for i, (ci, co) in zip(conv_idx, chans):
        sd[f"features.{i}.weight"] = torch.randn(co, ci, 3, 3) * 0.05
        sd[f"features.{i}.bias"] = torch.randn(co) * 0.05
    sd["classifier.0.weight"] = torch.randn(4096, 512 * 7 * 7) * 0.01
    sd["classifier.0.bias"] = torch.zeros(4096)
    sd["classifier.3.weight"] = torch.randn(4096, 4096) * 0.01
    sd["classifier.3.bias"] = torch.zeros(4096)

    params = vgg.import_vgg_state_dict(sd)
    x = np.random.RandomState(2).randn(1, 32, 32, 3).astype(np.float32)
    got = np.asarray(vgg.backbone(params, jnp.asarray(x)))
    # torch side
    import torch.nn.functional as F

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ci = 0
    for bi, (_, n) in enumerate(vgg._CFG):
        for _ in range(n):
            idx = conv_idx[ci]
            xt = F.relu(F.conv2d(xt, sd[f"features.{idx}.weight"],
                                 sd[f"features.{idx}.bias"], padding=1))
            ci += 1
        if bi < 4:
            xt = F.max_pool2d(xt, 2, 2)
    np.testing.assert_allclose(got, xt.detach().numpy().transpose(0, 2, 3, 1),
                               atol=1e-3)


def test_detection_eval_perfect_and_miss():
    gt = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20]},
          {"image_id": 1, "category_id": 2, "bbox": [50, 50, 10, 10]},
          {"image_id": 2, "category_id": 1, "bbox": [0, 0, 30, 30]}]
    # perfect detections
    dets = [{"image_id": g["image_id"], "category_id": g["category_id"],
             "bbox": g["bbox"], "score": 0.9} for g in gt]
    out = evaluate_detections(dets, gt, [1, 2])
    assert abs(out["mAP"] - 1.0) < 1e-6 and abs(out["AP50"] - 1.0) < 1e-6

    # one false positive with higher score than a hit → AP drops
    dets_fp = dets + [{"image_id": 2, "category_id": 1,
                       "bbox": [200, 200, 10, 10], "score": 0.95}]
    out2 = evaluate_detections(dets_fp, gt, [1, 2])
    assert out2["mAP"] < 1.0
    assert out2["AP_per_class"][2] == 1.0  # class 2 unaffected

    # slightly offset box: hits at IoU .5 but misses at .95
    dets_off = [{"image_id": 1, "category_id": 1, "bbox": [12, 12, 20, 20],
                 "score": 0.9}]
    gt_one = [gt[0]]
    out3 = evaluate_detections(dets_off, gt_one, [1])
    assert out3["AP50"] == 1.0 and out3["mAP"] < 1.0


def test_samplers():
    from style_seqcvae_tpu.decoding.samplers import (
        gumbel_beam_search, sample_decode)
    from style_seqcvae_tpu.models.captioner import (
        CaptionerConfig, init_captioner, make_decode_context, make_step_fn)
    from style_seqcvae_tpu.models.updown_cell import init_cell_state

    cfg = CaptionerConfig(vocab_size=25, image_feature_size=6, embedding_size=5,
                          hidden_size=4, attention_projection_size=3, z_space=2,
                          max_caption_length=6)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 6))
    ctx = make_decode_context(params, cfg, feats)
    step = make_step_fn(params, cfg, ctx)
    st = init_cell_state((2,), cfg.hidden_size)

    toks = sample_decode(step, jnp.full((2,), cfg.boundary_index), st,
                         jax.random.PRNGKey(2), max_steps=6,
                         end_index=cfg.boundary_index, top_k=5)
    assert toks.shape == (2, 6)
    toks_p = sample_decode(step, jnp.full((2,), cfg.boundary_index), st,
                           jax.random.PRNGKey(3), max_steps=6,
                           end_index=cfg.boundary_index, top_p=0.9,
                           temperature=0.8)
    assert toks_p.shape == (2, 6)
    # different keys → (almost surely) different samples
    toks2 = sample_decode(step, jnp.full((2,), cfg.boundary_index), st,
                          jax.random.PRNGKey(7), max_steps=6,
                          end_index=cfg.boundary_index, top_k=5)
    assert not np.array_equal(np.asarray(toks), np.asarray(toks2))

    seqs, phi = gumbel_beam_search(step, jnp.full((2,), cfg.boundary_index), st,
                                   jax.random.PRNGKey(4), max_steps=6,
                                   beam_size=3, end_index=cfg.boundary_index)
    assert seqs.shape == (2, 3, 6)
    # samples without replacement: beams distinct per batch element
    s = np.asarray(seqs)
    assert not np.array_equal(s[0, 0], s[0, 1]) or not np.array_equal(s[0, 1], s[0, 2])


def test_vis_detections_draws_boxes():
    """vis_detections (net_utils.py:50-60 analogue) draws outlines for
    above-threshold boxes, skips below-threshold ones, and leaves the
    input image untouched."""
    from style_seqcvae_tpu.utils.visualize import vis_detections

    img = np.zeros((64, 64, 3), np.uint8)
    dets = np.asarray([[8, 8, 40, 40, 0.9],
                       [50, 50, 60, 60, 0.1]], np.float32)
    out = vis_detections(img, "dog", dets, thresh=0.5)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert img.sum() == 0                       # input not mutated
    # outline of the high-score box is drawn...
    assert out[8:41, 8, :].sum() > 0 and out[40, 8:41, :].sum() > 0
    # ...and the low-score box's right edge area stays black
    assert out[55:60, 59, :].sum() == 0


def test_eval_detections_cli_vis_dir(tmp_path):
    """--vis-dir writes an annotated PNG per image in the detections."""
    import json
    import subprocess
    import sys
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.zeros((60, 80, 3), np.uint8)).save(img_dir / "im1.jpg")
    gt = {
        "images": [{"id": 1, "file_name": "im1.jpg", "width": 80, "height": 60}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 7,
                         "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0}],
        "categories": [{"id": 7, "name": "cat"}],
    }
    dets = [{"image_id": 1, "category_id": 7,
             "bbox": [10.0, 10.0, 20.0, 20.0], "score": 0.95}]
    (tmp_path / "gt.json").write_text(json.dumps(gt))
    (tmp_path / "dets.json").write_text(json.dumps(dets))
    vis = tmp_path / "vis"
    r = subprocess.run(
        [sys.executable, "scripts/eval_detections.py",
         "--detections", str(tmp_path / "dets.json"),
         "--instances-json", str(tmp_path / "gt.json"),
         "--vis-dir", str(vis), "--image-root", str(img_dir)],
        capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]
    assert (vis / "1.png").is_file()
    drawn = np.asarray(Image.open(vis / "1.png"))
    assert drawn.sum() > 0                      # something was drawn
