"""End-to-end CLI smoke: train → inference through the actual scripts in a
subprocess (the driver only runs pytest, so without this the script layer has
no automated regression net). Tiny dims, CPU, ~1 min."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute CLI/e2e smokes - excluded from the quick loop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    from style_seqcvae_tpu.data.vocabulary import (
        BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary)
    from style_seqcvae_tpu.utils.features_io import FeaturesWriter, pack_obj_atts

    words = ["a", "dog", "cat", "runs", "sits", "red", "blue", "park",
             "in", "the"]
    Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN] + words).save_to_files(
        str(d / "vocab"))
    ids = list(range(1, 9))
    anns = [{"id": i, "image_id": iid,
             "caption": f"the {'red' if iid % 2 else 'blue'} dog runs"}
            for i, iid in enumerate(ids)]
    (d / "captions.json").write_text(json.dumps({"annotations": anns}))
    rng = np.random.RandomState(0)
    w = FeaturesWriter(str(d / "features.h5"), len(ids))
    for i, iid in enumerate(ids):
        w.write(i, iid, rng.randn(6, 32).astype(np.float32),
                pack_obj_atts(list(range(1, 7)), [[0]] * 6),
                np.zeros((0,), np.float32))
    w.close()
    (d / "cfg.yml").write_text(f"""
DATA:
  VOCABULARY: {d}/vocab
  TRAIN_FEATURES: {d}/features.h5
  INFER_FEATURES: {d}/features.h5
  TRAIN_CAPTIONS: {d}/captions.json
  INFER_CAPTIONS: {d}/captions.json
  MAX_CAPTION_LENGTH: 8
MODEL:
  IMAGE_FEATURE_SIZE: 32
  EMBEDDING_SIZE: 16
  HIDDEN_SIZE: 24
  ATTENTION_PROJECTION_SIZE: 12
  Z_SPACE: 10
OPTIM:
  BATCH_SIZE: 4
  NUM_ITERATIONS: 30
  LR: 0.05
""")
    return d


def _run(args, xla_flags=None, timeout=600):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    if xla_flags:
        env["XLA_FLAGS"] = xla_flags
    proc = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return proc.stdout


def test_train_and_inference_cli(cli_fixture):
    d = cli_fixture
    for model in ("baseline", "cvae"):
        ser = d / f"ckpt_{model}"
        _run(["scripts/train.py", "--model", model, "--cpu",
              "--config", str(d / "cfg.yml"),
              "--serialization-dir", str(ser),
              "--max-iterations", "30", "--checkpoint-every", "30",
              "--config-override", "PRINT_EVERY_N_BATCHES", "10",
              "DATA.MAX_BOXES", "6", "MODEL.LSTM_DROPOUT", "0.0"])
        rows = [json.loads(l) for l in open(ser / "metrics.jsonl")]
        assert rows[-1]["loss"] < rows[0]["loss"], model

        out = d / f"preds_{model}.json"
        _run(["scripts/inference.py", "--model", model, "--cpu",
              "--config", str(d / "cfg.yml"),
              "--checkpoint-path", str(ser), "--checkpoint-name",
              "checkpoint_30",
              "--output-path", str(out), "--max-images", "4",
              "--batch-images", "2",
              "--config-override", "DATA.MAX_BOXES", "6",
              "MODEL.N_Z_SAMPLES", "2"])
        preds = json.load(open(out))
        n_z = 1 if model == "baseline" else 2
        assert len(preds) == 4 * n_z, (model, len(preds))
        assert all("caption" in p and "image_id" in p for p in preds)


def test_inference_cli_num_data_sharded_equals_unsharded(cli_fixture):
    """--num-data 2 (decode grid sharded over a 2-device virtual CPU mesh)
    must produce byte-identical predictions to the unsharded decode."""
    d = cli_fixture
    outs = []
    for num_data in (1, 2):
        out = d / f"preds_nd{num_data}.json"
        _run(["scripts/inference.py", "--model", "cvae", "--cpu",
              "--config", str(d / "cfg.yml"),
              "--output-path", str(out), "--max-images", "4",
              "--batch-images", "2", "--num-data", str(num_data),
              "--config-override", "DATA.MAX_BOXES", "6",
              "MODEL.N_Z_SAMPLES", "2"],
             xla_flags="--xla_force_host_platform_device_count=2")
        outs.append(json.load(open(out)))
    assert outs[0] == outs[1]
    assert len(outs[0]) == 8


def test_detector_cli_smoke(tmp_path):
    """train_detector.py end to end on tiny images/canvas (CPU): batching,
    canvas bucketing, and per-step losses all exercised through the CLI."""
    from PIL import Image

    d = tmp_path
    rng = np.random.RandomState(7)
    images, anns = [], []
    aid = 1
    for iid in range(1, 5):
        h, w = (96, 128) if iid % 2 else (128, 96)
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            d / f"i{iid}.jpg")
        images.append({"id": iid, "file_name": f"i{iid}.jpg",
                       "height": h, "width": w})
        for _ in range(2):
            x, y = rng.randint(0, w - 48), rng.randint(0, h - 48)
            anns.append({"id": aid, "image_id": iid, "category_id": 1,
                         "bbox": [int(x), int(y), 40, 40], "area": 1600,
                         "iscrowd": 0})
            aid += 1
    # two instance jsons (images 1-2 / 3-4) exercised as a training union —
    # the reference's combined_roidb multi-imdb merge (roidb.py:88-140)
    cats = [{"id": 1, "name": "thing"}]
    (d / "inst_a.json").write_text(json.dumps(
        {"images": images[:2],
         "annotations": [a for a in anns if a["image_id"] <= 2],
         "categories": cats}))
    (d / "inst_b.json").write_text(json.dumps(
        {"images": images[2:],
         "annotations": [a for a in anns if a["image_id"] > 2],
         "categories": cats}))

    out = _run(["scripts/train_detector.py", "--cpu",
                "--instances-json", str(d / "inst_a.json"),
                "--instances-json", str(d / "inst_b.json"),
                "--image-root", str(d),
                "--serialization-dir", str(d / "ckpt"),
                "--epochs", "1", "--steps-per-epoch", "4",
                "--ims-per-batch", "2", "--canvas", "96", "128",
                "--config-override",
                "DET.TRAIN.SCALES", "[96]", "DET.TRAIN.MAX_SIZE", "128",
                "DET.TRAIN.RPN_PRE_NMS_TOP_N", "300",
                "DET.TRAIN.RPN_POST_NMS_TOP_N", "40",
                "DET.TRAIN.DISPLAY", "1"])
    assert "done." in out
    rows = [json.loads(l) for l in open(d / "ckpt" / "metrics.jsonl")]
    assert rows and all(np.isfinite(r["total"]) for r in rows)


def test_detector_cli_steps_per_dispatch_equivalence(tmp_path):
    """train_detector.py --steps-per-dispatch K: checkpoint bit-identity
    with the single-step loop (same shuffle order, same host PRNG-key
    stream; single orientation so bucket pops align)."""
    from PIL import Image

    d = tmp_path
    rng = np.random.RandomState(5)
    images, anns = [], []
    aid = 1
    for iid in range(1, 5):    # 4 landscape images → 2 steps at ims=2
        h, w = 96, 128
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            d / f"i{iid}.jpg")
        images.append({"id": iid, "file_name": f"i{iid}.jpg",
                       "height": h, "width": w})
        for _ in range(2):
            x, y = rng.randint(0, w - 48), rng.randint(0, h - 48)
            anns.append({"id": aid, "image_id": iid, "category_id": 1,
                         "bbox": [int(x), int(y), 40, 40], "area": 1600,
                         "iscrowd": 0})
            aid += 1
    (d / "inst.json").write_text(json.dumps(
        {"images": images, "annotations": anns,
         "categories": [{"id": 1, "name": "thing"}]}))

    for tag, extra in (("k1", []), ("k2", ["--steps-per-dispatch", "2"])):
        _run(["scripts/train_detector.py", "--cpu",
              "--instances-json", str(d / "inst.json"),
              "--image-root", str(d),
              "--serialization-dir", str(d / f"ckpt_{tag}"),
              "--epochs", "1", "--ims-per-batch", "2",
              "--canvas", "96", "128", "--seed", "11"] + extra +
             ["--config-override",
              "DET.TRAIN.SCALES", "[96]", "DET.TRAIN.MAX_SIZE", "128",
              "DET.TRAIN.RPN_PRE_NMS_TOP_N", "300",
              "DET.TRAIN.RPN_POST_NMS_TOP_N", "40",
              "DET.TRAIN.BATCH_SIZE", "16",
              "DET.MAX_NUM_GT_BOXES", "4",
              "DET.TRAIN.USE_FLIPPED", "False",
              "DET.TRAIN.DISPLAY", "2"], timeout=1200)

    import jax
    import orbax.checkpoint as ocp

    ck = ocp.StandardCheckpointer()
    a = ck.restore(str(d / "ckpt_k1" / "detector_epoch_1"))
    b = ck.restore(str(d / "ckpt_k2" / "detector_epoch_1"))
    la, lb = (jax.tree_util.tree_leaves(t["params"]) for t in (a, b))
    assert la and len(la) == len(lb)
    for xa, xb in zip(la, lb):
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   rtol=1e-6, atol=1e-7)


def test_train_cli_bf16_compute(cli_fixture):
    """--bf16-compute: the mixed-precision train step runs through the CLI,
    loss decreases, and the checkpoint stays float32."""
    d = cli_fixture
    ser = d / "ckpt_bf16"
    _run(["scripts/train.py", "--model", "cvae", "--cpu", "--bf16-compute",
          "--config", str(d / "cfg.yml"),
          "--serialization-dir", str(ser),
          "--max-iterations", "20", "--checkpoint-every", "20",
          "--config-override", "PRINT_EVERY_N_BATCHES", "10",
          "DATA.MAX_BOXES", "6", "MODEL.LSTM_DROPOUT", "0.0"])
    rows = [json.loads(l) for l in open(ser / "metrics.jsonl")]
    assert rows[-1]["loss"] < rows[0]["loss"]


def test_train_cli_tied_embeddings(cli_fixture):
    """EMBEDDING_SIZE 300/600 ties the output head to the embedding — the
    production configuration. The CLI must start and train (round-2
    regression: the param sharding table lacked the tied-head leaves and
    crashed scripts/train.py at startup on any mesh)."""
    d = cli_fixture
    ser = d / "ckpt_tied"
    _run(["scripts/train.py", "--model", "cvae", "--cpu",
          "--config", str(d / "cfg.yml"),
          "--serialization-dir", str(ser),
          "--max-iterations", "6", "--checkpoint-every", "6",
          "--config-override", "PRINT_EVERY_N_BATCHES", "5",
          "MODEL.EMBEDDING_SIZE", "300",
          "DATA.MAX_BOXES", "6", "MODEL.LSTM_DROPOUT", "0.0"])
    rows = [json.loads(l) for l in open(ser / "metrics.jsonl")]
    assert np.isfinite(rows[-1]["loss"])


def test_train_cli_glove_cache(cli_fixture, tmp_path):
    """scripts/train.py with DATA.GLOVE_CACHE: the real GloVe-600 path
    (glove.42B.300d.txt + deps.words two-file concat) through the CLI
    (reference updown_captioner.py:168-222). Synthetic 300-d cache files
    cover a few vocab words; the rest fall back to hashed vectors."""
    d = cli_fixture
    rng = np.random.RandomState(3)
    cache = tmp_path / "glove"
    cache.mkdir()
    for fname in ("glove.42B.300d.txt", "deps.words"):
        with open(cache / fname, "w") as f:
            for wword in ("dog", "cat", "runs"):
                vec = " ".join(f"{v:.4f}" for v in rng.randn(300))
                f.write(f"{wword} {vec}\n")
            f.write("dog 1 2 3\n")  # malformed duplicate row → skipped
    ser = d / "ckpt_glove"
    _run(["scripts/train.py", "--model", "cvae", "--cpu",
          "--config", str(d / "cfg.yml"),
          "--serialization-dir", str(ser),
          "--max-iterations", "10", "--checkpoint-every", "10",
          "--config-override", "MODEL.EMBEDDING_SIZE", "600",
          "DATA.GLOVE_CACHE", str(cache), "PRINT_EVERY_N_BATCHES", "5",
          "DATA.MAX_BOXES", "6", "MODEL.LSTM_DROPOUT", "0.0"])
    rows = [json.loads(l) for l in open(ser / "metrics.jsonl")]
    assert np.isfinite(rows[-1]["loss"])


def test_train_cli_steps_per_dispatch_equivalence(cli_fixture):
    """--steps-per-dispatch K must produce the same final checkpoint as the
    single-step loop (same data order, same PRNG stream), including a tail
    window (25 iterations, K=3 → 8 windows + 1 single)."""
    import numpy as _np

    d = cli_fixture
    finals = []
    for tag, extra in (("k1", []), ("k3", ["--steps-per-dispatch", "3"])):
        ser = d / f"ckpt_spd_{tag}"
        _run(["scripts/train.py", "--model", "cvae", "--cpu",
              "--config", str(d / "cfg.yml"),
              "--serialization-dir", str(ser),
              "--max-iterations", "25", "--checkpoint-every", "25",
              "--config-override", "PRINT_EVERY_N_BATCHES", "5",
              "DATA.MAX_BOXES", "6", "MODEL.LSTM_DROPOUT", "0.0"] + extra)
        import jax

        from style_seqcvae_tpu.models.captioner import (
            CaptionerConfig, init_captioner)
        from style_seqcvae_tpu.training.checkpointing import CheckpointManager

        rows = [json.loads(l) for l in open(ser / "metrics.jsonl")]
        assert rows and rows[-1]["loss"] < rows[0]["loss"], tag
        finals.append(ser)

    import jax
    import orbax.checkpoint as ocp

    ck = ocp.StandardCheckpointer()
    a = ck.restore(str(finals[0] / "checkpoint_25"))
    b = ck.restore(str(finals[1] / "checkpoint_25"))
    la, lb = (jax.tree_util.tree_leaves(t["params"]) for t in (a, b))
    assert len(la) == len(lb) and la
    for xa, xb in zip(la, lb):
        _np.testing.assert_allclose(_np.asarray(xb), _np.asarray(xa),
                                    rtol=1e-5, atol=1e-6)


def test_build_vocabulary_cli(tmp_path):
    """Drive scripts/build_vocabulary.py end-to-end: COCO threshold, Senticap
    combined-count threshold, specials-first AllenNLP file output (reference
    var_updown/scripts/build_vocabulary.py:55-136)."""
    anns = []
    for i in range(3):
        anns.append({"id": 700 + i, "image_id": 700 + i,
                     "caption": "a dog runs in the park"})
    anns.append({"id": 703, "image_id": 703, "caption": "a zebra"})
    (tmp_path / "captions.json").write_text(json.dumps({"annotations": anns}))
    senti = {"images": [{
        "filename": "COCO_val2014_000000000701.jpg",
        "sentences": [{"raw": "gloomy dog"}, {"raw": "gloomy park"}],
    }]}
    (tmp_path / "senticap.json").write_text(json.dumps(senti))

    out = tmp_path / "vocab"
    stdout = _run(["scripts/build_vocabulary.py",
                   "-c", str(tmp_path / "captions.json"),
                   "-s", str(tmp_path / "senticap.json"),
                   "-t", "3", "-st", "2",
                   "-o", str(out)])
    assert "Caption vocabulary size" in stdout

    from style_seqcvae_tpu.data.vocabulary import (
        BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary)

    vocab = Vocabulary.from_files(str(out))
    tokens = vocab._index_to_token
    assert tokens[0] == UNK_TOKEN and tokens[1] == BOUNDARY_TOKEN
    # COCO words at count >= 3 survive; the count-1 "zebra" does not.
    for w in ("a", "dog", "runs", "in", "the", "park"):
        assert w in tokens, w
    assert "zebra" not in tokens
    # Senticap-only word at combined count >= 2 is added.
    assert "gloomy" in tokens
    # Body is sorted after the two specials (AllenNLP file parity).
    assert tokens[2:] == sorted(tokens[2:])


def test_compare_meteor_jar_cli_without_jar(tmp_path):
    """scripts/compare_meteor_jar.py must fail fast with a clear message when
    no meteor jar is configured (the documented offline behavior), not crash
    or silently succeed."""
    (tmp_path / "p.json").write_text(json.dumps(
        [{"image_id": 1, "caption": "a dog"}]))
    (tmp_path / "c.json").write_text(json.dumps(
        {"annotations": [{"image_id": 1, "caption": "a dog runs"}]}))
    env = {k: v for k, v in os.environ.items() if k != "METEOR_JAR"}
    proc = subprocess.run(
        [sys.executable, "scripts/compare_meteor_jar.py",
         "--predictions", str(tmp_path / "p.json"),
         "--captions", str(tmp_path / "c.json")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120)
    assert proc.returncode != 0
    assert "meteor jar unavailable" in proc.stderr


def test_inference_cli_samplers(cli_fixture):
    """--sampler {topk,topp,gumbel}: the stochastic samplers are reachable
    from the entry layer (reference sampler classes, var_updown
    beam_search.py:88-295). Fixed RANDOM_SEED → identical captions across
    runs; 3 images at --batch-images 2 exercises both the group dispatch
    and the single-image tail."""
    d = cli_fixture
    runs = {}
    for tag, extra in (
            ("topk_a", ["--sampler", "topk", "--sampler-k", "3"]),
            ("topk_b", ["--sampler", "topk", "--sampler-k", "3"]),
            ("gumbel", ["--sampler", "gumbel"]),
            ("topp", ["--sampler", "topp", "--sampler-p", "0.8",
                      "--sampler-temperature", "1.2"])):
        out = d / f"preds_s_{tag}.json"
        _run(["scripts/inference.py", "--model", "cvae", "--cpu",
              "--config", str(d / "cfg.yml"),
              "--output-path", str(out), "--max-images", "3",
              "--batch-images", "2",
              "--config-override", "DATA.MAX_BOXES", "6",
              "MODEL.N_Z_SAMPLES", "3"] + extra)
        runs[tag] = json.load(open(out))
        assert len(runs[tag]) == 9, tag
        assert all("caption" in p and "image_id" in p for p in runs[tag])
    assert runs["topk_a"] == runs["topk_b"]   # fixed-PRNGKey determinism


def test_train_cli_device_corpus_equivalence(cli_fixture):
    """--device-corpus (HBM-resident table + in-step index gather) must
    produce the same final checkpoint as the host feature path through the
    CLI — same seed, same shuffle order, same math — including composed
    with --num-data 2 DP sharding of the feat_idx batches."""
    d = cli_fixture
    sers = []
    for tag, extra, flags in (
            ("host", [], None),
            ("corpus", ["--device-corpus"], None),
            ("corpus_dp2", ["--device-corpus", "--num-data", "2"],
             "--xla_force_host_platform_device_count=2")):
        ser = d / f"ckpt_dc_{tag}"
        _run(["scripts/train.py", "--model", "cvae", "--cpu",
              "--config", str(d / "cfg.yml"),
              "--serialization-dir", str(ser),
              "--max-iterations", "15", "--checkpoint-every", "15",
              "--config-override", "PRINT_EVERY_N_BATCHES", "5",
              "DATA.MAX_BOXES", "6", "MODEL.LSTM_DROPOUT", "0.0"] + extra,
             xla_flags=flags)
        rows = [json.loads(l) for l in open(ser / "metrics.jsonl")]
        assert rows[-1]["loss"] < rows[0]["loss"], tag
        sers.append(ser)

    import jax
    import orbax.checkpoint as ocp

    ck = ocp.StandardCheckpointer()
    ref = ck.restore(str(sers[0] / "checkpoint_15"))
    for ser in sers[1:]:
        got = ck.restore(str(ser / "checkpoint_15"))
        la, lb = (jax.tree_util.tree_leaves(t["params"]) for t in (ref, got))
        assert la and len(la) == len(lb)
        for xa, xb in zip(la, lb):
            np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                       rtol=1e-5, atol=1e-6)


def test_train_cli_tensor_parallel(cli_fixture):
    """--num-data 2 --num-model 2 (DP x TP: vocab-facing matrices + fused
    LSTM gates sharded over the model axis) through the train CLI on a 2x2
    virtual mesh: loss decreases and the final checkpoint matches the
    unsharded run (collective-order tolerance)."""
    d = cli_fixture
    sers = []
    for tag, extra, flags in (
            ("tp_ref", [], None),
            ("tp_2x2", ["--num-data", "2", "--num-model", "2"],
             "--xla_force_host_platform_device_count=4")):
        ser = d / f"ckpt_{tag}"
        _run(["scripts/train.py", "--model", "cvae", "--cpu",
              "--config", str(d / "cfg.yml"),
              "--serialization-dir", str(ser),
              "--max-iterations", "12", "--checkpoint-every", "12",
              "--config-override", "PRINT_EVERY_N_BATCHES", "4",
              "DATA.MAX_BOXES", "6", "MODEL.LSTM_DROPOUT", "0.0"] + extra,
             xla_flags=flags)
        rows = [json.loads(l) for l in open(ser / "metrics.jsonl")]
        assert rows[-1]["loss"] < rows[0]["loss"], tag
        sers.append(ser)

    import jax
    import orbax.checkpoint as ocp

    ck = ocp.StandardCheckpointer()
    a = ck.restore(str(sers[0] / "checkpoint_12"))
    b = ck.restore(str(sers[1] / "checkpoint_12"))
    la, lb = (jax.tree_util.tree_leaves(t["params"]) for t in (a, b))
    assert la and len(la) == len(lb)
    for xa, xb in zip(la, lb):
        np.testing.assert_allclose(np.asarray(xb), np.asarray(xa),
                                   rtol=1e-4, atol=1e-5)
