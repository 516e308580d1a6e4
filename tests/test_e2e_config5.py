"""BASELINE.json config-5 end-to-end: raw images → extract_features.py →
features.h5 → inference.py → predictions JSON → eval.py — the artifact chain
of the reference (frcnn/test_net.py:297-306,538-542 → var_updown/scripts/
inference.py → eval/eval.py), driven through the actual CLIs in
subprocesses. Plus the CLI smokes VERDICT r1 flagged as missing:
eval_detections.py, preprocess.py, and a train→interrupt→resume round-trip.
"""

import json
import os
import pickle
import subprocess
import time
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute CLI/e2e smokes - excluded from the quick loop

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=600):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return proc.stdout


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Raw images + instances + captions + vocab + captioner config."""
    from PIL import Image

    from style_seqcvae_tpu.data.vocabulary import (
        BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary)

    d = tmp_path_factory.mktemp("cfg5")
    rng = np.random.RandomState(11)
    images, anns = [], []
    aid = 1
    for iid in range(1, 4):
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
    (d / "inst.json").write_text(json.dumps(
        {"images": images, "annotations": anns,
         "categories": [{"id": 1, "name": "thing"}]}))

    words = ["a", "dog", "cat", "runs", "sits", "red", "blue", "park",
             "in", "the"]
    Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN] + words).save_to_files(
        str(d / "vocab"))
    caps = [{"id": i + 1, "image_id": iid,
             "caption": f"the {'red' if iid % 2 else 'blue'} dog runs"}
            for i, iid in enumerate([1, 2, 3])]
    (d / "captions.json").write_text(json.dumps({"annotations": caps}))
    (d / "cfg.yml").write_text(f"""
DATA:
  VOCABULARY: {d}/vocab
  TRAIN_FEATURES: {d}/features.h5
  TRAIN_CAPTIONS: {d}/captions.json
  INFER_FEATURES: {d}/features.h5
  INFER_CAPTIONS: {d}/captions.json
  MAX_CAPTION_LENGTH: 8
MODEL:
  IMAGE_FEATURE_SIZE: 2048
  EMBEDDING_SIZE: 16
  HIDDEN_SIZE: 24
  ATTENTION_PROJECTION_SIZE: 12
  Z_SPACE: 10
""")
    return d


def test_config5_raw_images_to_eval(pipeline):
    d = pipeline
    # 1. raw images → detector (random init) → features.h5 (+detections)
    out = _run(["scripts/extract_features.py", "--cpu",
                "--instances-json", str(d / "inst.json"),
                "--image-root", str(d),
                "--output", str(d / "features.h5"),
                "--detections-output", str(d / "detections.json"),
                "--canvas", "96", "128", "--batch-size", "2",
                "--thresh", "0.05",
                "--config-override",
                "DET.TEST.SCALES", "[96]", "DET.TEST.MAX_SIZE", "128",
                "DET.TEST.RPN_PRE_NMS_TOP_N", "300",
                "DET.TEST.RPN_POST_NMS_TOP_N", "50",
                "DET.TEST.MAX_PER_IMAGE", "8"])
    assert "wrote 3 rows (0 skipped)" in out

    # the h5 must read back through the captioner-side reader (byte-schema
    # contract, test_net.py:297-306 / readers.py:21-139)
    from style_seqcvae_tpu.utils.features_io import FeaturesReader

    r = FeaturesReader(str(d / "features.h5"))
    assert sorted(r.image_ids) == [1, 2, 3]
    feats, _ = r[1]
    assert feats.ndim == 2 and feats.shape[1] == 2048

    # 2. features.h5 → captioner inference (diverse z, plain beam)
    _run(["scripts/inference.py", "--model", "cvae", "--cpu",
          "--config", str(d / "cfg.yml"),
          "--output-path", str(d / "preds.json"),
          "--batch-images", "2",
          "--config-override", "DATA.MAX_BOXES", "8",
          "MODEL.N_Z_SAMPLES", "2"])
    preds = json.load(open(d / "preds.json"))
    assert len(preds) == 6  # 3 images × 2 z-samples
    assert {p["image_id"] for p in preds} == {1, 2, 3}

    # 3. predictions → offline eval (BLEU/ROUGE/CIDEr/METEOR + Div + style)
    out = _run(["scripts/eval.py", "--predictions", str(d / "preds.json"),
                "--references", str(d / "captions.json"),
                "--output", str(d / "metrics.json")])
    metrics = json.load(open(d / "metrics.json"))
    for key in ("B1", "rouge", "cider", "meteor", "Div-1", "Div-2"):
        assert key in metrics, (key, sorted(metrics))
        assert np.isfinite(metrics[key])


def test_eval_detections_cli(pipeline):
    d = pipeline
    if not (d / "detections.json").exists():
        pytest.skip("extraction test must run first")
    out = _run(["scripts/eval_detections.py",
                "--detections", str(d / "detections.json"),
                "--instances-json", str(d / "inst.json"),
                "--output", str(d / "map.json")])
    m = json.load(open(d / "map.json"))
    assert "mAP" in m and 0.0 <= m["mAP"] <= 1.0


def test_serve_cli_single_dispatch(pipeline):
    """scripts/serve.py: raw image → ONE compiled program → diverse
    constrained captions (the serving story; style_seqcvae_tpu/serving.py)."""
    d = pipeline
    (d / "attribs.tsv").write_text("red\tred\nblue\tblue\n")
    (d / "attrib_names.json").write_text(json.dumps(["red", "blue"]))
    out = _run(["scripts/serve.py", "--cpu", "--f32",
                "--config", str(d / "cfg.yml"),
                # i1 landscape + i2 portrait through one fixed --canvas:
                # exercises both aspect-bucketed program specializations
                "--canvas", "96", "128",
                "--image", str(d / "i1.jpg"), str(d / "i2.jpg"),
                "--attrib-names-json", str(d / "attrib_names.json"),
                "--num-classes", "5",
                "--output", str(d / "serve_preds.json"),
                "--config-override",
                "DATA.CBS.WORDFORMS_ATTRIBS", str(d / "attribs.tsv"),
                "DATA.MAX_BOXES", "8",
                "MODEL.N_Z_SAMPLES", "2", "MODEL.BEAM_SIZE", "2",
                "MODEL.USE_CBS", "True",
                # CBS requires the GloVe embedding width (config _validate)
                "MODEL.EMBEDDING_SIZE", "300",
                "MODEL.STATE_MACHINE_PER_Z_SAMPLE", "True",
                "DET.TEST.SCALES", "[96]", "DET.TEST.MAX_SIZE", "128",
                "DET.TEST.RPN_PRE_NMS_TOP_N", "300",
                "DET.TEST.RPN_POST_NMS_TOP_N", "50",
                "DET.TEST.MAX_PER_IMAGE", "8"])
    preds = json.load(open(d / "serve_preds.json"))
    assert len(preds) == 2
    for p in preds:
        assert isinstance(p["caption"], str)
        assert len(p["candidates"]) == 2  # one per z-sample
    assert "constraints" in out


def test_preprocess_cli_smoke(tmp_path):
    senticap = {"images": [
        {"filename": "COCO_val2014_000000000001.jpg", "split": "train",
         "sentences": [{"raw": "a nice dog", "sentiment": 1},
                       {"raw": "an ugly dog", "sentiment": 0}]},
        {"filename": "COCO_val2014_000000000002.jpg", "split": "test",
         "sentences": [{"raw": "a great cat", "sentiment": 1}]},
    ]}
    (tmp_path / "senticap.json").write_text(json.dumps(senticap))

    out_dir = tmp_path / "splits"
    _run(["scripts/preprocess.py", "split-senticap",
          "--senticap-json", str(tmp_path / "senticap.json"),
          "--output-dir", str(out_dir)])
    pos = json.load(open(out_dir / "senticap_train_pos.json"))
    assert len(pos["images"]) == 1 and len(pos["annotations"]) == 1
    neg = json.load(open(out_dir / "senticap_train_neg.json"))
    assert neg["annotations"][0]["caption"] == "an ugly dog"

    _run(["scripts/preprocess.py", "id-maps",
          "--senticap-json", str(tmp_path / "senticap.json"),
          "--output-dir", str(tmp_path)])
    c2s = pickle.load(open(tmp_path / "coco2senti.pik", "rb"))
    assert c2s[1] == 1 and c2s[2] == 2


def test_train_interrupt_resume_cli(tmp_path):
    """train 3 iters (checkpoint), then resume to 6 — the step counter must
    continue (the reference restarts at iteration 1, train.py:142-151; the
    fix is a documented divergence, SURVEY.md §5.4)."""
    from style_seqcvae_tpu.data.vocabulary import (
        BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary)
    from style_seqcvae_tpu.utils.features_io import FeaturesWriter, pack_obj_atts

    d = tmp_path
    words = ["a", "dog", "runs", "red", "blue"]
    Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN] + words).save_to_files(
        str(d / "vocab"))
    ids = [1, 2, 3, 4]
    anns = [{"id": i, "image_id": iid, "caption": "a red dog runs"}
            for i, iid in enumerate(ids)]
    (d / "captions.json").write_text(json.dumps({"annotations": anns}))
    rng = np.random.RandomState(0)
    w = FeaturesWriter(str(d / "features.h5"), len(ids))
    for i, iid in enumerate(ids):
        w.write(i, iid, rng.randn(4, 16).astype(np.float32),
                pack_obj_atts(list(range(1, 5)), [[0]] * 4),
                np.zeros((0,), np.float32))
    w.close()
    (d / "cfg.yml").write_text(f"""
DATA:
  VOCABULARY: {d}/vocab
  TRAIN_FEATURES: {d}/features.h5
  TRAIN_CAPTIONS: {d}/captions.json
  INFER_FEATURES: {d}/features.h5
  INFER_CAPTIONS: {d}/captions.json
  MAX_CAPTION_LENGTH: 6
MODEL:
  IMAGE_FEATURE_SIZE: 16
  EMBEDDING_SIZE: 8
  HIDDEN_SIZE: 10
  ATTENTION_PROJECTION_SIZE: 6
  Z_SPACE: 4
OPTIM:
  BATCH_SIZE: 4
  NUM_ITERATIONS: 20
  LR: 0.05
""")
    ser = d / "ser"
    common = ["scripts/train.py", "--model", "cvae", "--cpu",
              "--config", str(d / "cfg.yml"),
              "--serialization-dir", str(ser),
              "--checkpoint-every", "3",
              "--config-override", "PRINT_EVERY_N_BATCHES", "1",
              "DATA.MAX_BOXES", "4", "MODEL.LSTM_DROPOUT", "0.0"]
    _run(common + ["--max-iterations", "3"])
    assert (ser / "checkpoint_3").exists()
    rows1 = [json.loads(l) for l in open(ser / "metrics.jsonl")]
    assert rows1[-1]["step"] == 3

    out = _run(common + ["--max-iterations", "6",
                         "--start-from-checkpoint", "checkpoint_3"])
    assert "resumed from step 3" in out
    rows2 = [json.loads(l) for l in open(ser / "metrics.jsonl")]
    iters = [r["step"] for r in rows2]
    assert iters[-1] == 6 and 4 in iters  # continued at 4, not restarted at 1
    assert (ser / "checkpoint_6").exists()


def test_serve_cli_batch_requests(pipeline):
    """scripts/serve.py --batch-requests: B requests share one fused
    dispatch; mixed orientations group by canvas bucket and a short last
    group pads by repetition. Output order matches the request order."""
    d = pipeline
    (d / "attribs.tsv").write_text("red\tred\nblue\tblue\n")
    (d / "attrib_names.json").write_text(json.dumps(["red", "blue"]))
    out = _run(["scripts/serve.py", "--cpu", "--f32",
                "--config", str(d / "cfg.yml"),
                "--canvas", "96", "128", "--batch-requests", "2",
                # landscape, portrait, landscape: the landscape bucket fills
                # a full group of 2, the portrait group of 1 pads to 2
                "--image", str(d / "i1.jpg"), str(d / "i2.jpg"),
                str(d / "i1.jpg"),
                "--attrib-names-json", str(d / "attrib_names.json"),
                "--num-classes", "5",
                "--output", str(d / "serve_preds_b2.json"),
                "--config-override",
                "DATA.CBS.WORDFORMS_ATTRIBS", str(d / "attribs.tsv"),
                "DATA.MAX_BOXES", "8",
                "MODEL.N_Z_SAMPLES", "2", "MODEL.BEAM_SIZE", "2",
                "MODEL.USE_CBS", "True",
                "MODEL.EMBEDDING_SIZE", "300",
                "MODEL.STATE_MACHINE_PER_Z_SAMPLE", "True",
                "DET.TEST.SCALES", "[96]", "DET.TEST.MAX_SIZE", "128",
                "DET.TEST.RPN_PRE_NMS_TOP_N", "300",
                "DET.TEST.RPN_POST_NMS_TOP_N", "50",
                "DET.TEST.MAX_PER_IMAGE", "8"])
    assert "(batch 2)" in out
    preds = json.load(open(d / "serve_preds_b2.json"))
    assert len(preds) == 3
    assert [p["image_id"] for p in preds] == [
        str(d / "i1.jpg"), str(d / "i2.jpg"), str(d / "i1.jpg")]
    for p in preds:
        assert isinstance(p["caption"], str) and len(p["candidates"]) == 2


def test_serve_cli_http_mode(pipeline):
    """scripts/serve.py --http: online serving over the fused program with
    dynamic micro-batching — two concurrent POSTs land in one batched
    dispatch; /healthz answers; responses carry captions + candidates."""
    import threading
    import urllib.request

    d = pipeline
    (d / "attribs.tsv").write_text("red\tred\nblue\tblue\n")
    (d / "attrib_names.json").write_text(json.dumps(["red", "blue"]))
    args = [sys.executable, "scripts/serve.py", "--cpu", "--f32",
            "--config", str(d / "cfg.yml"),
            "--canvas", "96", "128", "--http", "0",
            "--batch-requests", "2", "--batch-wait-ms", "3000",
            "--attrib-names-json", str(d / "attrib_names.json"),
            "--num-classes", "5",
            "--config-override",
            "DATA.CBS.WORDFORMS_ATTRIBS", str(d / "attribs.tsv"),
            "DATA.MAX_BOXES", "8",
            "MODEL.N_Z_SAMPLES", "2", "MODEL.BEAM_SIZE", "2",
            "MODEL.USE_CBS", "True",
            "MODEL.EMBEDDING_SIZE", "300",
            "MODEL.STATE_MACHINE_PER_Z_SAMPLE", "True",
            "DET.TEST.SCALES", "[96]", "DET.TEST.MAX_SIZE", "128",
            "DET.TEST.RPN_PRE_NMS_TOP_N", "300",
            "DET.TEST.RPN_POST_NMS_TOP_N", "50",
            "DET.TEST.MAX_PER_IMAGE", "8"]
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.Popen(args, cwd=REPO, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    try:
        port = None
        warmed = False
        deadline = time.time() + 420
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line and proc.poll() is not None:
                raise AssertionError("server exited before startup")
            if line.startswith("warm-up:"):
                warmed = True
            if "serving on http://" in line:
                port = int(line.split(":")[2].split()[0].strip("/"))
                break
        assert port, "server never announced its port"
        # the bucket programs compiled BEFORE the server opened its port —
        # a cold server's first burst must not eat the compile
        assert warmed, "server accepted requests without pre-warming"

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
            assert json.loads(r.read())["ok"] is True

        img_bytes = open(d / "i1.jpg", "rb").read()
        results = [None, None]

        def post(i, senti):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/caption?sentiment={senti}",
                data=img_bytes, method="POST")
            with urllib.request.urlopen(req, timeout=540) as r:
                results[i] = json.loads(r.read())

        # two concurrent requests inside one 3 s batch window → one
        # batched dispatch (first compile dominates the wait)
        threads = [threading.Thread(target=post, args=(i, s))
                   for i, s in ((0, 1.0), (1, -1.0))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=560)
        assert all(r is not None for r in results), results
        for r in results:
            assert isinstance(r["caption"], str)
            assert len(r["candidates"]) == 2          # one per z-sample
            assert r["num_constraints"] >= 0
            # pre-warmed: the first burst's dispatch must be a warm
            # execution, not a cold compile (which takes minutes here)
            assert r["latency_ms"] < 60_000, r
        assert {r["batch"] for r in results} == {2}   # batched together
    finally:
        proc.terminate()
        proc.wait(timeout=30)
