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
