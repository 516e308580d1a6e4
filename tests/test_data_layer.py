"""Data-layer tests over synthetic fixtures: reader semantics, Senticap
oversampling + leakage removal, fixed-shape collate, CBS dataset FSM
generation, and the latent dictionaries."""

import json
import pickle
import random

import numpy as np
import pytest

from style_seqcvae_tpu.data.datasets import (
    EvaluationDatasetWithConstraints,
    TrainingDataset,
    collate_image_features,
)
from style_seqcvae_tpu.data.latents import LatentDictionary
from style_seqcvae_tpu.data.readers import SenticapReader
from style_seqcvae_tpu.data.vocabulary import BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary
from style_seqcvae_tpu.utils.features_io import FeaturesWriter, pack_obj_atts


def make_senticap_json(path):
    images = []
    for i, (split, senti) in enumerate([("train", 1), ("train", 0), ("val", 1),
                                        ("test", 0), ("test", 1)]):
        images.append({
            "filename": f"COCO_val2014_{i:012d}.jpg",
            "split": split,
            "sentences": [{"raw": f"a {'nice' if senti else 'ugly'} dog", "sentiment": senti}],
        })
    path.write_text(json.dumps({"images": images}))


def make_coco_json(path, image_ids):
    anns = [{"id": i, "image_id": iid, "caption": f"a dog number {iid}"}
            for i, iid in enumerate(image_ids)]
    path.write_text(json.dumps({"annotations": anns}))


def make_features_h5(path, image_ids, n_boxes=4, feat=8):
    rng = np.random.RandomState(0)
    w = FeaturesWriter(str(path), len(image_ids))
    for i, iid in enumerate(image_ids):
        feats = rng.randn(n_boxes, feat).astype(np.float32)
        oa = pack_obj_atts(list(range(1, n_boxes + 1)), [[0]] * n_boxes)
        w.write(i, iid, feats, oa, np.zeros((0,), np.float32))
    w.close()


def test_senticap_reader_splits_and_remap(tmp_path):
    p = tmp_path / "senticap.json"
    make_senticap_json(p)
    r = SenticapReader(str(p), train_split=True)
    assert len(r) == 2
    # sentiment 0 remapped to -1
    assert {c[2] for c in r._captions} == {1, -1}
    r_test = SenticapReader(str(p), test_split=True, sentiment="pos")
    assert len(r_test) == 1 and r_test._captions[0][2] == 1
    assert r_test._image_ids == {4}


def test_training_dataset_composition(tmp_path):
    coco_ids = [0, 1, 2, 3, 10, 11]
    coco = tmp_path / "coco.json"
    make_coco_json(coco, coco_ids)
    senticap = tmp_path / "senticap.json"
    make_senticap_json(senticap)
    h5 = tmp_path / "features.h5"
    make_features_h5(h5, coco_ids + [4])

    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog", "nice", "ugly", "number"])
    ds = TrainingDataset(
        vocabulary=vocab, captions_jsonpath=str(coco),
        senticap_jsonpath=str(senticap), do_load_coco=True,
        do_load_senticap=True, image_features_h5path=str(h5),
        max_caption_length=6, max_boxes=5)

    # 6 coco + 20×3 senticap(train+val) = 66, minus leakage: senticap test
    # ids {3, 4} → removes coco caption for image 3 and any senticap with
    # those ids (none in train/val here) → 65
    assert len(ds) == 65
    assert all(x[0] not in (3, 4) for x in ds._captions)

    item = ds[0]
    assert len(item["caption_tokens"]) == 6
    batch = ds.collate_fn([ds[0], ds[1]])
    assert batch["image_features"].shape == (2, 5, 8)
    assert batch["caption_tokens"].shape == (2, 6)
    assert batch["sentiment"].shape == (2, 1)

    # batches() yields complete fixed-shape batches forever
    gen = ds.batches(4, rng=random.Random(1))
    b = next(gen)
    assert b["caption_tokens"].shape == (4, 6)


def test_collate_truncates_overlong_features():
    feats = [np.ones((7, 3), np.float32), np.ones((2, 3), np.float32)]
    out = collate_image_features(feats, 4)
    assert out.shape == (2, 4, 3)
    assert out[1, 2:].sum() == 0


def test_eval_dataset_with_constraints_sentiment_mode(tmp_path):
    """cbs_simple without attributes: the sentiment word is every constraint
    (datasets.py:521-523)."""
    senticap = tmp_path / "senticap.json"
    make_senticap_json(senticap)
    h5 = tmp_path / "features.h5"
    make_features_h5(h5, [3, 4])
    wf = tmp_path / "wordforms.tsv"
    wf.write_text("pos\tnice,lovely\nneg\tugly,nasty\n")

    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog", "nice",
                        "lovely", "ugly", "nasty"])
    ds = EvaluationDatasetWithConstraints(
        vocabulary=vocab,
        val_image_features_h5path=str(h5),
        do_load_senticap=True,
        senticap_jsonpath=str(senticap),
        sentiment="pos",
        wordforms_tsvpath=str(wf),
        n_z_samples=3, state_machine_per_z_sample=True,
        max_boxes=5, cbs_simple=True)

    # sentiment filter: only image 4 has a "pos" test caption
    assert sorted(ds._image_ids) == [4]
    item = ds[0]
    assert len(item["fsm"]) == 3                  # one FSM per z-sample
    assert item["num_constraints"] == [3, 3, 3]
    fsm = item["fsm"][0]
    nice = vocab.get_token_index("nice")
    lovely = vocab.get_token_index("lovely")
    ugly = vocab.get_token_index("ugly")
    assert fsm[0, 1, nice] == 1 and fsm[0, 1, lovely] == 1
    assert fsm[0, 1, ugly] == 0

    batch = ds.collate_fn([item])
    assert len(batch["fsm_packed"]) == 3
    assert batch["fsm_tables"][0].default_dest.shape[0] >= 8
    assert batch["image_features"].shape == (1, 5, 8)


def test_latent_dictionary(tmp_path):
    sg = tmp_path / "sentiglove10.pkl"
    table = {"fluffy": np.arange(10, dtype=np.float32),
             "red": -np.ones(10, np.float32)}
    with open(sg, "wb") as f:
        pickle.dump(table, f)
    ld = LatentDictionary.from_sentiglove(str(sg), z_space=20)
    assert ld.mean_choice["fluffy"].shape == (20,)

    obj_atts = [[["dog", ["fluffy thing", "red"]], ["cat", []]]]
    emb = ld.translate_obj_atts(obj_atts, max_boxes=3)
    assert emb.shape == (1, 3, 20)
    expected = (np.repeat(np.arange(10, dtype=np.float32), 2)
                + np.repeat(-np.ones(10, np.float32), 2)) / 2
    np.testing.assert_allclose(emb[0, 0], expected)
    assert emb[0, 1].sum() == 0  # cat: no attributes
    assert emb[0, 2].sum() == 0  # padding

    swn = tmp_path / "swn.json"
    swn.write_text(json.dumps({"nice": [0.8, 0.1, 0.1]}))
    ld2 = LatentDictionary.from_swn_scores(str(swn), z_space=5)
    np.testing.assert_allclose(ld2.mean_choice["nice"], np.repeat(0.7, 5), atol=1e-6)


def test_canvas_for_aspect():
    from style_seqcvae_tpu.data.detection import canvas_for

    landscape = {"height": 480, "width": 640}
    portrait = {"height": 640, "width": 480}
    assert canvas_for(landscape, (640, 1024)) == (640, 1024)
    assert canvas_for(portrait, (640, 1024)) == (1024, 640)
    assert canvas_for(portrait, (1024, 640)) == (1024, 640)
    assert canvas_for(landscape, (1024, 640)) == (640, 1024)


def _inst_json(path, image_ids, cats, start_ann=1):
    images = [{"id": i, "file_name": f"i{i}.jpg", "height": 64, "width": 64}
              for i in image_ids]
    anns, aid = [], start_ann
    for i in image_ids:
        anns.append({"id": aid, "image_id": i, "category_id": cats[0]["id"],
                     "bbox": [4, 4, 20, 20], "area": 400, "iscrowd": 0})
        aid += 1
    path.write_text(json.dumps({"images": images, "annotations": anns,
                                "categories": cats}))
    return str(path)


def test_detection_dataset_multi_json_union(tmp_path):
    """List-of-paths = the reference's combined_roidb multi-imdb merge
    (roidb.py:88-140): de-dup by image id, consistent contiguous classes."""
    from style_seqcvae_tpu.data.detection import CocoDetectionDataset

    cats = [{"id": 3, "name": "dog"}, {"id": 9, "name": "cat"}]
    a = _inst_json(tmp_path / "a.json", [1, 2], cats, start_ann=1)
    # image 2 repeats in the second json (same id) — must not duplicate
    b = _inst_json(tmp_path / "b.json", [2, 5, 7], cats, start_ann=10)

    ds = CocoDetectionDataset([a, b])
    assert ds.image_ids == [1, 2, 5, 7]
    assert ds.classes == ["__background__", "dog", "cat"]
    assert ds.num_classes == 3
    # single-path construction unchanged
    ds_a = CocoDetectionDataset(a)
    assert ds_a.image_ids == [1, 2]
    # union record count: image 2 keeps ONLY its first-json annotation set —
    # later jsons re-number ann ids for the same boxes, so keying on
    # (image_id, ann_id) alone would double the shared image's GT
    # (round-2 regression)
    rec = ds.record(ds.image_ids.index(2))
    assert rec["boxes"].shape[0] == 1


def test_detection_dataset_union_class_table_mismatch(tmp_path):
    from style_seqcvae_tpu.data.detection import CocoDetectionDataset

    a = _inst_json(tmp_path / "a.json", [1], [{"id": 3, "name": "dog"}])
    b = _inst_json(tmp_path / "b.json", [2], [{"id": 3, "name": "cat"}])
    with pytest.raises(ValueError, match="category id 3"):
        CocoDetectionDataset([a, b])
