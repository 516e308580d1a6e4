"""Mode-2 (SENTIMENT_VAE=2, SentiGloVe attribute prior) integration: the
full stack from COCO-Attributes pickles → CocoAttributesReader →
EvaluationDatasetWithConstraints (cbs_simple attribute candidates) →
LatentDictionary → DecodeHarness CBS decode. Exercises the paper's core
"grounded style" mode end-to-end."""

import json
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_seqcvae_tpu.data.config_attrib_selection import attrib_selection
from style_seqcvae_tpu.data.datasets import EvaluationDatasetWithConstraints
from style_seqcvae_tpu.data.latents import LatentDictionary
from style_seqcvae_tpu.data.readers import CocoAttributesReader
from style_seqcvae_tpu.data.vocabulary import BOUNDARY_TOKEN, UNK_TOKEN, Vocabulary
from style_seqcvae_tpu.decoding.harness import DecodeHarness, detokenize
from style_seqcvae_tpu.models.captioner import CaptionerConfig, init_captioner
from style_seqcvae_tpu.preprocessing import build_attribute_index
from style_seqcvae_tpu.utils.features_io import FeaturesWriter, pack_obj_atts

N_IMAGES = 25
SELECTED = [k for k, v in attrib_selection.items() if v][:2]   # two real names
CLEANED = [(k.split(" ")[-1] or k.split(" ")[-2]) for k in SELECTED]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mode2")
    rng = np.random.RandomState(0)

    # COCO-Attributes pickles: every image has a dog with both attributes
    all_names = list(attrib_selection.keys())
    sel_global = [all_names.index(k) for k in SELECTED]
    instances = {"categories": [{"id": 1, "name": "dog"}, {"id": 2, "name": "cat"}],
                 "annotations": []}
    ann_vecs, patch2ann = {}, {}
    aid = 1000
    for iid in range(N_IMAGES):
        instances["annotations"].append(
            {"id": iid * 10, "image_id": iid, "category_id": 1})
        v = np.zeros(len(all_names), np.float32)
        v[sel_global[0]] = 0.9
        v[sel_global[1]] = 0.6
        ann_vecs[aid] = v
        patch2ann[aid] = iid * 10
        aid += 1
    cocottributes = {"ann_vecs": ann_vecs, "patch_id_to_ann_id": patch2ann,
                     "attributes": [{"id": i, "name": n}
                                    for i, n in enumerate(all_names)]}
    attribs_dir = str(root / "attribs")
    build_attribute_index([instances], cocottributes, attribs_dir)

    # features.h5: GT obj_atts stream in the reader's post-pruning space
    reader = CocoAttributesReader(attribs_dir)
    assert reader.n_attribs >= 2, "selected attributes must survive pruning"
    att_idx = [reader.attrib_names.index(k) for k in SELECTED]
    h5 = str(root / "features.h5")
    w = FeaturesWriter(h5, N_IMAGES)
    for iid in range(N_IMAGES):
        feats = rng.randn(4, 16).astype(np.float32)
        # one packed object per box (the reader falls back to empty atts on
        # a count mismatch, readers.py:131-134)
        oa = pack_obj_atts([1, 2, 1, 2], [att_idx, [], [att_idx[0]], []])
        w.write(iid, iid, feats, oa, np.zeros((0,), np.float32))
    w.close()

    # senticap json marking all images as test split (drives _image_ids)
    senticap = {"images": [
        {"filename": f"COCO_val2014_{iid:012d}.jpg", "split": "test",
         "sentences": [{"raw": "a nice dog", "sentiment": 1}]}
        for iid in range(N_IMAGES)]}
    senticap_path = str(root / "senticap.json")
    json.dump(senticap, open(senticap_path, "w"))

    # attribute wordform TSV keyed by CLEANED attribute names
    wf = str(root / "wordforms_attribs.tsv")
    with open(wf, "w") as f:
        for name in CLEANED:
            f.write(f"{name}\t{name}\n")

    # sentiglove latent dictionary keyed by attribute FIRST words
    sg = str(root / "sentiglove10.pkl")
    table = {k.split(" ")[0]: rng.randn(10).astype(np.float32) for k in SELECTED}
    pickle.dump(table, open(sg, "wb"))

    # the reader's obj_id2name list for obj_atts_id2string (index = class id)
    obj_id2name = ["bg", "dog", "cat"]
    return dict(attribs_dir=attribs_dir, h5=h5, senticap=senticap_path,
                wordforms=wf, sentiglove=sg, obj_id2name=obj_id2name)


def test_mode2_dataset_and_decode(corpus):
    vocab_tokens = [UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog", "cat", "nice"] + CLEANED
    vocab = Vocabulary(vocab_tokens)

    ds = EvaluationDatasetWithConstraints(
        vocabulary=vocab,
        val_image_features_h5path=corpus["h5"],
        do_load_senticap=True,
        senticap_jsonpath=corpus["senticap"],
        sentiment="pos",
        attribs_dir_path=corpus["attribs_dir"],
        wordforms_attribs_tsvpath=corpus["wordforms"],
        n_z_samples=2, state_machine_per_z_sample=True,
        max_boxes=4, cbs_simple=True,
        obj_id2name=corpus["obj_id2name"])

    assert len(ds) == N_IMAGES
    item = ds[0]
    # obj_atts mapped to name form; dog carries the selected attribute names
    names = {a for o in item["obj_atts"] for a in o[1]}
    assert set(SELECTED) <= names
    # cbs_simple candidates: one random CLEANED attribute per object
    assert 1 <= item["num_constraints"][0] <= 3
    batch = ds.collate_fn([item])

    # latent dictionary → per-box attribute embeddings
    cfg = CaptionerConfig(vocab_size=vocab.get_vocab_size(), image_feature_size=16,
                          embedding_size=300, hidden_size=8,
                          attention_projection_size=4, z_space=10,
                          sentiment_vae=2, simple_vae=False,
                          latent_embedding="glove", max_caption_length=7,
                          beam_size=2, use_cbs=True)
    ld = LatentDictionary.from_sentiglove(corpus["sentiglove"], cfg.z_space)
    oae = ld.translate_obj_atts(batch["obj_atts"], max_boxes=4)
    assert oae.shape == (1, 4, 10)
    assert np.abs(oae[0, 0]).sum() > 0      # dog box has a latent mean
    assert np.abs(oae[0, 1]).sum() == 0     # cat box has none

    params = init_captioner(jax.random.PRNGKey(0), cfg)
    harness = DecodeHarness(params, cfg)
    best, lp = harness.decode_cbs(
        batch["image_features"], batch["sentiment"], jnp.asarray(oae),
        batch["fsm_tables"], batch["num_constraints"], jax.random.PRNGKey(1),
        n_z=2)
    assert best.shape == (2, 1, 7)
    captions = [detokenize(best[z, 0], vocab, cfg.boundary_index) for z in range(2)]
    # constraint: the selected attribute wordform must appear when
    # num_constraints >= 1 and min-to-satisfy selection picked a valid state
    joined = " ".join(captions)
    assert any(c in joined for c in CLEANED), (captions, CLEANED)


def test_grounded_mode_candidates_and_selection(corpus):
    """cbs_simple=False: object+attribute candidate mixing
    (datasets.py:527-577) + grounded beam selection end-to-end."""
    import random

    from style_seqcvae_tpu.decoding.select import select_best_beam_with_constraints

    vocab_tokens = [UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog", "cat", "nice"] + CLEANED
    vocab = Vocabulary(vocab_tokens)
    ds = EvaluationDatasetWithConstraints(
        vocabulary=vocab,
        val_image_features_h5path=corpus["h5"],
        do_load_senticap=True,
        senticap_jsonpath=corpus["senticap"],
        sentiment="pos",
        attribs_dir_path=corpus["attribs_dir"],
        wordforms_attribs_tsvpath=corpus["wordforms"],
        n_z_samples=2, state_machine_per_z_sample=True,
        max_boxes=4, cbs_simple=False,
        rng=random.Random(0),
        obj_id2name=corpus["obj_id2name"])

    item = ds[0]
    # grounded candidates are [object, [attrs]] pairs from image_attributes
    cands = item["candidates"][0]
    assert all(isinstance(c, list) and len(c) == 2 for c in cands)
    assert item["num_constraints"][0] >= 1
    batch = ds.collate_fn([item])

    cfg = CaptionerConfig(vocab_size=vocab.get_vocab_size(), image_feature_size=16,
                          embedding_size=300, hidden_size=8,
                          attention_projection_size=4, z_space=10,
                          sentiment_vae=2, simple_vae=False,
                          latent_embedding="glove", max_caption_length=7,
                          beam_size=2, use_cbs=True, cbs_simple=False,
                          min_constraints_to_satisfy=1)
    ld = LatentDictionary.from_sentiglove(corpus["sentiglove"], cfg.z_space)
    oae = ld.translate_obj_atts(batch["obj_atts"], max_boxes=4)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    harness = DecodeHarness(params, cfg)
    seqs, lp = harness.decode_cbs(
        batch["image_features"], batch["sentiment"], jnp.asarray(oae),
        batch["fsm_tables"], batch["num_constraints"], jax.random.PRNGKey(1),
        n_z=2, return_all=True)
    # grounded selection over the first z-sample's beams — the constraint
    # names here are attributes only (candidates carry empty obj wordforms),
    # so pick a valid state via the algebra without crashing and return a
    # beam with finite log-prob when one exists
    best, valid = select_best_beam_with_constraints(
        seqs[0], lp[0], [int(batch["num_constraints"][0])],
        [batch["candidates"][0]], [batch["constraint2states"][0]],
        min_constraints_to_satisfy=1, cbs_simple=True)
    assert best.shape == (1, 7)


def test_grounded_mode_batched_group_decode(corpus):
    """Two images in one dispatch, grounded mode: per-image FSM lists stack
    through pad_tables_batch and the grounded host selection consumes the
    full (B, S, K, T) beams per z."""
    import random

    from style_seqcvae_tpu.decoding.select import select_best_beam_with_constraints

    vocab_tokens = [UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog", "cat", "nice"] + CLEANED
    vocab = Vocabulary(vocab_tokens)
    ds = EvaluationDatasetWithConstraints(
        vocabulary=vocab,
        val_image_features_h5path=corpus["h5"],
        do_load_senticap=True,
        senticap_jsonpath=corpus["senticap"],
        sentiment="pos",
        attribs_dir_path=corpus["attribs_dir"],
        wordforms_attribs_tsvpath=corpus["wordforms"],
        n_z_samples=2, state_machine_per_z_sample=True,
        max_boxes=4, cbs_simple=False,
        rng=random.Random(0),
        obj_id2name=corpus["obj_id2name"])

    items = [ds[0], ds[0]]
    batches = [ds.collate_fn([it]) for it in items]
    cfg = CaptionerConfig(vocab_size=vocab.get_vocab_size(), image_feature_size=16,
                          embedding_size=300, hidden_size=8,
                          attention_projection_size=4, z_space=10,
                          sentiment_vae=2, simple_vae=False,
                          latent_embedding="glove", max_caption_length=7,
                          beam_size=2, use_cbs=True, cbs_simple=False,
                          min_constraints_to_satisfy=1)
    ld = LatentDictionary.from_sentiglove(corpus["sentiglove"], cfg.z_space)
    oae = np.concatenate([ld.translate_obj_atts(b["obj_atts"], max_boxes=4)
                          for b in batches])
    feats = np.concatenate([b["image_features"] for b in batches])
    sentiment = np.concatenate([b["sentiment"] for b in batches])
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    harness = DecodeHarness(params, cfg)

    tables = [list(b["fsm_tables"]) for b in batches]
    ncs = np.asarray([int(b["num_constraints"][0]) for b in batches])
    seqs, lp = harness.decode_cbs(feats, sentiment, jnp.asarray(oae),
                                  tables, ncs, jax.random.PRNGKey(1),
                                  n_z=2, return_all=True)
    assert seqs.shape[0] == 2 and seqs.shape[1] == 2       # (Z, B, S, K, T)
    best, valid = select_best_beam_with_constraints(
        seqs[0], lp[0], [int(n) for n in ncs],
        [b["candidates"][0] for b in batches],
        [b["constraint2states"][0] for b in batches],
        min_constraints_to_satisfy=1, cbs_simple=True)
    assert best.shape == (2, 7)
    # z-noise is drawn per batch row, so the two copies differ; the whole
    # batched decode must still be key-deterministic end to end
    seqs2, lp2 = harness.decode_cbs(feats, sentiment, jnp.asarray(oae),
                                    tables, ncs, jax.random.PRNGKey(1),
                                    n_z=2, return_all=True)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(seqs2))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2))


def test_mode2_device_corpus_table_and_step_equivalence(corpus, tmp_path):
    """--device-corpus mode-2 (round 5): the per-image obj_att_embed table
    gathered by feat_idx inside the compiled step must reproduce the host
    path exactly — same embeds per image, and a corpus train step with
    dict tables bit-matches the host train step on materialized
    features + embeds (lifting round 4's mode-2 host-features fallback)."""
    from style_seqcvae_tpu.config import Config
    from style_seqcvae_tpu.data.datasets import TrainingDataset
    from style_seqcvae_tpu.models.captioner import CaptionerConfig, init_captioner
    from style_seqcvae_tpu.training.optimizer import make_captioner_optimizer
    from style_seqcvae_tpu.training.trainer import (
        TrainState, make_corpus_train_step, make_train_step)

    caps = {"annotations": [
        {"id": i + 1, "image_id": i % 6, "caption": "a nice dog"}
        for i in range(12)]}
    caps_path = tmp_path / "caps.json"
    caps_path.write_text(json.dumps(caps))

    vocab = Vocabulary([UNK_TOKEN, BOUNDARY_TOKEN, "a", "dog", "nice"])
    ds = TrainingDataset(
        vocabulary=vocab, captions_jsonpath=str(caps_path),
        image_features_h5path=corpus["h5"],
        attribs_dir_path=corpus["attribs_dir"],
        max_caption_length=6, max_boxes=4,
        obj_id2name=corpus["obj_id2name"])
    ld = LatentDictionary.from_sentiglove(corpus["sentiglove"], 10)

    table, row_of = ds.feature_table()
    oae_table = ds.obj_att_embed_table(ld, row_of)

    # per-image: table row == host translate of the item's obj_atts
    import random
    batch = next(ds.batches(4, rng=random.Random(0)))
    host_oae = ld.translate_obj_atts(batch["obj_atts"], 4)
    idx = np.asarray([row_of[int(i)] for i in batch["image_id"]], np.int32)
    np.testing.assert_allclose(oae_table[idx], host_oae, atol=0)
    np.testing.assert_allclose(table[idx], batch["image_features"], atol=0)

    # one train step: corpus dict-table gather == host batch
    cfg = CaptionerConfig(vocab_size=vocab.get_vocab_size(),
                          image_feature_size=16, embedding_size=8,
                          hidden_size=8, attention_projection_size=4,
                          z_space=10, sentiment_vae=2, simple_vae=False,
                          latent_embedding="glove", max_caption_length=6)
    config = Config(config_override=["OPTIM.NUM_ITERATIONS", "10"])
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    tx = make_captioner_optimizer(config, params, cfg.tie_embeddings)

    def fresh_state():
        return TrainState(params=jax.tree_util.tree_map(jnp.copy, params),
                          opt_state=tx.init(params),
                          rng=jax.random.PRNGKey(5))

    host_batch = {"image_features": jnp.asarray(batch["image_features"]),
                  "caption_tokens": jnp.asarray(batch["caption_tokens"]),
                  "sentiment": jnp.asarray(batch["sentiment"]),
                  "obj_att_embeds": jnp.asarray(host_oae)}
    s1, m1 = make_train_step(tx, cfg, 750.0)(fresh_state(), host_batch)

    corpus_batch = {"feat_idx": jnp.asarray(idx),
                    "caption_tokens": jnp.asarray(batch["caption_tokens"]),
                    "sentiment": jnp.asarray(batch["sentiment"])}
    tables = {"image_features": jnp.asarray(table),
              "obj_att_embeds": jnp.asarray(oae_table)}
    s2, m2 = make_corpus_train_step(tx, cfg, 750.0)(fresh_state(), tables,
                                                    corpus_batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
