#!/usr/bin/env python
"""Model-vs-random-vs-retrieval comparison through the SAME eval battery.

VERDICT r4 ("make the synthetic eval numbers mean something"): a metric
table only proves learning if trivial baselines score clearly lower. This
script evaluates, against the neutral test references:

* **model**     — the pipeline's own predictions (``preds_neutral.json``)
* **random**    — for each test image, captions drawn uniformly from the
  TRAIN caption pool of OTHER images (matched caption count per image):
  fluent in-domain language, zero image grounding
* **retrieval** — nearest-TRAIN-image by mean extracted feature vector
  (cosine), using that train image's reference captions: the classic
  non-parametric captioner; beating it requires compositional generation,
  not just feature matching

All three run through ``style_seqcvae_tpu.evaluation.eval.evaluate`` (the
eval/eval.py port) so every number is directly comparable.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--world", required=True, help="make_world.py output dir")
parser.add_argument("--run", required=True, help="three_stage.sh run dir")
parser.add_argument("--n-z", type=int, default=20)
parser.add_argument("--seed", type=int, default=0)
parser.add_argument("--output", default="")


def mean_feature_index(h5path):
    from style_seqcvae_tpu.utils.features_io import FeaturesReader

    reader = FeaturesReader(h5path)
    ids, vecs = [], []
    for iid in reader.image_ids:
        feats, _ = reader[iid]
        v = feats.mean(axis=0)
        n = np.linalg.norm(v) + 1e-8
        ids.append(iid)
        vecs.append(v / n)
    return ids, np.stack(vecs)


def main():
    args = parser.parse_args()
    from style_seqcvae_tpu.evaluation.eval import (
        evaluate, preprocess_coco_annots)

    rng = np.random.RandomState(args.seed)
    refs_test = json.load(open(os.path.join(args.world, "captions_test.json")))
    gts = preprocess_coco_annots(refs_test)
    test_ids = sorted(gts.keys())

    train_caps = json.load(
        open(os.path.join(args.world, "captions_train.json")))["annotations"]
    by_train_image = {}
    for a in train_caps:
        by_train_image.setdefault(a["image_id"], []).append(a["caption"])
    pool = [(a["image_id"], a["caption"]) for a in train_caps]

    # --- random: train captions of other images, n_z per test image ---
    random_preds = []
    for iid in test_ids:
        picks = rng.randint(0, len(pool), size=args.n_z)
        for p in picks:
            random_preds.append({"image_id": iid, "caption": pool[p][1]})

    # --- retrieval: nearest train image by mean extracted feature ---
    tr_ids, tr_vecs = mean_feature_index(
        os.path.join(args.run, "features_train.h5"))
    te_ids, te_vecs = mean_feature_index(
        os.path.join(args.run, "features_test.h5"))
    te_pos = {iid: i for i, iid in enumerate(te_ids)}
    retrieval_preds = []
    nn_of = {}
    for iid in test_ids:
        sims = tr_vecs @ te_vecs[te_pos[iid]]
        nn = tr_ids[int(np.argmax(sims))]
        nn_of[iid] = nn
        caps = by_train_image[nn]
        for z in range(args.n_z):
            retrieval_preds.append({"image_id": iid,
                                    "caption": caps[z % len(caps)]})

    # grounding precision/recall: content words (shape nouns + attribute
    # adjectives) vs the image's KNOWN scene (world.json). On a closed
    # template grammar every fluent caption matches the function-word
    # n-grams, so BLEU saturates for random text too — grounding precision
    # is the metric that separates "describes THIS image" from "fluent
    # about some image" (and grounding is the paper's actual claim).
    world = json.load(open(os.path.join(args.world, "world.json")))
    content = set(world["shapes"]) | set(world["attrs"])

    def grounding(preds):
        import collections

        by_img = collections.defaultdict(list)
        for p in preds:
            by_img[p["image_id"]].append(p["caption"])
        hit = tot = ref_hit = ref_tot = 0
        for iid, caps in by_img.items():
            scene = world["images"][str(iid)]["scene"]
            truth = ({o["shape"] for o in scene}
                     | {a for o in scene for a in o["attrs"]})
            mentioned = set()
            for c in caps:
                words = set(c.split()) & content
                tot += len(words)
                hit += len(words & truth)
                mentioned |= words
            ref_tot += len(truth)
            ref_hit += len(truth & mentioned)
        return (hit / max(tot, 1), ref_hit / max(ref_tot, 1))

    out = {}
    model_path = os.path.join(args.run, "preds_neutral.json")
    if os.path.exists(model_path):
        model_preds = json.load(open(model_path))
        out["model"] = evaluate(model_preds, gts)
        out["model"]["grounding_P"], out["model"]["grounding_R"] = grounding(
            model_preds)
    out["random"] = evaluate(random_preds, gts)
    out["random"]["grounding_P"], out["random"]["grounding_R"] = grounding(
        random_preds)
    out["retrieval"] = evaluate(retrieval_preds, gts)
    (out["retrieval"]["grounding_P"],
     out["retrieval"]["grounding_R"]) = grounding(retrieval_preds)

    # evaluate() naming follows the reference: "B4" is the top-1 ORACLE
    # re-score, "mean B4" the per-z mean (eval.py:350-437)
    keys = ["mean B4", "B4", "mean cider", "cider", "Div-1", "Div-2",
            "grounding_P", "grounding_R"]
    header = "system     " + "".join(f"{k:>13}" for k in keys)
    print(header)
    for name in ("model", "random", "retrieval"):
        if name in out:
            row = "".join(f"{out[name].get(k, float('nan')):13.4f}"
                          for k in keys)
            print(f"{name:<11}{row}")
    if args.output:
        json.dump(out, open(args.output, "w"), indent=1)


if __name__ == "__main__":
    main()
