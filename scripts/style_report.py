#!/usr/bin/env python
"""Sentiment-control (style) battery over the pipeline's decoded captions.

The paper's core claim is that the Style-SeqCVAE latent prior CONTROLS
sentiment (reference eval/eval.py:95-131 measures sentiment precision/
recall/has-ANP; inference conditions via DATA.SENTICAP_SENTIMENT,
var_updown/scripts/inference.py + datasets.py:323-328). This report makes
the control measurable:

* per-run lexicon rates — the fraction of decoded captions containing a
  pos / neg lexicon word for each conditioning (pos / neg / neutral runs)
* crossover — pos-conditioned captions emitting NEG words and vice versa
* control margins — rate(conditioned) − rate(neutral), the quantity the
  gated slow test asserts on
* the eval_style precision/recall/has-ANP numbers vs the polarity-matched
  references (re-computed here so the report is self-contained)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--world", required=True)
parser.add_argument("--run", required=True)
parser.add_argument("--output", default="")


def lexicon_rates(preds, pos_words, neg_words):
    n = len(preds)
    n_pos = n_neg = 0
    for p in preds:
        toks = set(p["caption"].split())
        n_pos += bool(toks & pos_words)
        n_neg += bool(toks & neg_words)
    return {"captions": n,
            "pos_rate": n_pos / n if n else 0.0,
            "neg_rate": n_neg / n if n else 0.0}


def main():
    args = parser.parse_args()
    from style_seqcvae_tpu.evaluation.eval import (
        eval_style, preprocess_coco_annots, preprocess_updown_output,
        read_wordforms)

    world = json.load(open(os.path.join(args.world, "world.json")))
    pos_words, neg_words = set(world["pos_words"]), set(world["neg_words"])
    wordforms = read_wordforms(
        os.path.join(args.world, "wordforms_senti.tsv"))

    report = {"runs": {}}
    for name in ("pos", "neg", "neutral", "cbs_pos", "pos_topp"):
        path = os.path.join(args.run, f"preds_{name}.json")
        if not os.path.exists(path):
            continue
        preds = json.load(open(path))
        report["runs"][name] = lexicon_rates(preds, pos_words, neg_words)

    r = report["runs"]
    if {"pos", "neg", "neutral"} <= set(r):
        report["control"] = {
            "pos_margin": r["pos"]["pos_rate"] - r["neutral"]["pos_rate"],
            "neg_margin": r["neg"]["neg_rate"] - r["neutral"]["neg_rate"],
            "pos_crossover": r["pos"]["neg_rate"],
            "neg_crossover": r["neg"]["pos_rate"],
        }

    # eval_style P/R/has-ANP vs polarity-matched references
    for name, ref_file in (("pos", "captions_test_pos.json"),
                           ("neg", "captions_test_neg.json")):
        path = os.path.join(args.run, f"preds_{name}.json")
        ref_path = os.path.join(args.world, ref_file)
        if not (os.path.exists(path) and os.path.exists(ref_path)):
            continue
        gts = preprocess_coco_annots(json.load(open(ref_path)))
        res, gts2 = preprocess_updown_output(json.load(open(path)), gts)
        p, rec, anp = eval_style(gts2, res, wordforms)
        report["runs"][name].update(
            {"senti_prec": p, "senti_rec": rec, "has_anp": anp})

    print(json.dumps(report, indent=1))
    if args.output:
        json.dump(report, open(args.output, "w"), indent=1)


if __name__ == "__main__":
    main()
