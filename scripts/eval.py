#!/usr/bin/env python
"""Offline caption evaluation — CLI around the eval/eval.py port.

Computes per-z-sample means + top-1 oracle BLEU/ROUGE/CIDEr/METEOR (the
meteor-1.5 jar when configured, pure-Python exact+stem METEOR otherwise),
Div-1/2 (all and top-5-by-CIDEr) and sentiment
precision/recall/has-ANP. Consumes the same predictions JSON the inference
script writes and COCO/Senticap-style reference JSONs."""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--predictions", required=True,
                    help="predictions JSON from scripts/inference.py")
parser.add_argument("--references", required=True,
                    help="COCO-format captions JSON (annotations list)")
parser.add_argument("--wordforms", default="",
                    help="sentiment/attribute wordform TSV for style metrics")
parser.add_argument("--id-map", default="",
                    help="optional pickle mapping reference ids (senti2coco)")
parser.add_argument("--output", default="", help="optional JSON output path")


def main():
    args = parser.parse_args()
    from style_seqcvae_tpu.evaluation.eval import (
        evaluate, preprocess_coco_annots, read_wordforms)

    preds = json.load(open(args.predictions))
    refs = json.load(open(args.references))
    gts = preprocess_coco_annots(refs)
    wordforms = read_wordforms(args.wordforms) if args.wordforms else None
    id_map = pickle.load(open(args.id_map, "rb")) if args.id_map else None

    out = evaluate(preds, gts, wordforms=wordforms, id_map=id_map)
    for k, v in out.items():
        print(f"{k}: {round(v * 100, 2) if 'Div' not in k and 'senti' not in k and k != 'has_anp' else round(v, 4)}")
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
