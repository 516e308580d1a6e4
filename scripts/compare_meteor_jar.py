#!/usr/bin/env python
"""One-shot MeteorPy-vs-jar comparison (VERDICT r2 item 6).

Measures how closely the pure-Python meteor-1.5 implementation tracks the
actual meteor-1.5 jar on a predictions file: per-image Spearman and Pearson
correlation of sentence scores plus the corpus-score delta. Requires java
and ``METEOR_JAR`` pointing at meteor-1.5.jar (the same setup the
reference's eval uses via pycocoevalcap, eval/eval.py:317-320); exits with
a clear message when the jar is unavailable (this offline image has none —
run wherever the jar exists and record the output next to the MeteorPy
docstring).

Usage:
  METEOR_JAR=/path/meteor-1.5.jar python scripts/compare_meteor_jar.py \
      --predictions preds.json --captions captions_val2014.json [--limit N]

predictions: [{"image_id", "caption"}, ...] (the inference CLI output);
captions: COCO captions JSON for the references.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _avg_ranks(x):
    """Average ranks for ties (METEOR per-image scores tie often — e.g.
    every zero-match caption scores exactly 0.0; double-argsort would
    assign them arbitrary distinct ranks and bias the coefficient)."""
    import numpy as np

    x = np.asarray(x, float)
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), float)
    i = 0
    while i < len(x):
        j = i
        while j + 1 < len(x) and x[order[j + 1]] == x[order[i]]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0
        i = j + 1
    return ranks


def spearman(a, b):
    import numpy as np

    ra = _avg_ranks(a)
    rb = _avg_ranks(b)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = float(np.sqrt((ra ** 2).sum() * (rb ** 2).sum()))
    return float((ra * rb).sum() / denom) if denom else float("nan")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--predictions", required=True)
    ap.add_argument("--captions", required=True)
    ap.add_argument("--limit", type=int, default=0,
                    help="cap the number of images scored (0 = all)")
    args = ap.parse_args()

    from style_seqcvae_tpu.evaluation.metrics import (
        MeteorJava, MeteorPy, _jvm_meteor_available)

    if not _jvm_meteor_available():
        sys.exit("meteor jar unavailable: set METEOR_JAR to meteor-1.5.jar "
                 "and ensure `java` is on PATH; nothing to compare offline.")

    import numpy as np

    preds = json.load(open(args.predictions))
    caps = json.load(open(args.captions))
    caps = caps["annotations"] if isinstance(caps, dict) else caps
    refs = {}
    for a in caps:
        refs.setdefault(a["image_id"], []).append(a["caption"])

    gts, res = {}, {}
    for p in preds:
        iid = p["image_id"]
        if iid in refs and iid not in res:
            gts[iid] = refs[iid]
            res[iid] = [p["caption"]]
        if args.limit and len(res) >= args.limit:
            break
    if not res:
        sys.exit("no predictions overlap the reference captions")

    corpus_py, per_py = MeteorPy().compute_score(gts, res)
    corpus_jar, per_jar = MeteorJava().compute_score(gts, res)

    a, b = np.asarray(per_py), np.asarray(per_jar)
    pearson = float(np.corrcoef(a, b)[0, 1]) if len(a) > 1 else float("nan")
    out = {
        "n_images": len(a),
        "corpus_meteor_py": corpus_py,
        "corpus_meteor_jar": corpus_jar,
        "corpus_delta": corpus_py - corpus_jar,
        "pearson": pearson,
        "spearman": spearman(a, b),
        "mean_abs_per_image_delta": float(np.abs(a - b).mean()),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
