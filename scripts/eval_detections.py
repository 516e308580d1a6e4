#!/usr/bin/env python
"""Detection evaluation CLI — the ``evaluate_detections`` stage of
frcnn/test_net.py:560-567 (COCO mAP via the COCOeval protocol)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser(description=__doc__)
parser.add_argument("--detections", required=True,
                    help="COCO results JSON from extract_features.py")
parser.add_argument("--instances-json", required=True,
                    help="COCO instances JSON with ground-truth annotations")
parser.add_argument("--output", default="")


def main():
    args = parser.parse_args()
    from style_seqcvae_tpu.evaluation.detection_eval import evaluate_detections

    dets = json.load(open(args.detections))
    gt = json.load(open(args.instances_json))
    cat_ids = [c["id"] for c in gt["categories"]]
    anns = [a for a in gt["annotations"] if not a.get("iscrowd", 0)]
    out = evaluate_detections(dets, anns, cat_ids)
    print(f"mAP@[.5:.95]: {out['mAP']:.4f}")
    print(f"AP50:         {out['AP50']:.4f}")
    print(f"AP75:         {out['AP75']:.4f}")
    for cid, ap in sorted(out["AP_per_class"].items()):
        name = next((c["name"] for c in gt["categories"] if c["id"] == cid), cid)
        print(f"  {name}: {ap:.4f}")
    if args.output:
        json.dump({k: v for k, v in out.items()}, open(args.output, "w"), indent=1)


if __name__ == "__main__":
    main()
