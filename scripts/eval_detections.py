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
parser.add_argument("--vis-dir", default="",
                    help="draw boxes onto each image named in the "
                         "detections (requires --image-root) and save "
                         "annotated PNGs here (net_utils.py:50-60)")
parser.add_argument("--image-root", default="",
                    help="directory holding the raw images for --vis-dir")
parser.add_argument("--vis-thresh", type=float, default=0.5)


def main():
    args = parser.parse_args()
    if args.vis_dir and not args.image_root:
        parser.error("--vis-dir needs --image-root (without it every image "
                     "path check fails and zero PNGs are written)")
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

    if args.vis_dir:
        import numpy as np
        from PIL import Image

        from style_seqcvae_tpu.utils.visualize import vis_image_detections

        os.makedirs(args.vis_dir, exist_ok=True)
        names = {c["id"]: c["name"] for c in gt["categories"]}
        # id-indexed list for vis_image_detections (COCO ids are sparse)
        names_list = [names.get(i, str(i))
                      for i in range(max(names, default=0) + 1)]
        files = {im["id"]: im.get("file_name", f"{im['id']}.jpg")
                 for im in gt.get("images", [])}
        by_image = {}
        for d in dets:
            by_image.setdefault(d["image_id"], []).append(d)
        n_written = n_missing = 0
        for image_id, img_dets in by_image.items():
            path = os.path.join(args.image_root, files.get(image_id, ""))
            if not os.path.isfile(path):
                n_missing += 1
                continue
            img = np.asarray(Image.open(path).convert("RGB"))
            boxes = np.asarray([[d["bbox"][0], d["bbox"][1],
                                 d["bbox"][0] + d["bbox"][2],
                                 d["bbox"][1] + d["bbox"][3]]
                                for d in img_dets], np.float32)
            scores = np.asarray([d["score"] for d in img_dets], np.float32)
            labels = np.asarray([d["category_id"] for d in img_dets])
            out_img = vis_image_detections(img, boxes, scores, labels,
                                           names_list, thresh=args.vis_thresh)
            Image.fromarray(out_img).save(
                os.path.join(args.vis_dir, f"{image_id}.png"))
            n_written += 1
        print(f"wrote {n_written} visualization(s) to {args.vis_dir}"
              + (f" ({n_missing} image file(s) not found under "
                 f"{args.image_root})" if n_missing else ""))


if __name__ == "__main__":
    main()
