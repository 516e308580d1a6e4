"""Detection data layer: COCO + COCO-Attributes + Senticap exclusion.

Behavioral mirror of the reference detection data stack:

* :class:`CocoDetectionDataset` — frcnn/lib/datasets/coco.py:31-246: COCO
  instances JSON with contiguous class ids, **Senticap test-image removal
  from training** (coco.py:53-57), per-annotation attribute index lists
  from the COCO-Attributes pickles (coco.py:196-246 via
  frcnn/lib/datasets/cocoatts.py), crowd filtering, box clipping.
* :func:`prepare_image` — frcnn/lib/roi_data_layer/minibatch.py:19-88:
  BGR mean subtraction, shorter-side resize to TRAIN.SCALES with
  MAX_SIZE cap; horizontal flip augmentation with box mirroring
  (imdb.append_flipped_images semantics).
* :func:`make_batch` — fixed-shape padding: images to a static canvas,
  GT boxes to MAX_NUM_GT_BOXES (roibatchLoader.py:22-239 pads similarly).
"""

from __future__ import annotations

import json
import os
import pickle
import random
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

PIXEL_MEANS_BGR = np.array([102.9801, 115.9465, 122.7717], np.float32)


class CocoDetectionDataset:
    def __init__(self, instances_jsonpath, image_root: str = "",
                 senticap_jsonpath: str = "", attribs_dir_path: str = "",
                 exclude_senticap_test: bool = True,
                 n_attribs: int = 0):
        """``instances_jsonpath``: one path or a list of paths. A list is the
        multi-imdb training union of the reference (``combined_roidb`` merges
        e.g. coco_2014_train+coco_2014_valminusminival,
        frcnn/lib/roi_data_layer/roidb.py:88-140): images de-dup by id with
        first-json-wins semantics — an image seen in an earlier json keeps
        ONLY that json's annotations (later jsons may re-number ann ids for
        the same boxes, so keying on (image_id, ann_id) alone would double
        the GT boxes of shared images) — and the category tables must agree
        on every shared id (contiguous class ids come from the sorted
        union — consistent across any subset ordering)."""
        paths = ([instances_jsonpath] if isinstance(instances_jsonpath, str)
                 else list(instances_jsonpath))
        cats: Dict[int, str] = {}
        images: Dict[int, dict] = {}
        annotations: Dict[Tuple[int, int], dict] = {}
        for path in paths:
            with open(path) as f:
                data = json.load(f)
            for c in data["categories"]:
                if c["id"] in cats and cats[c["id"]] != c["name"]:
                    raise ValueError(
                        f"category id {c['id']} is '{cats[c['id']]}' in one "
                        f"instances json but '{c['name']}' in {path} — the "
                        "union datasets must share a class table "
                        "(roidb.py:117-124 consistency check)")
                cats[c["id"]] = c["name"]
            new_ids = set()
            for im in data["images"]:
                if im["id"] not in images:
                    images[im["id"]] = im
                    new_ids.add(im["id"])
            dropped = orphaned = 0
            for ann in data["annotations"]:
                if ann["image_id"] in new_ids:
                    annotations.setdefault((ann["image_id"], ann["id"]), ann)
                elif ann["image_id"] in images:
                    dropped += 1      # image came from an EARLIER json
                else:
                    orphaned += 1     # image record missing everywhere
            if dropped:
                # First-json-wins drops every later-json annotation of an
                # already-seen image. Correct for the disjoint
                # train+valminusminival union, but if a caller ever splits
                # one image's annotations across jsons this silently loses
                # GT — make it detectable (reference combined_roidb simply
                # concatenates and has no analogous drop).
                import warnings
                warnings.warn(
                    f"{dropped} annotation(s) in {path} reference images "
                    "already provided by an earlier instances json and were "
                    "skipped (first-json-wins union)", stacklevel=2)
            if orphaned:
                import warnings
                warnings.warn(
                    f"{orphaned} annotation(s) in {path} reference image ids "
                    "with no image record in any provided instances json — "
                    "dangling annotations skipped", stacklevel=2)
        data = {"categories": [{"id": i, "name": n}
                               for i, n in sorted(cats.items())],
                "images": list(images.values()),
                "annotations": list(annotations.values())}

        cat_ids = sorted(c["id"] for c in data["categories"])
        self.classes = ["__background__"] + [
            c["name"] for c in sorted(data["categories"], key=lambda c: c["id"])]
        self.cat_id_to_class = {cid: i + 1 for i, cid in enumerate(cat_ids)}
        self.num_classes = len(self.classes)

        excluded = set()
        if exclude_senticap_test and senticap_jsonpath:
            from style_seqcvae_tpu.data.readers import SenticapReader

            excluded = SenticapReader(senticap_jsonpath, test_split=True)._image_ids

        self._images = {im["id"]: im for im in data["images"]
                        if im["id"] not in excluded}
        self._anns: Dict[int, List[dict]] = {}
        for ann in data["annotations"]:
            if ann.get("iscrowd", 0):
                continue
            if ann["image_id"] in self._images:
                self._anns.setdefault(ann["image_id"], []).append(ann)

        self.image_ids = [iid for iid in sorted(self._images) if iid in self._anns]
        self.image_root = image_root

        # per-annotation attribute index lists (frcnn cocoatts variant:
        # ann id == obj_inst; coco.py:196-246 attaches gt_atts)
        self.ann_atts: Dict[int, List[int]] = {}
        self.n_attribs = n_attribs
        self.att_counts: Optional[np.ndarray] = None
        if attribs_dir_path:
            from style_seqcvae_tpu.data.readers import CocoAttributesReader

            reader = CocoAttributesReader(attribs_dir_path)
            self.n_attribs = reader.n_attribs
            self.att_counts = reader.att_counts
            for obj_inst, attrib_inst in reader.obj_inst2attrib_inst.items():
                vec = reader.attrib_inst2attrib_vector.get(attrib_inst)
                if vec is not None:
                    idx = np.nonzero(vec)[0]
                    if len(idx):
                        self.ann_atts[obj_inst] = idx.tolist()

    def __len__(self):
        return len(self.image_ids)

    def record(self, index: int) -> Dict[str, Any]:
        image_id = self.image_ids[index]
        im = self._images[image_id]
        anns = self._anns.get(image_id, [])
        boxes, classes, atts = [], [], []
        W, H = im.get("width", 0), im.get("height", 0)
        for ann in anns:
            x, y, w, h = ann["bbox"]
            # clip like coco.py:203-210
            x1 = max(0.0, x)
            y1 = max(0.0, y)
            x2 = min(W - 1.0, x1 + max(0.0, w - 1))
            y2 = min(H - 1.0, y1 + max(0.0, h - 1))
            if ann.get("area", w * h) > 0 and x2 >= x1 and y2 >= y1:
                boxes.append([x1, y1, x2, y2])
                classes.append(self.cat_id_to_class[ann["category_id"]])
                atts.append(self.ann_atts.get(ann["id"], []))
        return {
            "image_id": image_id,
            "file_name": os.path.join(self.image_root, im.get("file_name", "")),
            "width": W, "height": H,
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "classes": np.asarray(classes, np.int32),
            "atts": atts,
        }


def load_image_bgr(path: str) -> np.ndarray:
    """Load an image as float32 BGR HWC (cv2.imread convention the
    reference uses)."""
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32)
    return img[:, :, ::-1].copy()


def prepare_image_np(img_bgr: np.ndarray, target_size: int, max_size: int
                     ) -> Tuple[np.ndarray, float]:
    """Bilinear resize in numpy (exact, no PIL quantization) — preferred."""
    img = img_bgr - PIXEL_MEANS_BGR
    h, w = img.shape[:2]
    im_size_min, im_size_max = min(h, w), max(h, w)
    scale = float(target_size) / im_size_min
    if round(scale * im_size_max) > max_size:
        scale = float(max_size) / im_size_max
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    ys = (np.arange(new_h) + 0.5) / scale - 0.5
    xs = (np.arange(new_w) + 0.5) / scale - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    out = ((img[y0][:, x0] * (1 - wy) * (1 - wx))
           + (img[y0][:, x1] * (1 - wy) * wx)
           + (img[y1][:, x0] * wy * (1 - wx))
           + (img[y1][:, x1] * wy * wx))
    return out.astype(np.float32), scale


def flip_record(record: Dict[str, Any], img: np.ndarray
                ) -> Tuple[Dict[str, Any], np.ndarray]:
    """Horizontal flip with mirrored boxes (imdb.append_flipped_images)."""
    W = img.shape[1]
    boxes = record["boxes"].copy()
    x1 = boxes[:, 0].copy()
    boxes[:, 0] = W - boxes[:, 2] - 1
    boxes[:, 2] = W - x1 - 1
    out = dict(record)
    out["boxes"] = boxes
    return out, img[:, ::-1].copy()


def canvas_for(record: Dict[str, Any], canvas_hw: Tuple[int, int]
               ) -> Tuple[int, int]:
    """Aspect-aware canvas: portrait images get the transposed canvas so
    padding waste stays low — the fixed-shape analogue of the reference's
    aspect-ratio-grouped batching (roibatchLoader.py:100-237). Two canvas
    variants → at most two XLA program specializations."""
    h, w = record.get("height", 0), record.get("width", 0)
    ch, cw = canvas_hw
    if h > w and ch < cw:
        return (cw, ch)
    if w >= h and ch > cw:
        return (cw, ch)
    return canvas_hw


def make_batch(records: List[Dict[str, Any]], images: List[np.ndarray],
               scales: List[float], canvas_hw: Tuple[int, int],
               max_gt: int, n_attribs: int) -> Dict[str, np.ndarray]:
    """Assemble a fixed-shape training batch (roibatchLoader pads to the
    batch max; here to a static canvas for XLA)."""
    B = len(records)
    H, W = canvas_hw
    out_im = np.zeros((B, H, W, 3), np.float32)
    im_info = np.zeros((B, 3), np.float32)
    gt_boxes = np.zeros((B, max_gt, 5), np.float32)
    gt_atts = np.zeros((B, max_gt, max(n_attribs, 1)), np.float32)
    num_gt = np.zeros((B,), np.int32)
    for i, (rec, img, scale) in enumerate(zip(records, images, scales)):
        h, w = img.shape[:2]
        h, w = min(h, H), min(w, W)
        out_im[i, :h, :w] = img[:h, :w]
        im_info[i] = [h, w, scale]
        n = min(len(rec["boxes"]), max_gt)
        if n:
            gt_boxes[i, :n, :4] = rec["boxes"][:n] * scale
            gt_boxes[i, :n, 4] = rec["classes"][:n]
            for g in range(n):
                for a in rec["atts"][g]:
                    if a < n_attribs:
                        gt_atts[i, g, a] = 1.0
        num_gt[i] = n
    return {"images": out_im, "im_info": im_info, "gt_boxes": gt_boxes,
            "gt_atts": gt_atts, "num_gt": num_gt}
