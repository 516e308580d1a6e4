"""Golden cross-check of evaluation/detection_eval.py against the
reference's vendored pure-Python COCOeval
(/root/reference/frcnn/lib/pycocotools/cocoeval.py:1-452) — the exact code
`imdb.evaluate_detections` runs (frcnn/test_net.py:560-567).

The vendored module is loaded as an oracle with two test-side shims:

* ``mask.iou`` (the only Cython dependency on the bbox path,
  cocoeval.py:194) is replaced by a numpy xywh IoU with COCO crowd
  semantics (inter/det_area for crowd GT).
* three mechanical py2→py3 source fixes (``filter``+``len``, removed
  ``np.float`` alias, float ``linspace`` num) that do not change semantics.

Random boxes/scores, multiple images and categories; AP / AP50 / AP75 and
the per-class APs must agree to 1e-6 (VERDICT r2 item 5)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

COCOEVAL_PATH = "/root/reference/frcnn/lib/pycocotools/cocoeval.py"

if not os.path.exists(COCOEVAL_PATH):
    pytest.skip("reference mount (/root/reference) not available — the "
                "golden oracle lives there", allow_module_level=True)


def _bbox_iou_xywh(d, g, iscrowd):
    """numpy stand-in for pycocotools mask.iou on bbox lists: (D, G)
    IoU; crowd GT divides by the detection area only (maskApi.c bbIou)."""
    d = np.asarray(d, np.float64).reshape(-1, 4)
    g = np.asarray(g, np.float64).reshape(-1, 4)
    dx2, dy2 = d[:, 0] + d[:, 2], d[:, 1] + d[:, 3]
    gx2, gy2 = g[:, 0] + g[:, 2], g[:, 1] + g[:, 3]
    iw = np.clip(np.minimum(dx2[:, None], gx2[None, :])
                 - np.maximum(d[:, None, 0], g[None, :, 0]), 0, None)
    ih = np.clip(np.minimum(dy2[:, None], gy2[None, :])
                 - np.maximum(d[:, None, 1], g[None, :, 1]), 0, None)
    inter = iw * ih
    da = (d[:, 2] * d[:, 3])[:, None]
    ga = (g[:, 2] * g[:, 3])[None, :]
    crowd = np.asarray([bool(c) for c in iscrowd], bool)[None, :]
    union = np.where(crowd, da, da + ga - inter)
    return inter / np.maximum(union, 1e-12)


def _load_reference_cocoeval():
    """Load the vendored cocoeval.py with the mask shim + py3 fixes."""
    with open(COCOEVAL_PATH) as f:
        src = f.read()
    # mechanical py2→py3 compatibility (semantics-preserving)
    src = src.replace("E = filter(None, E)", "E = list(filter(None, E))")
    src = src.replace("dtype=np.float", "dtype=float")
    src = src.replace("np.array(gtind)", "np.array(gtind, dtype=int)")
    src = src.replace(
        "np.linspace(.5, 0.95, np.round((0.95-.5)/.05)+1, endpoint=True)",
        "np.linspace(.5, 0.95, int(np.round((0.95-.5)/.05))+1, endpoint=True)")
    src = src.replace(
        "np.linspace(.0, 1.00, np.round((1.00-.0)/.01)+1, endpoint=True)",
        "np.linspace(.0, 1.00, int(np.round((1.00-.0)/.01))+1, endpoint=True)")

    pkg = types.ModuleType("_refcoco")
    pkg.__path__ = []
    mask_mod = types.ModuleType("_refcoco.mask")
    mask_mod.iou = _bbox_iou_xywh
    sys.modules["_refcoco"] = pkg
    sys.modules["_refcoco.mask"] = mask_mod
    mod = types.ModuleType("_refcoco.cocoeval")
    mod.__package__ = "_refcoco"
    sys.modules["_refcoco.cocoeval"] = mod
    exec(compile(src, COCOEVAL_PATH, "exec"), mod.__dict__)
    return mod


class _FakeCOCO:
    """Minimal COCO-API stand-in: just the four methods COCOeval calls
    (getImgIds/getCatIds/getAnnIds/loadAnns) over an annotation list."""

    def __init__(self, anns):
        self.anns = {}
        for i, a in enumerate(anns):
            a = dict(a)
            a.setdefault("id", i + 1)
            a.setdefault("iscrowd", 0)
            a.setdefault("area", float(a["bbox"][2]) * float(a["bbox"][3]))
            self.anns[a["id"]] = a

    def getAnnIds(self, imgIds=None, catIds=None):
        im = set(np.asarray(imgIds).tolist()) if imgIds is not None else None
        ca = set(np.asarray(catIds).tolist()) if catIds is not None else None
        return [i for i, a in sorted(self.anns.items())
                if (im is None or a["image_id"] in im)
                and (ca is None or a["category_id"] in ca)]

    def loadAnns(self, ids):
        return [self.anns[i] for i in ids]

    def getImgIds(self):
        return sorted({a["image_id"] for a in self.anns.values()})

    def getCatIds(self):
        return sorted({a["category_id"] for a in self.anns.values()})


def _random_scene(seed, n_images=6, n_cats=4, gts_per=5, dets_per=12):
    rng = np.random.RandomState(seed)
    gt, dt = [], []
    for img in range(1, n_images + 1):
        for _ in range(gts_per):
            cid = int(rng.randint(1, n_cats + 1))
            x, y = rng.uniform(0, 200, 2)
            w, h = rng.uniform(20, 120, 2)
            gt.append({"image_id": img, "category_id": cid,
                       "bbox": [float(x), float(y), float(w), float(h)]})
        for _ in range(dets_per):
            if rng.rand() < 0.6 and gt:
                # perturbations of a random GT box → realistic TP/FP mix
                base = gt[rng.randint(len(gt))]
                bx = [c + float(j) for c, j in
                      zip(base["bbox"], rng.uniform(-15, 15, 4))]
                cid = base["category_id"] if rng.rand() < 0.8 else \
                    int(rng.randint(1, n_cats + 1))
                dt.append({"image_id": img, "category_id": cid,
                           "bbox": [bx[0], bx[1], max(bx[2], 1.0),
                                    max(bx[3], 1.0)],
                           "score": float(rng.rand())})
            else:
                x, y = rng.uniform(0, 250, 2)
                w, h = rng.uniform(10, 100, 2)
                dt.append({"image_id": img,
                           "category_id": int(rng.randint(1, n_cats + 1)),
                           "bbox": [float(x), float(y), float(w), float(h)],
                           "score": float(rng.rand())})
    return gt, dt


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_map_matches_vendored_cocoeval(seed, capsys):
    from style_seqcvae_tpu.evaluation.detection_eval import evaluate_detections

    ref = _load_reference_cocoeval()
    gt, dt = _random_scene(seed)
    cat_ids = sorted({g["category_id"] for g in gt})

    ours = evaluate_detections(dt, gt, cat_ids, max_dets=100)

    E = ref.COCOeval(_FakeCOCO(gt), _FakeCOCO(dt))
    E.evaluate()
    E.accumulate()
    capsys.readouterr()  # swallow COCOeval's prints

    # precision tensor: (T, R, K, A, M); area 'all'=0, maxDets 100=index 2
    prec = E.eval["precision"][:, :, :, 0, 2]
    valid = prec > -1
    ref_map = prec[valid].mean()
    ref_ap50 = prec[0][valid[0]].mean()
    ref_ap75 = prec[5][valid[5]].mean()

    np.testing.assert_allclose(ours["mAP"], ref_map, atol=1e-6)
    np.testing.assert_allclose(ours["AP50"], ref_ap50, atol=1e-6)
    np.testing.assert_allclose(ours["AP75"], ref_ap75, atol=1e-6)

    # per-class: average precision over (T, R) for each category column
    for k, cid in enumerate(sorted(E.params.catIds)):
        col = prec[:, :, k]
        if not (col > -1).any():
            continue
        np.testing.assert_allclose(ours["AP_per_class"][cid],
                                   col[col > -1].mean(), atol=1e-6,
                                   err_msg=f"category {cid}")


def test_crowd_free_identity_with_duplicates():
    """Duplicate detections of one GT: exactly one TP per IoU threshold,
    matching COCOeval's greedy best-IoU assignment."""
    from style_seqcvae_tpu.evaluation.detection_eval import evaluate_detections

    ref = _load_reference_cocoeval()
    gt = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50]}]
    dt = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50],
           "score": 0.9},
          {"image_id": 1, "category_id": 1, "bbox": [12, 12, 50, 50],
           "score": 0.8},
          {"image_id": 1, "category_id": 1, "bbox": [11, 9, 52, 48],
           "score": 0.7}]
    ours = evaluate_detections(dt, gt, [1])
    E = ref.COCOeval(_FakeCOCO(gt), _FakeCOCO(dt))
    E.evaluate()
    E.accumulate()
    prec = E.eval["precision"][:, :, :, 0, 2]
    np.testing.assert_allclose(ours["mAP"], prec[prec > -1].mean(), atol=1e-6)
