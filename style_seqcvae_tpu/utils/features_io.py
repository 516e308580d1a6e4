"""features.h5 artifact schema — the detector→captioner interface.

Byte-compatible with the reference writer (frcnn/test_net.py:297-306,
:538-542): vlen datasets ``features`` (flattened num_boxes×2048 float32),
``obj_atts`` (uint8 packed stream: obj_id, then attr_id+100 per attribute),
``obj_atts_det`` (float32 packed: obj_id, then attr_id+100 followed by its
score for scores > 0.3), plus ``image_id`` and ``num_boxes`` int scalars.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


def pack_obj_atts(obj_ids: Sequence[int], att_lists: Sequence[Sequence[int]]) -> np.ndarray:
    """GT packing (test_net.py:520-527): [obj_id, att+100, att+100, ...]
    per box, concatenated. uint8 — attribute ids must be < 156."""
    out: List[int] = []
    for obj, atts in zip(obj_ids, att_lists):
        out.append(int(obj))
        for a in atts:
            out.append(int(a) + 100)
    return np.asarray(out, np.uint8)


def pack_obj_atts_det(obj_ids: Sequence[int], att_scores: np.ndarray,
                      thresh: float = 0.3) -> np.ndarray:
    """Detected packing (test_net.py:529-535): [obj_id, att+100, score, ...]
    float32."""
    out: List[float] = []
    for i, obj in enumerate(obj_ids):
        out.append(float(obj))
        idx = np.where(np.asarray(att_scores[i]) > thresh)[0]
        for a in idx:
            out.append(float(a) + 100.0)
            out.append(float(att_scores[i][a]))
    return np.asarray(out, np.float32)


def unpack_obj_atts(stream: np.ndarray) -> List[List]:
    """Inverse of pack_obj_atts — reader semantics of
    updown-baseline/updown/data/readers.py:70-82: [[obj, [[att, 1],…]], …]."""
    result: List[List] = []
    k = 0
    stream = np.asarray(stream)
    while k < len(stream):
        if stream[k] < 100:
            result.append([int(stream[k]), []])
        else:
            result[-1][1].append([int(stream[k]) - 100, 1])
        k += 1
    return result


def unpack_obj_atts_det(stream: np.ndarray) -> List[List]:
    """readers.py:96-111: [[obj, [[att, score],…]], …]."""
    result: List[List] = []
    k = 0
    stream = np.asarray(stream)
    while k < len(stream):
        if stream[k] < 100:
            result.append([int(stream[k]), []])
            k += 1
        else:
            result[-1][1].append([int(stream[k]) - 100, float(stream[k + 1])])
            k += 2
    return result


class FeaturesWriter:
    def __init__(self, path: str, num_images: int):
        assert h5py is not None, "h5py required for feature writing"
        self._hf = h5py.File(path, "w")
        dt = h5py.vlen_dtype(np.dtype("float32"))
        dt2 = h5py.vlen_dtype(np.dtype("uint8"))
        self._hf.create_dataset("features", (num_images,), dtype=dt)
        self._hf.create_dataset("obj_atts", (num_images,), dtype=dt2)
        self._hf.create_dataset("obj_atts_det", (num_images,), dtype=dt)
        self._hf.create_dataset("image_id", (num_images,), dtype=int)
        self._hf.create_dataset("num_boxes", (num_images,), dtype=int)

    def write(self, index: int, image_id: int, features: np.ndarray,
              obj_atts: np.ndarray, obj_atts_det: np.ndarray) -> None:
        self._hf["features"][index] = np.asarray(features, np.float32).flatten()
        self._hf["num_boxes"][index] = int(np.asarray(features).shape[0])
        self._hf["image_id"][index] = int(image_id)
        self._hf["obj_atts"][index] = np.asarray(obj_atts, np.uint8)
        self._hf["obj_atts_det"][index] = np.asarray(obj_atts_det, np.float32)

    def close(self) -> None:
        self._hf.close()


class FeaturesReader:
    """Reader with the reference's access pattern
    (updown-baseline/updown/data/readers.py:21-139) minus the pickle cache —
    decoding the packed streams is fast with the native helper."""

    def __init__(self, features_h5path: str, in_memory: bool = False,
                 use_obj_att_preds: bool = False):
        assert h5py is not None, "h5py required for feature reading"
        if not os.path.exists(features_h5path):
            raise FileNotFoundError(
                f"features file not found: {features_h5path!r} — check "
                "DATA.TRAIN_FEATURES / DATA.INFER_FEATURES in your config "
                "(both are opened at dataset construction, matching the "
                "reference's reader layout)")
        self._h5 = h5py.File(features_h5path, "r")
        self.use_obj_att_preds = use_obj_att_preds
        ids = np.asarray(self._h5["image_id"])
        self._map = {int(ids[i]): i for i in range(len(ids))}
        self._num_boxes = {int(ids[i]): int(self._h5["num_boxes"][i])
                           for i in range(len(ids))}
        self._in_memory = in_memory
        self._cache: Dict[int, np.ndarray] = {}
        if in_memory:
            feats = self._h5["features"]
            for iid, idx in self._map.items():
                self._cache[iid] = np.asarray(feats[idx])

    def __len__(self) -> int:
        return len(self._map)

    @property
    def image_ids(self) -> List[int]:
        return list(self._map.keys())

    def __getitem__(self, image_id: int) -> Tuple[np.ndarray, Optional[list]]:
        idx = self._map[image_id]
        num_boxes = self._num_boxes[image_id]
        feats = self._cache.get(image_id)
        if feats is None:
            feats = np.asarray(self._h5["features"][idx])
        obj_atts = None
        try:
            from style_seqcvae_tpu import native

            if self.use_obj_att_preds:
                obj_atts = native.unpack_obj_atts_det(self._h5["obj_atts_det"][idx])
            elif "obj_atts" in self._h5:
                obj_atts = native.unpack_obj_atts(self._h5["obj_atts"][idx])
            if obj_atts is not None and len(obj_atts) != num_boxes:
                obj_atts = [[0, []]] * num_boxes  # readers.py:131-134
        except KeyError:
            # missing dataset/id → None, matching the reference's defaulting
            # (readers.py:128-137); malformed streams still raise.
            pass
        return feats.reshape(num_boxes, -1), obj_atts
