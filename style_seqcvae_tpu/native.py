"""ctypes bindings for the native host kernels (native/ssc_native.cpp).

Auto-builds ``native/build/libssc_native.so`` with the repo Makefile on
first use (g++ is part of the toolchain); every function has a pure-numpy
fallback so the package works without a compiler. The native paths cover
the reference's Cython/C host code: IoU matrix (bbox.pyx), greedy NMS
(nms_cpu.cpp), COCO RLE (maskApi.c), and the packed obj_atts stream decode
that the reference needed a pickle cache for (readers.py:63-94)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "build", "libssc_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        # always invoke make: the target depends on ssc_native.cpp, so a
        # stale prebuilt .so (older source, missing newer symbols) rebuilds
        # instead of silently failing the symbol lookups below
        try:
            subprocess.run(["make", "-C", os.path.join(_REPO_ROOT, "native")],
                           check=True, capture_output=True)
        except Exception:
            if not os.path.exists(_LIB_PATH):
                raise  # no compiler AND no prebuilt library → fallbacks
        lib = ctypes.CDLL(_LIB_PATH)
        i64, f32p, u8p, u32p, i32p, i64p = (
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64))
        lib.ssc_iou_matrix.argtypes = [f32p, i64, f32p, i64, f32p]
        lib.ssc_nms.restype = i64
        lib.ssc_nms.argtypes = [f32p, f32p, i64, ctypes.c_float, i64p]
        lib.ssc_rle_encode.restype = i64
        lib.ssc_rle_encode.argtypes = [u8p, i64, i64, u32p]
        lib.ssc_rle_decode.argtypes = [u32p, i64, i64, i64, u8p]
        lib.ssc_rle_area.restype = ctypes.c_uint64
        lib.ssc_rle_area.argtypes = [u32p, i64]
        lib.ssc_unpack_obj_atts.restype = i64
        lib.ssc_unpack_obj_atts.argtypes = [u8p, i64, i32p, i32p, i32p, i64p]
        lib.ssc_unpack_obj_atts_det.restype = i64
        lib.ssc_unpack_obj_atts_det.argtypes = [f32p, i64, i32p, i32p, i32p, f32p, i64p]
        try:  # symbol added later — an old .so still serves the rest
            lib.ssc_lcs_lens.argtypes = [i32p, i64p, i32p, i64p, i64, i32p]
        except AttributeError:
            pass
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def iou_matrix(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty((len(boxes), len(query)), np.float32)
        lib.ssc_iou_matrix(_ptr(boxes, ctypes.c_float), len(boxes),
                           _ptr(query, ctypes.c_float), len(query),
                           _ptr(out, ctypes.c_float))
        return out
    # numpy fallback
    from style_seqcvae_tpu.ops.boxes import bbox_overlaps
    import jax.numpy as jnp

    return np.asarray(bbox_overlaps(jnp.asarray(boxes), jnp.asarray(query)))


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    lib = _load()
    if lib is not None:
        keep = np.empty((len(boxes),), np.int64)
        n = lib.ssc_nms(_ptr(boxes, ctypes.c_float), _ptr(scores, ctypes.c_float),
                        len(boxes), ctypes.c_float(thresh),
                        _ptr(keep, ctypes.c_int64))
        return keep[:n]
    from style_seqcvae_tpu.ops.nms import nms_reference

    return nms_reference(boxes, scores, thresh)


def rle_encode(mask: np.ndarray) -> np.ndarray:
    """Row-major binary mask (h, w) → COCO column-major RLE counts."""
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    lib = _load()
    if lib is not None:
        counts = np.empty((h * w + 1,), np.uint32)
        n = lib.ssc_rle_encode(_ptr(mask, ctypes.c_uint8), h, w,
                               _ptr(counts, ctypes.c_uint32))
        return counts[:n]
    flat = mask.T.flatten()  # column-major
    changes = np.flatnonzero(np.diff(flat))
    runs = np.diff(np.concatenate([[0], changes + 1, [len(flat)]]))
    if flat[0] == 1:
        runs = np.concatenate([[0], runs])
    return runs.astype(np.uint32)


def rle_decode(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    counts = np.ascontiguousarray(counts, np.uint32)
    lib = _load()
    if lib is not None:
        out = np.empty((h, w), np.uint8)
        lib.ssc_rle_decode(_ptr(counts, ctypes.c_uint32), len(counts), h, w,
                           _ptr(out, ctypes.c_uint8))
        return out
    vals = np.zeros((int(counts.sum()),), np.uint8)
    pos = 0
    v = 0
    for c in counts:
        if v:
            vals[pos:pos + int(c)] = 1
        pos += int(c)
        v ^= 1
    return vals.reshape(w, h).T


def rle_area(counts: np.ndarray) -> int:
    counts = np.ascontiguousarray(counts, np.uint32)
    lib = _load()
    if lib is not None:
        return int(lib.ssc_rle_area(_ptr(counts, ctypes.c_uint32), len(counts)))
    return int(counts[1::2].sum())


def unpack_obj_atts(stream: np.ndarray) -> List[List]:
    """Native fast path for features_io.unpack_obj_atts."""
    stream = np.ascontiguousarray(stream, np.uint8)
    lib = _load()
    if lib is None:
        from style_seqcvae_tpu.utils.features_io import unpack_obj_atts as py

        return py(stream)
    n = len(stream)
    obj_ids = np.empty((n,), np.int32)
    att_obj = np.empty((n,), np.int32)
    att_ids = np.empty((n,), np.int32)
    n_atts = ctypes.c_int64()
    n_obj = lib.ssc_unpack_obj_atts(_ptr(stream, ctypes.c_uint8), n,
                                    _ptr(obj_ids, ctypes.c_int32),
                                    _ptr(att_obj, ctypes.c_int32),
                                    _ptr(att_ids, ctypes.c_int32),
                                    ctypes.byref(n_atts))
    result: List[List] = [[int(obj_ids[i]), []] for i in range(n_obj)]
    for k in range(n_atts.value):
        result[att_obj[k]][1].append([int(att_ids[k]), 1])
    return result


def unpack_obj_atts_det(stream: np.ndarray) -> List[List]:
    stream = np.ascontiguousarray(stream, np.float32)
    lib = _load()
    if lib is None:
        from style_seqcvae_tpu.utils.features_io import unpack_obj_atts_det as py

        return py(stream)
    n = len(stream)
    obj_ids = np.empty((n,), np.int32)
    att_obj = np.empty((n,), np.int32)
    att_ids = np.empty((n,), np.int32)
    att_scores = np.empty((n,), np.float32)
    n_atts = ctypes.c_int64()
    n_obj = lib.ssc_unpack_obj_atts_det(
        _ptr(stream, ctypes.c_float), n, _ptr(obj_ids, ctypes.c_int32),
        _ptr(att_obj, ctypes.c_int32), _ptr(att_ids, ctypes.c_int32),
        _ptr(att_scores, ctypes.c_float), ctypes.byref(n_atts))
    result: List[List] = [[int(obj_ids[i]), []] for i in range(n_obj)]
    for k in range(n_atts.value):
        result[att_obj[k]][1].append([int(att_ids[k]), float(att_scores[k])])
    return result


def lcs_lens(a_seqs: List[np.ndarray], b_seqs: List[np.ndarray]) -> Optional[np.ndarray]:
    """Batched longest-common-subsequence lengths over int token-id pairs
    (ROUGE-L host path). Returns None when the native library is
    unavailable — callers fall back to the pure-Python DP."""
    lib = _load()
    if lib is None or not hasattr(lib, "ssc_lcs_lens"):
        return None
    n = len(a_seqs)
    a_off = np.zeros((n + 1,), np.int64)
    b_off = np.zeros((n + 1,), np.int64)
    np.cumsum([len(s) for s in a_seqs], out=a_off[1:])
    np.cumsum([len(s) for s in b_seqs], out=b_off[1:])
    a_flat = (np.concatenate(a_seqs) if a_off[-1]
              else np.empty((0,), np.int32)).astype(np.int32, copy=False)
    b_flat = (np.concatenate(b_seqs) if b_off[-1]
              else np.empty((0,), np.int32)).astype(np.int32, copy=False)
    a_flat = np.ascontiguousarray(a_flat)
    b_flat = np.ascontiguousarray(b_flat)
    out = np.empty((n,), np.int32)
    lib.ssc_lcs_lens(_ptr(a_flat, ctypes.c_int32), _ptr(a_off, ctypes.c_int64),
                     _ptr(b_flat, ctypes.c_int32), _ptr(b_off, ctypes.c_int64),
                     n, _ptr(out, ctypes.c_int32))
    return out


def native_available() -> bool:
    return _load() is not None
