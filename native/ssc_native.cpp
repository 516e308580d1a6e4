// Native host-side kernels for style_seqcvae_tpu.
//
// TPU-native equivalents of the reference's host/native code:
//  * IoU matrix      — frcnn/lib/model/utils/bbox.pyx (Cython)
//  * greedy NMS      — frcnn/lib/model/csrc/cpu/nms_cpu.cpp
//  * COCO RLE codec  — frcnn/lib/pycocotools/maskApi.c (column-major RLE)
//  * packed obj_atts stream decode — the hot loop of
//    updown-baseline/updown/data/readers.py:70-111 (the reference needs a
//    pickle cache to make it bearable; this decoder makes it free)
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// IoU of boxes (n,4) vs query (m,4), +1 widths (legacy convention).
void ssc_iou_matrix(const float* boxes, int64_t n, const float* query,
                    int64_t m, float* out) {
  for (int64_t i = 0; i < n; ++i) {
    const float bx1 = boxes[i * 4 + 0], by1 = boxes[i * 4 + 1];
    const float bx2 = boxes[i * 4 + 2], by2 = boxes[i * 4 + 3];
    const float barea = (bx2 - bx1 + 1.f) * (by2 - by1 + 1.f);
    for (int64_t j = 0; j < m; ++j) {
      const float qx1 = query[j * 4 + 0], qy1 = query[j * 4 + 1];
      const float qx2 = query[j * 4 + 2], qy2 = query[j * 4 + 3];
      const float w = std::min(bx2, qx2) - std::max(bx1, qx1) + 1.f;
      const float h = std::min(by2, qy2) - std::max(by1, qy1) + 1.f;
      float inter = (w > 0.f && h > 0.f) ? w * h : 0.f;
      const float qarea = (qx2 - qx1 + 1.f) * (qy2 - qy1 + 1.f);
      out[i * m + j] = inter / (barea + qarea - inter);
    }
  }
}

// Greedy NMS, descending score; returns number of kept boxes, indices into
// the ORIGINAL array written to keep_out (size >= n).
int64_t ssc_nms(const float* boxes, const float* scores, int64_t n,
                float thresh, int64_t* keep_out) {
  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return scores[a] > scores[b];
  });
  std::vector<char> suppressed(n, 0);
  std::vector<float> areas(n);
  for (int64_t i = 0; i < n; ++i) {
    areas[i] = (boxes[i * 4 + 2] - boxes[i * 4 + 0] + 1.f) *
               (boxes[i * 4 + 3] - boxes[i * 4 + 1] + 1.f);
  }
  int64_t kept = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    const int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep_out[kept++] = i;
    const float ix1 = boxes[i * 4], iy1 = boxes[i * 4 + 1];
    const float ix2 = boxes[i * 4 + 2], iy2 = boxes[i * 4 + 3];
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      const int64_t j = order[oj];
      if (suppressed[j]) continue;
      const float w = std::min(ix2, boxes[j * 4 + 2]) -
                      std::max(ix1, boxes[j * 4]) + 1.f;
      const float h = std::min(iy2, boxes[j * 4 + 3]) -
                      std::max(iy1, boxes[j * 4 + 1]) + 1.f;
      if (w > 0.f && h > 0.f) {
        const float inter = w * h;
        if (inter / (areas[i] + areas[j] - inter) > thresh) suppressed[j] = 1;
      }
    }
  }
  return kept;
}

// COCO RLE encode: mask (h, w) ROW-major input, runs over COLUMN-major
// order (maskApi.c rleEncode semantics: runs of 0s and 1s alternating,
// starting with 0s). Returns number of counts written.
int64_t ssc_rle_encode(const uint8_t* mask, int64_t h, int64_t w,
                       uint32_t* counts_out) {
  int64_t n = 0;
  uint8_t prev = 0;
  uint32_t run = 0;
  for (int64_t x = 0; x < w; ++x) {
    for (int64_t y = 0; y < h; ++y) {
      const uint8_t v = mask[y * w + x] ? 1 : 0;
      if (v == prev) {
        ++run;
      } else {
        counts_out[n++] = run;
        run = 1;
        prev = v;
      }
    }
  }
  counts_out[n++] = run;
  return n;
}

// COCO RLE decode into row-major mask (h, w).
void ssc_rle_decode(const uint32_t* counts, int64_t n_counts, int64_t h,
                    int64_t w, uint8_t* mask_out) {
  std::memset(mask_out, 0, static_cast<size_t>(h) * w);
  int64_t pos = 0;
  uint8_t v = 0;
  for (int64_t k = 0; k < n_counts; ++k) {
    for (uint32_t r = 0; r < counts[k]; ++r, ++pos) {
      if (v) {
        const int64_t x = pos / h, y = pos % h;
        mask_out[y * w + x] = 1;
      }
    }
    v = !v;
  }
}

// RLE area (count of 1s).
uint64_t ssc_rle_area(const uint32_t* counts, int64_t n_counts) {
  uint64_t a = 0;
  for (int64_t k = 1; k < n_counts; k += 2) a += counts[k];
  return a;
}

// Decode the uint8 GT obj_atts stream [obj, att+100, ...] into parallel
// arrays: obj_ids (one per box), att_obj (box index per attribute entry),
// att_ids. Returns number of boxes; n_atts_out receives attribute count.
int64_t ssc_unpack_obj_atts(const uint8_t* stream, int64_t n,
                            int32_t* obj_ids, int32_t* att_obj,
                            int32_t* att_ids, int64_t* n_atts_out) {
  int64_t n_obj = 0, n_att = 0;
  for (int64_t k = 0; k < n; ++k) {
    if (stream[k] < 100) {
      obj_ids[n_obj++] = stream[k];
    } else {
      att_obj[n_att] = static_cast<int32_t>(n_obj - 1);
      att_ids[n_att++] = stream[k] - 100;
    }
  }
  *n_atts_out = n_att;
  return n_obj;
}

// Decode the float32 detected stream [obj, att+100, score, ...].
int64_t ssc_unpack_obj_atts_det(const float* stream, int64_t n,
                                int32_t* obj_ids, int32_t* att_obj,
                                int32_t* att_ids, float* att_scores,
                                int64_t* n_atts_out) {
  int64_t n_obj = 0, n_att = 0;
  int64_t k = 0;
  while (k < n) {
    if (stream[k] < 100.f) {
      obj_ids[n_obj++] = static_cast<int32_t>(stream[k]);
      ++k;
    } else {
      att_obj[n_att] = static_cast<int32_t>(n_obj - 1);
      att_ids[n_att] = static_cast<int32_t>(stream[k]) - 100;
      att_scores[n_att++] = stream[k + 1];
      k += 2;
    }
  }
  *n_atts_out = n_att;
  return n_obj;
}

// Batched LCS lengths for ROUGE-L (rouge.py's my_lcs over token sequences).
// a_flat/b_flat hold all hypothesis/reference token-id sequences back to
// back; a_off/b_off are n_pairs+1 prefix offsets. out[i] = |LCS(a_i, b_i)|.
// Classic O(len_a*len_b) DP with a rolling row; caption lengths are tiny
// (<100 tokens) so the row lives in cache.
void ssc_lcs_lens(const int32_t* a_flat, const int64_t* a_off,
                  const int32_t* b_flat, const int64_t* b_off,
                  int64_t n_pairs, int32_t* out) {
  std::vector<int32_t> prev, cur;
  for (int64_t p = 0; p < n_pairs; ++p) {
    const int32_t* a = a_flat + a_off[p];
    const int32_t* b = b_flat + b_off[p];
    const int64_t na = a_off[p + 1] - a_off[p];
    const int64_t nb = b_off[p + 1] - b_off[p];
    if (na == 0 || nb == 0) {
      out[p] = 0;
      continue;
    }
    prev.assign(nb + 1, 0);
    cur.assign(nb + 1, 0);
    for (int64_t i = 1; i <= na; ++i) {
      const int32_t ai = a[i - 1];
      for (int64_t j = 1; j <= nb; ++j) {
        if (ai == b[j - 1])
          cur[j] = prev[j - 1] + 1;
        else
          cur[j] = prev[j] > cur[j - 1] ? prev[j] : cur[j - 1];
      }
      std::swap(prev, cur);
    }
    out[p] = prev[nb];
  }
}

}  // extern "C"
