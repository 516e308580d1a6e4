"""Detection visualization (host-side debug helper).

Equivalent of the reference's ``vis_detections``
(frcnn/lib/model/utils/net_utils.py:50-60): draw the boxes a detector
produced onto the image with their class name and score, skipping
detections under a score threshold. The reference uses cv2 rectangles +
text; this uses PIL (available offline) and returns the annotated array so
callers can save or inspect it without any display stack.

Used from ``scripts/eval_detections.py --vis-dir`` and directly in
debugging sessions; never on the device path.
"""

from __future__ import annotations

import zlib
from typing import Optional, Sequence

import numpy as np

# distinct, dark-on-light-safe outline colors cycled per class
_COLORS = [
    (204, 0, 0), (0, 153, 0), (0, 82, 204), (230, 153, 0),
    (153, 0, 153), (0, 153, 153), (102, 51, 0), (230, 0, 115),
]


def vis_detections(image: np.ndarray, class_name: str, dets: np.ndarray,
                   thresh: float = 0.8, max_boxes: int = 10,
                   color: Optional[tuple] = None) -> np.ndarray:
    """Draw one class's detections on ``image``.

    image (H, W, 3) uint8 (RGB); dets (N, 5) [x1, y1, x2, y2, score].
    Only boxes with score > ``thresh`` are drawn, at most ``max_boxes`` per
    call (net_utils.py:52-53: ``minimum(10, dets.shape[0])``). Returns a
    NEW annotated (H, W, 3) uint8 array; the input is not modified.
    """
    from PIL import Image, ImageDraw

    img = Image.fromarray(np.ascontiguousarray(image.astype(np.uint8)))
    draw = ImageDraw.Draw(img)
    dets = np.asarray(dets)
    # stable per-class color: builtin hash() is salted per process
    c = color or _COLORS[zlib.crc32(class_name.encode()) % len(_COLORS)]
    for i in range(min(max_boxes, dets.shape[0])):
        score = float(dets[i, 4]) if dets.shape[1] > 4 else 1.0
        if not score > thresh:
            continue
        x1, y1, x2, y2 = (float(v) for v in dets[i, :4])
        draw.rectangle([x1, y1, x2, y2], outline=c, width=2)
        label = f"{class_name}: {score:.3f}"
        # text background strip above the box (inside if at the top edge)
        tx, ty = x1, max(y1 - 12, 0)
        tw = draw.textlength(label) if hasattr(draw, "textlength") else 7 * len(label)
        draw.rectangle([tx, ty, tx + tw + 4, ty + 12], fill=c)
        draw.text((tx + 2, ty), label, fill=(255, 255, 255))
    return np.asarray(img)


def vis_image_detections(image: np.ndarray,
                         boxes: np.ndarray,
                         scores: np.ndarray,
                         labels: Sequence[int],
                         class_names: Sequence[str],
                         thresh: float = 0.5) -> np.ndarray:
    """Multi-class convenience wrapper: one call for a whole image.

    boxes (N, 4), scores (N,), labels (N,) int class ids indexing
    ``class_names``. Mirrors the per-class loop the reference runs at
    test_net.py:408-414 around vis_detections.
    """
    out = np.asarray(image, np.uint8)
    labels = np.asarray(labels)
    for cls in np.unique(labels):
        sel = labels == cls
        dets = np.concatenate(
            [np.asarray(boxes)[sel], np.asarray(scores)[sel, None]], axis=1)
        name = class_names[int(cls)] if int(cls) < len(class_names) else str(int(cls))
        out = vis_detections(out, name, dets, thresh=thresh)
    return out
