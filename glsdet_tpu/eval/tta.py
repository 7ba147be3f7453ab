"""Test-time augmentation: multi-scale + flip aggregation.

Behavioral reference: ``mmdet/datasets/pipelines/test_time_aug.py:11``
(MultiScaleFlipAug) + the aug_test merge: run the detector at several
scales and horizontal flip, map detections back to original coordinates,
concatenate, and NMS once.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.ops.nms import NEG_INF, batched_nms


def tta_detect(
    detect_fn: Callable[[np.ndarray], dict],
    image: np.ndarray,
    scales: Sequence[float] = (1.0,),
    flip: bool = True,
    iou_thr: float = 0.65,
    max_dets: int = 300,
) -> dict:
    """Aggregate detections over scales x flips.

    detect_fn(image) -> dict(boxes xyxy in image coords, scores, labels)
    — e.g. ``apis.Detector.detect`` (which handles its own resize, so a
    TTA "scale" here rescales the input before the call).
    """
    import cv2

    h0, w0 = image.shape[:2]
    all_boxes, all_scores, all_labels = [], [], []
    for s in scales:
        img_s = (cv2.resize(image, (int(w0 * s), int(h0 * s)))
                 if s != 1.0 else image)
        variants = [(img_s, False)]
        if flip:
            variants.append((img_s[:, ::-1].copy(), True))
        for img_v, flipped in variants:
            d = detect_fn(img_v)
            boxes = d["boxes"].copy()
            if flipped:
                wv = img_v.shape[1]
                boxes[:, [0, 2]] = wv - boxes[:, [2, 0]]
            boxes /= s
            all_boxes.append(boxes)
            all_scores.append(d["scores"])
            all_labels.append(d["labels"])

    boxes = np.concatenate(all_boxes).astype(np.float32)
    scores = np.concatenate(all_scores).astype(np.float32)
    labels = np.concatenate(all_labels).astype(np.int32)
    if len(boxes) == 0:
        return {"boxes": boxes, "scores": scores, "labels": labels}

    # single fused NMS over the union
    k = len(boxes)
    keep, _ = batched_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(labels), iou_thr)
    keep = np.asarray(keep)
    order = np.argsort(-scores[keep])[:max_dets]
    return {
        "boxes": boxes[keep][order],
        "scores": scores[keep][order],
        "labels": labels[keep][order],
    }
