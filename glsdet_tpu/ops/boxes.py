"""Box geometry primitives (pure JAX, fixed shapes, fully vectorized).

Semantics follow the reference implementations studied in
WUTCM-Lab/GLSDet (``yolox-ufp/mmdet/core/bbox``; IoF gating in
``yolox-ufp/ufpmp_det_eval.py:36``), but are written as batched XLA ops:
everything broadcasts, nothing loops.

Conventions:
- ``xyxy``   = (x1, y1, x2, y2) corner format (the default).
- ``cxcywh`` = (center_x, center_y, w, h).
- ``xywh``   = (x1, y1, w, h) COCO format.
- Degenerate/padding boxes (zero or negative extent) get zero area and
  zero overlap, so padded rows are harmless.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-7


def box_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], axis=-1
    )


def box_xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def box_xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x1 + w, y1 + h], axis=-1)


def box_xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def bbox_area(boxes: jnp.ndarray, offset: float = 0.0) -> jnp.ndarray:
    """Area of xyxy boxes; clamped at zero so padding boxes contribute 0.

    ``offset=1`` reproduces the legacy ``+1`` pixel-area convention used by
    the reference's pure-python NMS (ufpmp_det_eval.py:158) and UFP region
    statistics (unified_foreground_packing.py:74).
    """
    w = jnp.clip(boxes[..., 2] - boxes[..., 0] + offset, 0.0, None)
    h = jnp.clip(boxes[..., 3] - boxes[..., 1] + offset, 0.0, None)
    return w * h


def _pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                           offset: float = 0.0) -> jnp.ndarray:
    """Intersection area matrix (..., N, M) between two xyxy box sets."""
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:4], boxes2[..., None, :, 2:4])
    wh = jnp.clip(rb - lt + offset, 0.0, None)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                 offset: float = 0.0) -> jnp.ndarray:
    """IoU matrix (..., N, M)."""
    inter = _pairwise_intersection(boxes1, boxes2, offset)
    area1 = bbox_area(boxes1, offset)
    area2 = bbox_area(boxes2, offset)
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / jnp.maximum(union, EPS)


def pairwise_iof(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                 offset: float = 0.0) -> jnp.ndarray:
    """Intersection-over-foreground matrix: inter / area(boxes1).

    mmdet's ``bbox_overlaps(..., mode='iof')`` convention: the
    normalizer is the *first* box's area.  NOTE the reference eval
    driver's ``compute_iof`` (ufpmp_det_eval.py:36-50) instead divides
    by ``min(area1, area2)`` — use :func:`pairwise_iof_min` where that
    exact gate is required (chip unmapping, UFP GT re-projection).
    """
    inter = _pairwise_intersection(boxes1, boxes2, offset)
    area1 = bbox_area(boxes1, offset)
    return inter / jnp.maximum(area1[..., :, None], EPS)


def pairwise_iof_min(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                     offset: float = 0.0) -> jnp.ndarray:
    """Intersection over the SMALLER box: inter / min(area1, area2).

    Bit-faithful to ``compute_iof`` in the reference eval driver
    (ufpmp_det_eval.py:36-50) and the dataset builder
    (UFP_VisDrone2COCO.py:21-35): both normalize by the smaller of the
    two areas, which differs from the mmdet 'iof' mode whenever the
    first box is the larger one (e.g. a stage-2 detection covering an
    entire small chip).
    """
    inter = _pairwise_intersection(boxes1, boxes2, offset)
    area1 = bbox_area(boxes1, offset)
    area2 = bbox_area(boxes2, offset)
    denom = jnp.minimum(area1[..., :, None], area2[..., None, :])
    return inter / jnp.maximum(denom, EPS)


def iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
        offset: float = 0.0) -> jnp.ndarray:
    """Aligned (elementwise) IoU between equal-shaped box sets."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    wh = jnp.clip(rb - lt + offset, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = bbox_area(boxes1, offset) + bbox_area(boxes2, offset) - inter
    return inter / jnp.maximum(union, EPS)


def iof(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
        offset: float = 0.0) -> jnp.ndarray:
    """Aligned intersection-over-foreground (normalized by boxes1 area)."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    wh = jnp.clip(rb - lt + offset, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(bbox_area(boxes1, offset), EPS)


def giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Aligned generalized IoU (used by the GFL bbox loss)."""
    ious = iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:4], boxes2[..., 2:4])
    wh = jnp.clip(rb - lt, 0.0, None)
    enclose = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    inter_rb = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    inter_wh = jnp.clip(inter_rb - inter_lt, 0.0, None)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = bbox_area(boxes1) + bbox_area(boxes2) - inter
    return ious - (enclose - union) / jnp.maximum(enclose, EPS)


def bbox_overlaps(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                  mode: str = "iou", is_aligned: bool = False,
                  offset: float = 0.0) -> jnp.ndarray:
    """mmdet-style dispatcher (mmdet/core/evaluation/bbox_overlaps.py)."""
    if is_aligned:
        fn = {"iou": iou, "iof": iof}[mode]
    else:
        fn = {"iou": pairwise_iou, "iof": pairwise_iof}[mode]
    return fn(boxes1, boxes2, offset=offset)


def clip_boxes(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clip xyxy boxes into [0, w] x [0, h]."""
    x1 = jnp.clip(boxes[..., 0], 0, width)
    y1 = jnp.clip(boxes[..., 1], 0, height)
    x2 = jnp.clip(boxes[..., 2], 0, width)
    y2 = jnp.clip(boxes[..., 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def scale_boxes_about_center(boxes: jnp.ndarray, scale: float,
                             image_shape) -> jnp.ndarray:
    """Expand xyxy boxes about their centers and clip to ``[0, dim-1]``.

    Reproduces ``scale_boxes`` in the reference UFP
    (unified_foreground_packing.py:6): note the clip upper bound is
    ``dim - 1``, and ``image_shape`` is (width, height).
    """
    w, h = image_shape[0], image_shape[1]
    cx = (boxes[..., 2] + boxes[..., 0]) * 0.5
    cy = (boxes[..., 3] + boxes[..., 1]) * 0.5
    half_w = (boxes[..., 2] - boxes[..., 0]) * 0.5 * scale
    half_h = (boxes[..., 3] - boxes[..., 1]) * 0.5 * scale
    return jnp.stack(
        [
            jnp.clip(cx - half_w, 0, w - 1),
            jnp.clip(cy - half_h, 0, h - 1),
            jnp.clip(cx + half_w, 0, w - 1),
            jnp.clip(cy + half_h, 0, h - 1),
        ],
        axis=-1,
    )
