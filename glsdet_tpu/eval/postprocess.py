"""Test-time decode + NMS for both detector families, fixed-shape XLA.

Behavioral references:
- YOLOX: ``yolox-ufp/mmdet/models/dense_heads/yolox_head.py`` (_bbox_decode
  :298, _bboxes_nms :310 — score = obj * max-cls, single argmax label,
  score_thr 0.01, NMS 0.65) and ``yolox-drone/models/core/utils_bbox.py``
  (decode_outputs :254, non_max_suppression :375).
- GFL/MP-Det: ``gfl_head.py`` (_get_bboxes_single :380 — per-level top
  ``nms_pre=1000`` candidates by max sigmoid score, Integral decode,
  multiclass NMS 0.6, max_per_img 100/500).

Everything returns fixed-size ranked detection sets with validity masks,
batched over images with vmap, so the whole eval path is one jitted
program per (resolution, caps) bucket.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.models.yolox_head import decode_boxes, flatten_head_outputs
from glsdet_tpu.ops.integral import distance2bbox, integral_decode
from glsdet_tpu.ops.nms import multiclass_nms_batched
from glsdet_tpu.ops.priors import grid_points


def yolox_postprocess(
    cls_out: Sequence[jnp.ndarray],
    reg_out: Sequence[jnp.ndarray],
    obj_out: Sequence[jnp.ndarray],
    img_hw: Tuple[int, int],
    strides: Sequence[int] = (8, 16, 32),
    score_thr: float = 0.01,
    iou_thr: float = 0.65,
    max_dets: int = 100,
    single_label: bool = True,
    apply_sigmoid: str = "all",
):
    """Per-level NHWC head maps -> (B, max_dets) ranked detections.

    ``single_label=True`` is the reference YOLOX semantics (one
    max-class candidate per anchor — yolox_head.py:310 _bboxes_nms and
    utils_bbox.py:398-419): non-max class entries are zeroed before the
    class-wise NMS, so each anchor contributes at most one detection.
    ``False`` keeps the mmdet multiclass behavior (every above-threshold
    (anchor, class) pair competes), as used by the GFL path.

    ``apply_sigmoid`` serves the loss-ablation heads whose decode bakes
    (or omits) the activations (utils_bbox.py): "all" = obj+cls
    (decode_outputs :254), "cls" = cls only (decode_outputs_cls_sigmoid
    :92), "obj" = obj only (decode_outputs_no_sigmoid :146), "none" =
    raw maps (decode_outputs_no_sigmoid_all :200).

    Returns dict(boxes (B,K,4), scores (B,K), labels (B,K), valid (B,K)).
    """
    if apply_sigmoid not in ("all", "cls", "obj", "none"):
        raise ValueError(f"apply_sigmoid {apply_sigmoid!r}")
    centers_np, strides_np, _ = grid_points(img_hw, strides, offset=0.5)
    grids = jnp.asarray(centers_np / strides_np[:, None] - 0.5)
    stride_v = jnp.asarray(strides_np)

    cls_f, reg_f, obj_f = flatten_head_outputs(cls_out, reg_out, obj_out)
    boxes = decode_boxes(reg_f.astype(jnp.float32), grids, stride_v)
    cls_p = cls_f.astype(jnp.float32)
    obj_p = obj_f.astype(jnp.float32)
    if apply_sigmoid in ("all", "cls"):
        cls_p = jax.nn.sigmoid(cls_p)
    if apply_sigmoid in ("all", "obj"):
        obj_p = jax.nn.sigmoid(obj_p)
    scores = cls_p * obj_p[..., None]  # (B, A, C)
    if single_label:
        # scatter each anchor's max-class score into a one-entry row:
        # the multiclass machinery below then reduces EXACTLY to the
        # reference's single-argmax-label path (zeroed entries can
        # never pass score_thr's strict > test)
        lab = jnp.argmax(scores, axis=-1)
        keep = jax.nn.one_hot(lab, scores.shape[-1], dtype=bool)
        scores = jnp.where(keep, scores, 0.0)

    # adaptive candidate ladder: chunks whose real candidate count
    # fits the small tier skip the full (4*max_dets)^2 NMS matrices —
    # output-identical either way (ops/nms.py multiclass_nms_batched)
    ob, osc, ol, ov = multiclass_nms_batched(
        boxes, scores, score_thr, iou_thr, max_dets)
    return {"boxes": ob, "scores": osc, "labels": ol, "valid": ov}


def gfl_postprocess(
    cls_scores: Sequence[jnp.ndarray],
    bbox_preds: Sequence[jnp.ndarray],
    img_hw: Tuple[int, int],
    strides: Sequence[int] = (8, 16, 32, 64, 128),
    reg_max: int = 16,
    score_thr: float = 0.01,
    iou_thr: float = 0.6,
    max_dets: int = 100,
    scores_are_logits: bool = True,
    nms_pre: int = 1000,
):
    """GFL/MPHead per-level maps -> ranked detections.

    cls_scores: per-level (B, H, W, C) proxy/cls scores (logits);
    bbox_preds: per-level (B, H, W, 4*(reg_max+1)).

    ``nms_pre``: per-level pre-NMS candidate cap by max class score —
    the reference's ``nms_pre=1000`` filter (gfl_head.py:380
    ``_get_bboxes_single``).  Besides parity, this bounds the Integral
    softmax decode and the NMS top-k to ~5k rows instead of the full
    stride-8 grid (34k rows at 1280^2 — a ~7x cut in postprocess work).
    ``nms_pre <= 0`` disables the filter.
    """
    centers_np, strides_np, counts = grid_points(img_hw, strides,
                                                 offset=0.0)
    b = cls_scores[0].shape[0]

    cls_l, reg_l, ctr_l, str_l = [], [], [], []
    off = 0
    for c, p, n, s in zip(cls_scores, bbox_preds, counts, strides):
        cf = c.reshape(b, n, c.shape[-1])
        pf = p.reshape(b, n, p.shape[-1])
        ctr = jnp.asarray(centers_np[off:off + n])          # (n, 2)
        off += n
        k = min(nms_pre, n) if nms_pre and nms_pre > 0 else n
        if k < n:
            # max over classes is monotone under sigmoid, so ranking on
            # logits matches the reference's ranking on scores
            lead = jnp.max(cf.astype(jnp.float32), axis=-1)  # (B, n)
            _, idx = jax.lax.top_k(lead, k)                  # (B, k)
            cf = jnp.take_along_axis(cf, idx[..., None], axis=1)
            pf = jnp.take_along_axis(pf, idx[..., None], axis=1)
            ctr = ctr[idx]                                   # (B, k, 2)
        else:
            ctr = jnp.broadcast_to(ctr[None], (b, n, 2))
        cls_l.append(cf)
        reg_l.append(pf)
        ctr_l.append(ctr)
        str_l.append(jnp.full((b, ctr.shape[1]), float(s), jnp.float32))

    cls_f = jnp.concatenate(cls_l, axis=1)
    reg_f = jnp.concatenate(reg_l, axis=1)
    centers = jnp.concatenate(ctr_l, axis=1)                 # (B, K, 2)
    stride_v = jnp.concatenate(str_l, axis=1)                # (B, K)

    dists = integral_decode(reg_f.astype(jnp.float32), reg_max)
    dists = dists * stride_v[..., None]
    boxes = distance2bbox(centers, dists, max_shape=img_hw)
    scores = cls_f.astype(jnp.float32)
    if scores_are_logits:
        scores = jax.nn.sigmoid(scores)

    ob, osc, ol, ov = multiclass_nms_batched(
        boxes, scores, score_thr, iou_thr, max_dets)
    return {"boxes": ob, "scores": osc, "labels": ol, "valid": ov}


def rescale_detections(dets: dict, scale: float,
                       offset: Tuple[float, float] = (0.0, 0.0)) -> dict:
    """Undo a letterbox/resize: boxes -> original image coords."""
    dx, dy = offset
    shift = jnp.asarray([dx, dy, dx, dy], jnp.float32)
    return {**dets, "boxes": (dets["boxes"] - shift) / scale}
