"""GFL training loss (QFL + DFL + GIoU with ATSS targets), batched XLA.

Behavioral reference: ``yolox-ufp/mmdet/models/dense_heads/gfl_head.py``
(get_targets :473, loss_single :218, loss :307) with the flattened-levels
rewrite: the reference loops per pyramid level and per image; here all
levels are concatenated into one (B, A, ...) tensor and the per-level sums
fold into global sums (identical totals, one fused program).

Distributed normalizers (``reduce_mean`` of positive count and of the
quality-weight sum, gfl_head.py:337-344 / mp_head.py:454,472) become
``lax.pmean`` when ``axis_name`` is set — the XLA-collective equivalent of
the reference's NCCL all-reduce.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from glsdet_tpu.assign.atss import atss_assign
from glsdet_tpu.losses import (
    distribution_focal_loss,
    giou_loss,
    quality_focal_loss,
)
from glsdet_tpu.ops.boxes import iou as aligned_iou
from glsdet_tpu.ops.integral import bbox2distance, distance2bbox, integral_decode


class GFLTargets(NamedTuple):
    labels: jnp.ndarray        # (B, A) int32; num_classes = bg
    bbox_targets: jnp.ndarray  # (B, A, 4) xyxy image coords
    pos_mask: jnp.ndarray      # (B, A) bool
    # per-anchor cls weight (mmdet label_weights: 1.0 for every
    # assigned pos/neg anchor, 0.0 for ignored ones — ATSS here has no
    # ignore path yet, so gfl_targets emits all-ones; kept explicit so
    # ignore-weighting flows through QFL and the BoIW contrastive loss
    # when added, gfl_head.py:520-534 / mp_head.py:272-305)
    label_weights: jnp.ndarray  # (B, A) float32


def gfl_targets(anchors: jnp.ndarray, num_level_anchors: Sequence[int],
                gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                gt_valid: jnp.ndarray, num_classes: int,
                topk: int = 9) -> GFLTargets:
    """ATSS assignment vmapped over the batch. GTs padded to (B, G)."""

    def single(gtb, gtl, gtv):
        res = atss_assign(anchors, num_level_anchors, gtb, gtl, gtv,
                          num_classes, topk=topk)
        pos = res.assigned_gt >= 0
        tgt = jnp.where(pos[:, None],
                        gtb[jnp.maximum(res.assigned_gt, 0)], 0.0)
        return res.labels, tgt, pos

    labels, tgts, pos = jax.vmap(single)(gt_boxes, gt_labels, gt_valid)
    return GFLTargets(labels, tgts, pos,
                      jnp.ones(labels.shape, jnp.float32))


class GFLLossOut(NamedTuple):
    total: jnp.ndarray
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_dfl: jnp.ndarray
    num_total_samples: jnp.ndarray  # pmean positive count (>= 1)
    quality: jnp.ndarray            # (B, A) IoU quality target


def gfl_loss(
    cls_scores: jnp.ndarray,
    bbox_pred_logits: jnp.ndarray,
    targets: GFLTargets,
    anchor_centers: jnp.ndarray,
    anchor_strides: jnp.ndarray,
    num_classes: int,
    reg_max: int = 16,
    loss_dfl_weight: float = 0.25,
    loss_bbox_weight: float = 2.0,
    avg_factor_floor: float = 1.0,
    axis_name: Optional[str] = None,
) -> GFLLossOut:
    """Compute QFL + GIoU + DFL.

    Args:
        cls_scores: (B, A, C) joint cls-quality logits.
        bbox_pred_logits: (B, A, 4*(reg_max+1)).
        anchor_centers: (A, 2); anchor_strides: (A,).
        avg_factor_floor: floor on the quality-weight normalizer.  The
            reference GFLHead clamps it at 1 (gfl_head.py:374
            ``.clamp_(min=1)``) while MPHead divides by the raw value
            (mp_head.py:473) — MP callers pass a tiny floor that only
            guards 0/0.
    """
    b, a, c = cls_scores.shape
    pos = targets.pos_mask
    # reference counts max(pos_i, 1) PER IMAGE (anchor_head.py
    # get_targets: ``sum([max(inds.numel(), 1) for inds in pos_inds_list])``)
    # — an empty image still contributes 1 to the QFL normalizer
    num_pos = jnp.sum(jnp.maximum(
        jnp.sum(pos.astype(jnp.float32), axis=1), 1.0))
    if axis_name is not None:
        num_pos = jax.lax.pmean(num_pos, axis_name)
    num_total_samples = jnp.maximum(num_pos, 1.0)

    stride = anchor_strides[None, :, None]  # (1, A, 1)
    centers_s = anchor_centers[None, :, :] / stride  # (1, A, 2) stride units

    # decode predictions (stride units)
    dists = integral_decode(bbox_pred_logits, reg_max)  # (B, A, 4)
    pred_boxes = distance2bbox(
        jnp.broadcast_to(centers_s, (b, a, 2)), dists)
    tgt_boxes = targets.bbox_targets / stride  # (B, A, 4)

    quality = jnp.where(
        pos, aligned_iou(jax.lax.stop_gradient(pred_boxes), tgt_boxes), 0.0)

    # quality weight: max sigmoid score over classes at positives (detached)
    weight = jnp.max(jax.nn.sigmoid(
        jax.lax.stop_gradient(cls_scores)), axis=-1)
    weight = jnp.where(pos, weight, 0.0)  # (B, A)
    sum_weight = jnp.sum(weight)
    if axis_name is not None:
        sum_weight = jax.lax.pmean(sum_weight, axis_name)
    avg_factor = jnp.maximum(sum_weight, avg_factor_floor)

    # GIoU
    lb = giou_loss(pred_boxes.reshape(-1, 4), tgt_boxes.reshape(-1, 4))
    loss_bbox = loss_bbox_weight * jnp.sum(
        lb * weight.reshape(-1)) / avg_factor

    # DFL on the 4 sides
    tgt_dist = bbox2distance(centers_s, tgt_boxes, reg_max)  # (B, A, 4)
    dfl = distribution_focal_loss(
        bbox_pred_logits.reshape(-1, reg_max + 1),
        tgt_dist.reshape(-1))  # (B*A*4,)
    dfl_w = jnp.repeat(weight.reshape(-1), 4) / 4.0
    loss_dfl = loss_dfl_weight * jnp.sum(dfl * dfl_w) / avg_factor

    # QFL over all anchors, weighted per anchor (label_weights is 1.0
    # everywhere until an ignore path sets zeros — gfl_head.py:520-534)
    qfl = quality_focal_loss(
        cls_scores.reshape(-1, c), targets.labels.reshape(-1),
        quality.reshape(-1), num_classes)
    loss_cls = jnp.sum(
        qfl * targets.label_weights.reshape(-1)) / num_total_samples

    total = loss_cls + loss_bbox + loss_dfl
    return GFLLossOut(total, loss_cls, loss_bbox, loss_dfl,
                      num_total_samples, quality)
