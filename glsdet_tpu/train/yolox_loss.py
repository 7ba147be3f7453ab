"""YOLOX training loss with SimOTA targets, batched XLA.

Behavioral reference: ``yolox-ufp/mmdet/models/dense_heads/yolox_head.py``
(loss :325) and ``yolox-drone/models/base/yolox_losses.py`` (get_losses
:106): per image SimOTA assignment, then

    loss = 5 * IoU-loss(pos) / num_fg
         + BCE(obj, fg_mask) / num_fg          (summed over all anchors)
         + BCE(cls, onehot * iou? -> onehot) / num_fg   (positives)
         [+ L1 on raw reg during the final no-mosaic epochs]

``num_fg`` is the total positive count, ``pmean``-reduced across the mesh
when ``axis_name`` is given (reference: reduce_mean, yolox_head.py:365).
The mmdet variant targets cls with onehot * matched-IoU; the drone variant
uses plain onehot — we follow mmdet (the coarse-det recipe).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from glsdet_tpu.assign.sim_ota import sim_ota_assign
from glsdet_tpu.losses import bce_with_logits, iou_loss, l1_loss
from glsdet_tpu.models.yolox_head import decode_boxes


class YOLOXLossOut(NamedTuple):
    total: jnp.ndarray
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_obj: jnp.ndarray
    loss_l1: jnp.ndarray
    num_fg: jnp.ndarray


def yolox_loss(
    cls_logits: jnp.ndarray,
    reg_raw: jnp.ndarray,
    obj_logits: jnp.ndarray,
    priors_cxy: jnp.ndarray,
    priors_stride: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    use_l1: bool = False,
    axis_name: Optional[str] = None,
    cls_loss_type: str = "bce",
) -> YOLOXLossOut:
    """Args:
        cls_logits: (B, A, C); reg_raw: (B, A, 4) pre-decode; obj: (B, A).
        priors_cxy: (A, 2) centers (offset 0.5, image coords);
        priors_stride: (A,).
        gt_*: (B, G, ...) padded with gt_valid mask.
    """
    b, a, num_classes = cls_logits.shape
    grids = priors_cxy / priors_stride[:, None] - 0.5  # integer grid coords
    decoded = decode_boxes(reg_raw, grids, priors_stride)  # (B, A, 4) xyxy

    def assign_one(dec, cls_l, obj_l, gtb, gtl, gtv):
        return sim_ota_assign(
            priors_cxy, priors_stride, dec,
            jax.nn.sigmoid(jax.lax.stop_gradient(cls_l)),
            jax.nn.sigmoid(jax.lax.stop_gradient(obj_l)),
            gtb, gtl, gtv)

    fg, matched_gt, matched_iou = jax.vmap(assign_one)(
        decoded, cls_logits, obj_logits, gt_boxes, gt_labels, gt_valid)
    # Targets are constants (reference computes them under no_grad,
    # yolox_head.py get_targets): without this, the cls-BCE gradient
    # w.r.t. its iou-valued TARGET flows back through the decoded boxes
    # and actively shrinks them (loss_bbox saturates at 5.0).
    matched_iou = jax.lax.stop_gradient(matched_iou)

    num_fg = jnp.sum(fg.astype(jnp.float32))
    if axis_name is not None:
        num_fg = jax.lax.pmean(num_fg, axis_name)
    num_fg = jnp.maximum(num_fg, 1.0)

    safe_gt = jnp.maximum(matched_gt, 0)  # (B, A)
    tgt_boxes = jnp.take_along_axis(
        gt_boxes, safe_gt[..., None], axis=1)  # (B, A, 4)
    tgt_labels = jnp.take_along_axis(gt_labels, safe_gt, axis=1)  # (B, A)

    fg_f = fg.astype(jnp.float32)

    # IoU loss (mode 'square', weight 5.0)
    lb = iou_loss(decoded.reshape(-1, 4), tgt_boxes.reshape(-1, 4))
    loss_bbox = 5.0 * jnp.sum(lb * fg_f.reshape(-1)) / num_fg

    # objectness BCE over all anchors
    loss_obj = jnp.sum(bce_with_logits(obj_logits, fg_f)) / num_fg

    # cls loss at positives; default BCE with target = onehot * matched
    # IoU (mmdet yolox); 'focal' reproduces the yolox-drone focal-cls
    # ablation (models/losses/yolox_focal*.py)
    onehot = jax.nn.one_hot(tgt_labels, num_classes, dtype=cls_logits.dtype)
    if cls_loss_type == "focal":
        p = jax.nn.sigmoid(cls_logits)
        ce = bce_with_logits(cls_logits, onehot)
        p_t = p * onehot + (1 - p) * (1 - onehot)
        a_t = 0.25 * onehot + 0.75 * (1 - onehot)
        lc = (a_t * (1 - p_t) ** 2 * ce).sum(-1)
    else:
        cls_tgt = onehot * matched_iou[..., None]
        lc = bce_with_logits(cls_logits, cls_tgt).sum(-1)
    loss_cls = jnp.sum(lc * fg_f) / num_fg

    # optional L1 on raw reg outputs vs encoded targets (final epochs)
    if use_l1:
        cxy = (tgt_boxes[..., :2] + tgt_boxes[..., 2:4]) / 2.0
        wh = jnp.clip(tgt_boxes[..., 2:4] - tgt_boxes[..., :2], 1e-8, None)
        tgt_raw = jnp.concatenate([
            cxy / priors_stride[None, :, None] - grids[None],
            jnp.log(wh / priors_stride[None, :, None]),
        ], axis=-1)
        ll1 = l1_loss(reg_raw, tgt_raw).sum(-1)
        loss_l1 = jnp.sum(ll1 * fg_f) / num_fg
    else:
        loss_l1 = jnp.zeros(())

    total = loss_cls + loss_bbox + loss_obj + loss_l1
    return YOLOXLossOut(total, loss_cls, loss_bbox, loss_obj, loss_l1,
                        num_fg)


def yolox_loss_3assign(
    cls_logits: jnp.ndarray,
    reg_raw: jnp.ndarray,
    obj_logits: jnp.ndarray,
    priors_cxy: jnp.ndarray,
    priors_stride: jnp.ndarray,
    level_counts,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> YOLOXLossOut:
    """Per-level-assignment variant ("3-assign").

    Behavioral reference: yolox-drone/models/losses/yolox_3assign.py —
    each FPN level runs its own SimOTA assignment/loss; the per-level
    losses are combined with fg-count-based weights
    ``w_l = 2 - (N_l - min) / (max - min)`` normalized by their sum
    (generate_weights, yolox_3assign.py:65).

    level_counts: static per-level anchor counts summing to A.
    """
    losses, fg_counts = [], []
    start = 0
    for n in level_counts:
        sl = slice(start, start + n)
        out = yolox_loss(
            cls_logits[:, sl], reg_raw[:, sl], obj_logits[:, sl],
            priors_cxy[sl], priors_stride[sl],
            gt_boxes, gt_labels, gt_valid, axis_name=axis_name)
        losses.append(out)
        fg_counts.append(out.num_fg)
        start += n

    counts = jnp.stack(fg_counts)
    mx, mn = counts.max(), counts.min()
    w = jnp.where(mx - mn > 0, 2.0 - (counts - mn) / (mx - mn),
                  jnp.full_like(counts, 2.0))
    w = w / w.sum()
    total = sum(wi * o.total for wi, o in zip(w, losses))
    return YOLOXLossOut(
        total,
        sum(wi * o.loss_cls for wi, o in zip(w, losses)),
        sum(wi * o.loss_bbox for wi, o in zip(w, losses)),
        sum(wi * o.loss_obj for wi, o in zip(w, losses)),
        sum(wi * o.loss_l1 for wi, o in zip(w, losses)),
        counts.sum(),
    )
