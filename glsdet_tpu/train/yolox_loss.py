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

    # cls BCE at positives, target = onehot * matched IoU (mmdet yolox)
    onehot = jax.nn.one_hot(tgt_labels, num_classes, dtype=cls_logits.dtype)
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
