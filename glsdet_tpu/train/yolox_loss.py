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


def _bce_probs(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """BCE on raw probabilities: the ``nn.BCELoss`` used by the
    no-sigmoid loss ablations (yolox_losses_no_sigmoid.py:64).  Matches
    torch's kernel exactly on (0, 1) including its log clamp at -100;
    the [0, 1] clip additionally keeps values/grads finite where the
    reference feeds raw head outputs outside BCELoss's domain (torch
    raises or NaNs there)."""
    p = jnp.clip(p, 0.0, 1.0)
    # where-guarded logs: log(clip(x)) alone backprops inf * 0 = NaN at
    # the clamped boundaries
    logp = jnp.where(
        p > 0, jnp.maximum(jnp.log(jnp.where(p > 0, p, 1.0)), -100.0),
        -100.0)
    log1mp = jnp.where(
        p < 1,
        jnp.maximum(jnp.log1p(-jnp.where(p < 1, p, 0.0)), -100.0),
        -100.0)
    return -(t * logp + (1.0 - t) * log1mp)


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
    variant: str = "mmdet",
    bbox_loss_mode: str = "square",
) -> YOLOXLossOut:
    """Args:
        cls_logits: (B, A, C); reg_raw: (B, A, 4) pre-decode; obj: (B, A).
        priors_cxy: (A, 2) centers (offset 0.5, image coords);
        priors_stride: (A,).
        gt_*: (B, G, ...) padded with gt_valid mask.
        variant: sigmoid-placement ablations from yolox-drone/models/
            losses —
            - 'mmdet' (default): sigmoid(cls)*sigmoid(obj) in the
              assignment cost, BCE-with-logits losses (the baseline
              yolox_losses.py recipe);
            - 'cls_sigmoid' (yolox_losses_cls_sigmoid.py): sigmoid on
              cls only in the cost; obj loss is raw-probability BCE,
              cls loss stays with-logits;
            - 'no_sigmoid' (yolox_losses_no_sigmoid.py): raw head
              outputs in the cost AND raw-probability BCE for both obj
              and cls.
        bbox_loss_mode: 'square' (reference default, 1 - iou^2) /
            'linear' / 'log' (IOUloss modes, yolox_losses.py:45) /
            'giou' — a TPU-rebuild EXTRA: the square/linear/log modes
            all have ZERO gradient on disjoint box pairs, so
            from-scratch training without mosaic can plateau at
            loss_bbox = 5.0 until the last-epochs L1 phase rescues it
            (measured: big_synthetic_check stays saturated for ~95% of
            coarse training); GIoU attracts disjoint boxes through the
            enclosing-box term.
    """
    if variant not in ("mmdet", "cls_sigmoid", "no_sigmoid"):
        raise ValueError(f"unknown yolox loss variant: {variant!r}")
    b, a, num_classes = cls_logits.shape
    grids = priors_cxy / priors_stride[:, None] - 0.5  # integer grid coords
    decoded = decode_boxes(reg_raw, grids, priors_stride)  # (B, A, 4) xyxy

    def assign_one(dec, cls_l, obj_l, gtb, gtl, gtv):
        cls_p = (cls_l if variant == "no_sigmoid"
                 else jax.nn.sigmoid(cls_l))
        obj_p = (obj_l if variant in ("cls_sigmoid", "no_sigmoid")
                 else jax.nn.sigmoid(obj_l))
        return sim_ota_assign(
            priors_cxy, priors_stride, dec,
            jax.lax.stop_gradient(cls_p),
            jax.lax.stop_gradient(obj_p),
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

    # IoU loss (reference mode 'square', weight 5.0; giou opt-in above)
    if bbox_loss_mode == "giou":
        from glsdet_tpu.losses import giou_loss

        lb = giou_loss(decoded.reshape(-1, 4), tgt_boxes.reshape(-1, 4))
    else:
        lb = iou_loss(decoded.reshape(-1, 4), tgt_boxes.reshape(-1, 4),
                      mode=bbox_loss_mode)
    loss_bbox = 5.0 * jnp.sum(lb * fg_f.reshape(-1)) / num_fg

    # objectness BCE over all anchors; the no-sigmoid family treats the
    # raw obj output as a probability (nn.BCELoss)
    if variant in ("cls_sigmoid", "no_sigmoid"):
        loss_obj = jnp.sum(_bce_probs(obj_logits, fg_f)) / num_fg
    else:
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
    elif variant == "no_sigmoid":
        cls_tgt = onehot * matched_iou[..., None]
        lc = _bce_probs(cls_logits, cls_tgt).sum(-1)
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


def _level_weights(fg: jnp.ndarray, level_counts,
                   mode: str = "minmax") -> jnp.ndarray:
    """Per-image per-FPN-level weights from positive counts.

    ``generate_weights``: within each image, a level with ``n``
    positives gets
    - mode='minmax' (yolox_losses_decoupled.py:216, fpn_weight family):
      ``2 - (n - min) / (max - min)`` (2.0 when all levels tie);
    - mode='softmax' (yolox_losses_fpn_weight_sigmoid640v2.py:209):
      ``1.5 - softmax(n / sum(n))`` (all-ones when no positives).
    Returns a per-ANCHOR weight map (B, A) with each level's weight
    broadcast over its anchors.
    """
    parts, start = [], 0
    counts = []
    for n in level_counts:
        counts.append(fg[:, start:start + n].sum(axis=1).astype(jnp.float32))
        start += n
    c = jnp.stack(counts, axis=1)  # (B, L)
    if mode == "softmax":
        total = c.sum(axis=1, keepdims=True)
        frac = c / jnp.maximum(total, 1.0)
        w = jnp.where(total > 0,
                      1.5 - jax.nn.softmax(frac, axis=1),
                      jnp.ones_like(c))
    else:
        mx = c.max(axis=1, keepdims=True)
        mn = c.min(axis=1, keepdims=True)
        w = jnp.where(mx - mn > 0, 2.0 - (c - mn) / (mx - mn),
                      jnp.full_like(c, 2.0))  # (B, L)
    for k, n in enumerate(level_counts):
        parts.append(jnp.broadcast_to(w[:, k:k + 1], (fg.shape[0], n)))
    return jnp.concatenate(parts, axis=1)  # (B, A)


def _candidate_mask(priors_cxy: jnp.ndarray, priors_stride: jnp.ndarray,
                    gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
                    center_radius: float = 2.5) -> jnp.ndarray:
    """(B, A) SimOTA candidate mask: prior center inside ANY valid gt
    box OR inside the 2.5-strides center region of any gt — the
    ``is_in_boxes_anchor`` mask from get_in_boxes_info, which the dw
    loss snapshots as ``is_in_box = fg_mask.clone()`` BEFORE matching
    (yolox_losses_dw_sigmoid640.py:341)."""
    x, y = priors_cxy[:, 0], priors_cxy[:, 1]
    in_box = ((x[None, None, :] > gt_boxes[:, :, 0:1])
              & (x[None, None, :] < gt_boxes[:, :, 2:3])
              & (y[None, None, :] > gt_boxes[:, :, 1:2])
              & (y[None, None, :] < gt_boxes[:, :, 3:4]))
    gt_cxy = (gt_boxes[..., :2] + gt_boxes[..., 2:4]) / 2.0
    rad = center_radius * priors_stride  # (A,)
    in_center = (
        (x[None, None, :] > gt_cxy[..., 0:1] - rad[None, None, :])
        & (x[None, None, :] < gt_cxy[..., 0:1] + rad[None, None, :])
        & (y[None, None, :] > gt_cxy[..., 1:2] - rad[None, None, :])
        & (y[None, None, :] < gt_cxy[..., 1:2] + rad[None, None, :]))
    cand = (in_box | in_center) & gt_valid[:, :, None]
    return cand.any(axis=1)


def yolox_loss_fpn_weight(
    cls_logits: jnp.ndarray,
    reg_raw: jnp.ndarray,
    obj_logits: jnp.ndarray,
    priors_cxy: jnp.ndarray,
    priors_stride: jnp.ndarray,
    level_counts,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    sigmoid: bool = True,
    weight_mode: str = "minmax",
    neg_cls_terms: bool = False,
    axis_name: Optional[str] = None,
) -> YOLOXLossOut:
    """FPN-level-reweighted loss family.

    Behavioral references (yolox-drone/models/losses):
    - ``yolox_losses_fpn_weight.py`` — ``sigmoid=False``: ONE global
      SimOTA assignment on raw head outputs, each image's FPN levels
      weighted by positive counts (``generate_weights`` min-max
      formula), raw-probability BCE, total = sum_w(5*iou + obj + cls)
      / num_fg;
    - ``yolox_losses_fpn_weight_sigmoid.py`` (and its 640/960 fpn_size
      presets — pure config here, level_counts already derives from
      img_hw) — ``sigmoid=True``: sigmoid-both assignment cost and
      BCE-with-logits losses;
    - ``..._sigmoid640v2.py`` — ``weight_mode='softmax'``: the
      1.5 - softmax(count-fraction) weight formula;
    - ``yolox_losses_dw_sigmoid640.py`` — ``neg_cls_terms=True``:
      level weights pinned to 1.0 plus two extra negative-anchor cls
      terms: focal (alpha .25, gamma 2) vs zero targets on anchors
      OUTSIDE every gt box, and BCE-with-logits of the logits against
      THEMSELVES on in-box negatives (:278-292, reproduced verbatim —
      the self-target is the reference's code as written).
    """
    b, a, num_classes = cls_logits.shape
    grids = priors_cxy / priors_stride[:, None] - 0.5
    decoded = decode_boxes(reg_raw, grids, priors_stride)

    def assign_one(dec, cls_l, obj_l, gtb, gtl, gtv):
        cls_p = jax.nn.sigmoid(cls_l) if sigmoid else cls_l
        obj_p = jax.nn.sigmoid(obj_l) if sigmoid else obj_l
        return sim_ota_assign(
            priors_cxy, priors_stride, dec,
            jax.lax.stop_gradient(cls_p), jax.lax.stop_gradient(obj_p),
            gtb, gtl, gtv)

    fg, matched_gt, matched_iou = jax.vmap(assign_one)(
        decoded, cls_logits, obj_logits, gt_boxes, gt_labels, gt_valid)
    matched_iou = jax.lax.stop_gradient(matched_iou)
    num_fg = jnp.sum(fg.astype(jnp.float32))
    if axis_name is not None:
        num_fg = jax.lax.pmean(num_fg, axis_name)
    num_fg = jnp.maximum(num_fg, 1.0)

    safe_gt = jnp.maximum(matched_gt, 0)
    tgt_boxes = jnp.take_along_axis(gt_boxes, safe_gt[..., None], axis=1)
    tgt_labels = jnp.take_along_axis(gt_labels, safe_gt, axis=1)
    onehot = jax.nn.one_hot(tgt_labels, num_classes, dtype=cls_logits.dtype)
    cls_tgt = onehot * matched_iou[..., None]
    fg_f = fg.astype(jnp.float32)

    if neg_cls_terms:
        w = jnp.ones_like(fg_f)         # dw variant: weight = 1.0
    else:
        w = _level_weights(fg, level_counts, mode=weight_mode)

    bce = bce_with_logits if sigmoid else _bce_probs
    lb = iou_loss(decoded.reshape(-1, 4), tgt_boxes.reshape(-1, 4))
    loss_bbox = 5.0 * jnp.sum(
        lb * (fg_f * w).reshape(-1)) / num_fg
    loss_obj = jnp.sum(bce(obj_logits, fg_f) * w) / num_fg
    lc = bce(cls_logits, cls_tgt).sum(-1)
    loss_cls = jnp.sum(lc * fg_f * w) / num_fg

    total = loss_cls + loss_bbox + loss_obj
    if neg_cls_terms:
        cand = _candidate_mask(priors_cxy, priors_stride,
                               gt_boxes, gt_valid)
        outside = (~fg) & (~cand)
        inside_neg = (~fg) & cand
        ce0 = bce_with_logits(cls_logits, jnp.zeros_like(cls_logits))
        # target=0 arm of py_focal_loss_with_logits
        # (yolox_losses_dw_sigmoid640.py:27): its ``pt`` uses the RAW
        # LOGITS, not their sigmoid (reference quirk, kept verbatim) —
        # focal_weight = (1 - alpha) * logits**gamma = 0.75 * x^2
        focal0 = (0.75 * cls_logits ** 2 * ce0).sum(-1)
        loss_neg_out = jnp.sum(
            focal0 * outside.astype(jnp.float32)) / num_fg
        self_bce = bce_with_logits(cls_logits, cls_logits).sum(-1)
        loss_neg_in = jnp.sum(
            self_bce * inside_neg.astype(jnp.float32)) / num_fg
        total = total + loss_neg_out + loss_neg_in

    return YOLOXLossOut(total, loss_cls, loss_bbox, loss_obj,
                        jnp.zeros(()), num_fg)


def yolox_loss_decoupled(
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
    """Decoupled cls/reg loss ablation.

    Behavioral reference: yolox-drone/models/losses/yolox_losses_decoupled.py
    — ``YOLOLoss = 1.0 * ClsLoss + 1.0 * RegLoss`` where the two halves
    run SEPARATE SimOTA assignments with swapped cost weights
    (ClsLoss: ``3*cls + 1*iou``, :284; RegLoss: ``cls + 3*iou``, :668 —
    both on raw, un-sigmoided head outputs) and weight each image's FPN
    levels by its positive counts (``generate_weights``).  Losses are
    raw-probability BCE (nn.BCELoss) like the no-sigmoid variant, each
    half normalized by its own num_fg.

    level_counts: static per-level anchor counts summing to A.
    """
    b, a, num_classes = cls_logits.shape
    grids = priors_cxy / priors_stride[:, None] - 0.5
    decoded = decode_boxes(reg_raw, grids, priors_stride)

    def assign(cls_w, iou_w):
        def one(dec, cls_l, obj_l, gtb, gtl, gtv):
            return sim_ota_assign(
                priors_cxy, priors_stride, dec,
                jax.lax.stop_gradient(cls_l),
                jax.lax.stop_gradient(obj_l),
                gtb, gtl, gtv,
                cls_cost_weight=cls_w, iou_cost_weight=iou_w)

        return jax.vmap(one)(decoded, cls_logits, obj_logits,
                             gt_boxes, gt_labels, gt_valid)

    def norm_fg(fg):
        n = jnp.sum(fg.astype(jnp.float32))
        if axis_name is not None:
            n = jax.lax.pmean(n, axis_name)
        return jnp.maximum(n, 1.0)

    # --- cls half: 3*cls + 1*iou assignment --------------------------------
    fg_c, matched_gt_c, matched_iou_c = assign(3.0, 1.0)
    matched_iou_c = jax.lax.stop_gradient(matched_iou_c)
    num_fg_c = norm_fg(fg_c)
    safe_c = jnp.maximum(matched_gt_c, 0)
    tgt_labels_c = jnp.take_along_axis(gt_labels, safe_c, axis=1)
    onehot = jax.nn.one_hot(tgt_labels_c, num_classes,
                            dtype=cls_logits.dtype)
    cls_tgt = onehot * matched_iou_c[..., None]
    w_cls = _level_weights(fg_c, level_counts)  # (B, A)
    lc = _bce_probs(cls_logits, cls_tgt).sum(-1)
    loss_cls = jnp.sum(
        lc * fg_c.astype(jnp.float32) * w_cls) / num_fg_c

    # --- reg half: cls + 3*iou assignment ----------------------------------
    fg_r, matched_gt_r, _ = assign(1.0, 3.0)
    num_fg_r = norm_fg(fg_r)
    safe_r = jnp.maximum(matched_gt_r, 0)
    tgt_boxes_r = jnp.take_along_axis(gt_boxes, safe_r[..., None], axis=1)
    w_reg = _level_weights(fg_r, level_counts)
    fg_rf = fg_r.astype(jnp.float32)
    lb = iou_loss(decoded.reshape(-1, 4), tgt_boxes_r.reshape(-1, 4))
    loss_bbox = 5.0 * jnp.sum(
        lb * (fg_rf * w_reg).reshape(-1)) / num_fg_r
    # obj BCE over ALL anchors, level-weighted (RegLoss:587)
    loss_obj = jnp.sum(_bce_probs(obj_logits, fg_rf) * w_reg) / num_fg_r

    total = loss_cls + loss_bbox + loss_obj
    return YOLOXLossOut(total, loss_cls, loss_bbox, loss_obj,
                        jnp.zeros(()), num_fg_r)
