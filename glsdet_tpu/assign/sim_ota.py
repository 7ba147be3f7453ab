"""SimOTA dynamic-k label assignment as fixed-shape XLA.

Behavioral reference: ``yolox-ufp/mmdet/core/bbox/assigners/sim_ota_assigner.py:14``
and yolox-drone ``get_assignments`` (models/base/yolox_losses.py:188):

- candidates: prior centers inside a GT box OR inside the 2.5-strides
  center region of a GT,
- cost = BCE(sqrt(cls_sig*obj_sig), onehot) + 3 * (-log IoU)
  + 100000 * not(in-box AND in-center),
- dynamic k per GT = clamp(sum of top-10 candidate IoUs, >= 1),
- each GT takes its k lowest-cost anchors; anchors claimed by several GTs
  go to the lowest-cost GT.

The data-dependent k is realised as a masked fixed top-k: every GT ranks
its best ``candidate_topk`` anchors by cost and keeps ranks < k — the
standard TPU-friendly rewrite of the reference's per-GT ``topk(k=dynamic)``
loop (sim_ota_assigner.py:227).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from glsdet_tpu.losses import bce_with_logits
from glsdet_tpu.ops.boxes import pairwise_iou
from glsdet_tpu.ops.topk import topk_small_k

INF = 100000.0
EPS = 1e-8


class OTAResult(NamedTuple):
    fg_mask: jnp.ndarray       # (A,) bool
    matched_gt: jnp.ndarray    # (A,) int32 (-1 for bg)
    matched_iou: jnp.ndarray   # (A,) float32 IoU with matched GT


def sim_ota_assign(
    priors_cxy: jnp.ndarray,
    priors_stride: jnp.ndarray,
    decoded_boxes: jnp.ndarray,
    cls_probs: jnp.ndarray,
    obj_probs: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    center_radius: float = 2.5,
    candidate_topk: int = 10,
    cls_cost_weight: float = 1.0,
    iou_cost_weight: float = 3.0,
) -> OTAResult:
    """Fixed-shape SimOTA.

    Args:
        priors_cxy: (A, 2) prior centers in image coords.
        priors_stride: (A,).
        decoded_boxes: (A, 4) xyxy predictions.
        cls_probs: (A, C) sigmoid class probabilities (the no-sigmoid
            loss ablations pass raw head outputs here; the clip below
            keeps the sqrt/log in domain either way).
        obj_probs: (A,) sigmoid objectness.
        gt_boxes: (G, 4) padded xyxy.
        gt_labels: (G,) int32.
        gt_valid: (G,) bool.
        cls_cost_weight/iou_cost_weight: cost-term weights — baseline
            is cls + 3*iou; the decoupled ClsLoss ablation uses
            3*cls + 1*iou (yolox_losses_decoupled.py:284).
    """
    num_gt = gt_boxes.shape[0]
    num_classes = cls_probs.shape[-1]

    # --- candidate geometry -------------------------------------------------
    x, y = priors_cxy[:, 0], priors_cxy[:, 1]
    in_box = (
        (x[None, :] > gt_boxes[:, 0:1])
        & (x[None, :] < gt_boxes[:, 2:3])
        & (y[None, :] > gt_boxes[:, 1:2])
        & (y[None, :] < gt_boxes[:, 3:4])
    )  # (G, A)
    gt_cxy = (gt_boxes[:, :2] + gt_boxes[:, 2:4]) / 2.0
    rad = center_radius * priors_stride  # (A,)
    in_center = (
        (x[None, :] > gt_cxy[:, 0:1] - rad[None, :])
        & (x[None, :] < gt_cxy[:, 0:1] + rad[None, :])
        & (y[None, :] > gt_cxy[:, 1:2] - rad[None, :])
        & (y[None, :] < gt_cxy[:, 1:2] + rad[None, :])
    )
    in_box = in_box & gt_valid[:, None]
    in_center = in_center & gt_valid[:, None]
    is_cand = in_box.any(axis=0) | in_center.any(axis=0)  # (A,) fg candidates
    in_both = in_box & in_center  # (G, A)

    # --- cost matrix --------------------------------------------------------
    iou_mat = pairwise_iou(gt_boxes, decoded_boxes)  # (G, A)
    iou_mat = jnp.where(gt_valid[:, None], iou_mat, 0.0)
    iou_cost = -jnp.log(iou_mat + EPS)

    joint = jnp.sqrt(
        jnp.clip(cls_probs * obj_probs[:, None], EPS, 1.0))  # (A, C)
    onehot = jax.nn.one_hot(gt_labels, num_classes,
                            dtype=joint.dtype)  # (G, C)
    # binary CE between probabilities (not logits), summed over classes:
    # reference uses F.binary_cross_entropy on sqrt joint probs, whose
    # kernel clamps each log at -100 — replicate it so a saturated
    # sigmoid (f32 sigmoid(20) == 1.0 exactly) yields torch's finite
    # ~100*(1-t) cost instead of inf/NaN excluding the anchor.
    p = joint[None, :, :]  # (1, A, C)
    t = onehot[:, None, :]  # (G, 1, C)
    logp = jnp.maximum(jnp.log(p), -100.0)
    log1mp = jnp.where(
        p < 1.0,
        jnp.maximum(jnp.log1p(-jnp.where(p < 1.0, p, 0.0)), -100.0),
        -100.0)
    cls_cost = -(t * logp + (1 - t) * log1mp).sum(-1)  # (G, A)

    cost = (
        cls_cost_weight * cls_cost
        + iou_cost_weight * iou_cost
        + INF * (~in_both).astype(cls_cost.dtype)
        + INF * (~is_cand[None, :]).astype(cls_cost.dtype)
    )

    # --- dynamic-k ----------------------------------------------------------
    # bit-identical lax.top_k replacement: k masked argmax passes run as
    # full-lane VPU reductions instead of the ~1ms/row-set trailing-axis
    # sort lax.top_k lowers to (ops/topk.py)
    cand_iou = jnp.where(is_cand[None, :], iou_mat, 0.0)
    topk_ious, _ = topk_small_k(cand_iou, min(candidate_topk,
                                              cand_iou.shape[1]))
    dynamic_k = jnp.clip(topk_ious.sum(axis=1).astype(jnp.int32), 1,
                         candidate_topk)  # (G,)

    # per-GT: rank the candidate_topk lowest-cost anchors; keep rank < k
    neg_cost, idx = topk_small_k(-cost, min(candidate_topk, cost.shape[1]))
    ranks = jnp.arange(idx.shape[1])[None, :]  # (1, K)
    keep = (ranks < dynamic_k[:, None]) & (neg_cost > -INF / 2)  # (G, K)
    matching = jnp.zeros_like(cost, dtype=bool)
    matching = jax.vmap(
        lambda m, i, k: m.at[i].set(k))(matching, idx, keep)
    matching = matching & gt_valid[:, None]

    # --- conflicts: anchor goes to lowest-cost GT ---------------------------
    cost_masked = jnp.where(matching, cost, INF * 2)
    best_gt = jnp.argmin(cost_masked, axis=0)  # (A,)
    fg = matching.any(axis=0)
    matched_gt = jnp.where(fg, best_gt, -1)
    matched_iou = jnp.where(
        fg, jnp.take_along_axis(iou_mat, best_gt[None, :], axis=0)[0], 0.0)
    return OTAResult(fg, matched_gt.astype(jnp.int32), matched_iou)
