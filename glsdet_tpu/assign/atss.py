"""ATSS label assignment as a fixed-shape, vmappable XLA program.

Behavioral reference: ``yolox-ufp/mmdet/core/bbox/assigners/atss_assigner.py:16``
(topk=9).  Algorithm per GT:

1. take the ``topk`` anchors closest (center L2) to the GT center *per
   pyramid level* as candidates,
2. adaptive IoU threshold = mean + std of candidate IoUs,
3. positives = candidates with IoU >= threshold whose center lies inside
   the GT box (margin 0.01, atss_assigner.py:141-147),
4. anchors claimed by multiple GTs go to the highest-IoU GT.

All steps are masked fixed-shape ops: GTs are padded to a static ``G``
with a validity mask; the per-level top-k runs as a static python loop
over levels (level sizes are static under jit).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from glsdet_tpu.ops.boxes import pairwise_iou
from glsdet_tpu.ops.topk import topk_small_k

INF = 1e8


class AssignResult(NamedTuple):
    """Fixed-shape assignment output over A anchors."""

    assigned_gt: jnp.ndarray  # (A,) int32, index into GT list, -1 = bg
    labels: jnp.ndarray       # (A,) int32, class id, num_classes = bg
    max_iou: jnp.ndarray      # (A,) float, IoU with assigned GT (0 for bg)


def atss_assign(
    anchors: jnp.ndarray,
    num_level_anchors: Sequence[int],
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    num_classes: int,
    topk: int = 9,
) -> AssignResult:
    """Assign anchors to (padded) GTs with ATSS.

    Args:
        anchors: (A, 4) xyxy.
        num_level_anchors: static per-level anchor counts summing to A.
        gt_boxes: (G, 4) xyxy, padded.
        gt_labels: (G,) int32.
        gt_valid: (G,) bool.
    """
    num_gt, a = gt_boxes.shape[0], anchors.shape[0]
    iou_mat = pairwise_iou(gt_boxes, anchors)  # (G, A)
    iou_mat = jnp.where(gt_valid[:, None], iou_mat, 0.0)

    gt_cxy = (gt_boxes[:, :2] + gt_boxes[:, 2:4]) / 2.0
    an_cxy = (anchors[:, :2] + anchors[:, 2:4]) / 2.0
    dist = jnp.linalg.norm(gt_cxy[:, None, :] - an_cxy[None, :, :],
                           axis=-1)  # (G, A)

    # per-level top-k closest anchors -> candidate mask
    cand = jnp.zeros((num_gt, a), dtype=bool)
    start = 0
    for n in num_level_anchors:
        k = min(topk, n)
        # bit-identical small-k top-k (ops/topk.py): k argmax
        # passes beat the trailing-axis sort lax.top_k lowers to
        _, idx = topk_small_k(-dist[:, start:start + n], k)  # (G, k)
        level_mask = jnp.zeros((num_gt, n), dtype=bool)
        level_mask = jax.vmap(
            lambda m, i: m.at[i].set(True))(level_mask, idx)
        cand = cand.at[:, start:start + n].set(level_mask)
        start += n

    # adaptive threshold from candidate IoUs.  The reference takes torch
    # ``.std(0)`` (atss_assigner.py:134) which is the UNBIASED estimator,
    # so the masked variance divides by (n-1), not n.
    cand_f = cand.astype(iou_mat.dtype)
    n_cand = jnp.maximum(cand_f.sum(axis=1), 1.0)
    mean = (iou_mat * cand_f).sum(axis=1) / n_cand
    var = (((iou_mat - mean[:, None]) ** 2 * cand_f).sum(axis=1)
           / jnp.maximum(n_cand - 1.0, 1.0))
    thr = mean + jnp.sqrt(var)  # (G,)

    # center-inside-gt check (margin 0.01)
    l = an_cxy[None, :, 0] - gt_boxes[:, None, 0]
    t = an_cxy[None, :, 1] - gt_boxes[:, None, 1]
    r = gt_boxes[:, None, 2] - an_cxy[None, :, 0]
    b = gt_boxes[:, None, 3] - an_cxy[None, :, 1]
    inside = jnp.minimum(jnp.minimum(l, t), jnp.minimum(r, b)) > 0.01

    is_pos = cand & (iou_mat >= thr[:, None]) & inside & gt_valid[:, None]

    # conflict resolution: anchor -> argmax-IoU among claiming GTs
    claimed_iou = jnp.where(is_pos, iou_mat, -INF)  # (G, A)
    best_gt = jnp.argmax(claimed_iou, axis=0)  # (A,)
    best_iou = jnp.max(claimed_iou, axis=0)
    fg = best_iou > -INF / 2
    assigned_gt = jnp.where(fg, best_gt, -1)
    labels = jnp.where(fg, gt_labels[best_gt], num_classes)
    max_iou = jnp.where(fg, jnp.take_along_axis(
        iou_mat, best_gt[None, :], axis=0)[0], 0.0)
    return AssignResult(assigned_gt.astype(jnp.int32),
                        labels.astype(jnp.int32), max_iou)
