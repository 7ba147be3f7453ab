"""Assigner unit tests (fixed-shape ATSS / SimOTA).

Modeled on the reference's tests/test_utils/test_assigner.py idiom: tiny
synthetic anchor/GT sets with hand-checkable expected assignments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glsdet_tpu.assign import atss_assign, sim_ota_assign
from glsdet_tpu.ops.priors import grid_anchors, grid_points


def _pad_gts(boxes, labels, max_gt=8):
    g = len(boxes)
    gt_boxes = np.zeros((max_gt, 4), np.float32)
    gt_labels = np.zeros((max_gt,), np.int32)
    gt_valid = np.zeros((max_gt,), bool)
    if g:
        gt_boxes[:g] = boxes
        gt_labels[:g] = labels
        gt_valid[:g] = True
    return jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid)


class TestATSS:
    def test_single_gt_assigns_nearby_anchors(self):
        anchors, counts = grid_anchors((64, 64), [8, 16], octave_base_scale=2)
        gt_boxes, gt_labels, gt_valid = _pad_gts(
            [[16, 16, 40, 40]], [3])
        res = atss_assign(jnp.asarray(anchors), counts, gt_boxes, gt_labels,
                          gt_valid, num_classes=10)
        fg = np.asarray(res.assigned_gt >= 0)
        assert fg.sum() > 0
        # all positives assigned to gt 0 with label 3
        assert np.all(np.asarray(res.labels)[fg] == 3)
        # positive anchor centers lie inside the GT box
        ctr = (anchors[:, :2] + anchors[:, 2:]) / 2
        assert np.all(ctr[fg, 0] > 16) and np.all(ctr[fg, 0] < 40)
        assert np.all(ctr[fg, 1] > 16) and np.all(ctr[fg, 1] < 40)

    def test_no_valid_gt_all_background(self):
        anchors, counts = grid_anchors((32, 32), [8])
        gt_boxes, gt_labels, gt_valid = _pad_gts([], [])
        res = atss_assign(jnp.asarray(anchors), counts, gt_boxes, gt_labels,
                          gt_valid, num_classes=10)
        assert np.all(np.asarray(res.assigned_gt) == -1)
        assert np.all(np.asarray(res.labels) == 10)

    def test_conflict_goes_to_higher_iou_gt(self):
        anchors, counts = grid_anchors((32, 32), [8], octave_base_scale=2)
        # two overlapping GTs; the shared anchor should pick the better IoU
        gt_boxes, gt_labels, gt_valid = _pad_gts(
            [[4, 4, 28, 28], [6, 6, 26, 26]], [1, 2])
        res = atss_assign(jnp.asarray(anchors), counts, gt_boxes, gt_labels,
                          gt_valid, num_classes=10)
        fg = np.asarray(res.assigned_gt >= 0)
        assert fg.sum() > 0
        # every positive points at the gt with the larger IoU for it
        from glsdet_tpu.ops.boxes import pairwise_iou
        ious = np.asarray(pairwise_iou(gt_boxes[:2], jnp.asarray(anchors)))
        want = np.argmax(ious, axis=0)
        got = np.asarray(res.assigned_gt)
        assert np.all(got[fg] == want[fg])


def _atss_oracle(anchors, num_level_anchors, gt_boxes, gt_labels,
                 num_classes, topk=9):
    """Torch oracle mirroring the reference ATSS assigner semantics
    (atss_assigner.py:100-160): per-level topk by center distance,
    threshold = mean + UNBIASED std (torch .std(0)) of candidate IoUs,
    center-inside-gt margin 0.01, conflicts to the max-IoU GT.
    """
    import torch

    anchors = torch.as_tensor(anchors, dtype=torch.float64)
    gt_boxes = torch.as_tensor(gt_boxes, dtype=torch.float64)
    num_gt, num_anchor = gt_boxes.shape[0], anchors.shape[0]
    from glsdet_tpu.ops.boxes import pairwise_iou
    overlaps = torch.as_tensor(np.asarray(pairwise_iou(
        jnp.asarray(np.asarray(gt_boxes)), jnp.asarray(np.asarray(anchors)))
    ).T, dtype=torch.float64)  # (A, G)

    gt_pts = (gt_boxes[:, :2] + gt_boxes[:, 2:]) / 2.0
    an_pts = (anchors[:, :2] + anchors[:, 2:]) / 2.0
    distances = (an_pts[:, None, :] - gt_pts[None, :, :]).pow(2).sum(-1).sqrt()

    candidate_idxs = []
    start = 0
    for n in num_level_anchors:
        k = min(topk, n)
        _, idx = distances[start:start + n, :].topk(k, dim=0, largest=False)
        candidate_idxs.append(idx + start)
        start += n
    candidate_idxs = torch.cat(candidate_idxs, dim=0)  # (K, G)

    cand_overlaps = overlaps[candidate_idxs, torch.arange(num_gt)]
    thr = cand_overlaps.mean(0) + cand_overlaps.std(0)
    is_pos = cand_overlaps >= thr[None, :]

    l_ = an_pts[candidate_idxs, 0] - gt_boxes[None, :, 0]
    t_ = an_pts[candidate_idxs, 1] - gt_boxes[None, :, 1]
    r_ = gt_boxes[None, :, 2] - an_pts[candidate_idxs, 0]
    b_ = gt_boxes[None, :, 3] - an_pts[candidate_idxs, 1]
    inside = torch.stack([l_, t_, r_, b_], dim=1).min(dim=1)[0] > 0.01
    is_pos = is_pos & inside

    INF = 10 ** 8
    overlaps_inf = torch.full_like(overlaps, -INF)
    for g in range(num_gt):
        sel = candidate_idxs[:, g][is_pos[:, g]]
        overlaps_inf[sel, g] = overlaps[sel, g]
    max_ov, argmax_ov = overlaps_inf.max(dim=1)
    assigned = torch.where(max_ov > -INF / 2, argmax_ov,
                           torch.full_like(argmax_ov, -1))
    labels = np.where(assigned.numpy() >= 0,
                      np.asarray(gt_labels)[assigned.clamp(min=0).numpy()],
                      num_classes)
    return assigned.numpy(), labels, thr.numpy()


class TestATSSReferenceParity:
    """Randomized parity vs a torch oracle of atss_assigner.py numerics.

    Catches the biased/unbiased std distinction (torch .std(0) is n-1):
    with topk=9 the correction shifts thresholds ~6%, flipping anchors
    near the adaptive threshold.
    """

    @pytest.mark.parametrize("seed", range(6))
    def test_randomized_parity(self, seed):
        rng = np.random.RandomState(seed)
        anchors, counts = grid_anchors((64, 64), [8, 16, 32],
                                       octave_base_scale=4)
        g = rng.randint(1, 7)
        cxy = rng.uniform(8, 56, (g, 2))
        wh = rng.uniform(6, 48, (g, 2))
        boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
        boxes = np.clip(boxes, 0, 64).astype(np.float32)
        labels = rng.randint(0, 10, (g,))

        gt_boxes, gt_labels, gt_valid = _pad_gts(boxes, labels)
        res = atss_assign(jnp.asarray(anchors), counts, gt_boxes, gt_labels,
                          gt_valid, num_classes=10)
        want_assigned, want_labels, _ = _atss_oracle(
            anchors, counts, boxes, labels, num_classes=10)
        np.testing.assert_array_equal(np.asarray(res.assigned_gt),
                                      want_assigned)
        np.testing.assert_array_equal(np.asarray(res.labels), want_labels)

    def test_threshold_matches_unbiased_std(self):
        # direct numeric check of the mean + std(n-1) threshold on a fixture
        anchors, counts = grid_anchors((32, 32), [8, 16],
                                       octave_base_scale=4)
        boxes = np.array([[4.0, 4.0, 28.0, 28.0]], np.float32)
        _, _, thr = _atss_oracle(anchors, counts, boxes, [0], num_classes=10)

        from glsdet_tpu.ops.boxes import pairwise_iou
        iou = np.asarray(pairwise_iou(jnp.asarray(boxes),
                                      jnp.asarray(anchors)))[0]
        gt_c = np.array([16.0, 16.0])
        an_c = (anchors[:, :2] + anchors[:, 2:]) / 2
        d = np.linalg.norm(an_c - gt_c, axis=1)
        cand = []
        start = 0
        for n in counts:
            k = min(9, n)
            cand.extend(start + np.argsort(d[start:start + n])[:k])
            start += n
        cand_iou = iou[np.asarray(cand)]
        want = cand_iou.mean() + cand_iou.std(ddof=1)
        np.testing.assert_allclose(thr[0], want, rtol=1e-6)

        gt_boxes, gt_labels, gt_valid = _pad_gts(boxes, [0])
        res = atss_assign(jnp.asarray(anchors), counts, gt_boxes,
                          gt_labels, gt_valid, num_classes=10)
        got_fg = np.asarray(res.assigned_gt) >= 0
        inside = np.minimum.reduce([
            an_c[:, 0] - boxes[0, 0], an_c[:, 1] - boxes[0, 1],
            boxes[0, 2] - an_c[:, 0], boxes[0, 3] - an_c[:, 1]]) > 0.01
        want_fg = np.zeros(len(anchors), bool)
        want_fg[np.asarray(cand)] = cand_iou >= want
        want_fg &= inside
        np.testing.assert_array_equal(got_fg, want_fg)


class TestSimOTA:
    def _run(self, gt, labels, seed=0, a_hw=(64, 64)):
        centers, strides, _ = grid_points(a_hw, [8, 16, 32])
        a = centers.shape[0]
        rng = np.random.RandomState(seed)
        # predictions: boxes exactly on priors (16px squares), mild scores
        boxes = np.concatenate([centers - 8, centers + 8], axis=-1)
        cls_probs = np.full((a, 10), 0.3, np.float32)
        obj = np.full((a,), 0.5, np.float32)
        gt_boxes, gt_labels, gt_valid = _pad_gts(gt, labels)
        return sim_ota_assign(
            jnp.asarray(centers), jnp.asarray(strides), jnp.asarray(boxes),
            jnp.asarray(cls_probs), jnp.asarray(obj), gt_boxes, gt_labels,
            gt_valid)

    def test_basic_assignment(self):
        res = self._run([[8, 8, 40, 40]], [2])
        fg = np.asarray(res.fg_mask)
        assert fg.sum() >= 1
        assert np.all(np.asarray(res.matched_gt)[fg] == 0)
        assert np.all(np.asarray(res.matched_iou)[fg] > 0)

    def test_empty_gt(self):
        res = self._run([], [])
        assert np.asarray(res.fg_mask).sum() == 0
        assert np.all(np.asarray(res.matched_gt) == -1)

    def test_two_gts_disjoint(self):
        res = self._run([[0, 0, 24, 24], [40, 40, 64, 64]], [1, 5])
        fg = np.asarray(res.fg_mask)
        m = np.asarray(res.matched_gt)
        assert (m[fg] == 0).sum() >= 1 and (m[fg] == 1).sum() >= 1

    def test_each_anchor_single_gt(self):
        res = self._run([[4, 4, 36, 36], [8, 8, 40, 40]], [1, 1])
        # no anchor may be double-assigned (fg_mask anchors carry exactly
        # one matched_gt) — structural property of the conflict resolution
        fg = np.asarray(res.fg_mask)
        m = np.asarray(res.matched_gt)
        assert np.all(m[fg] >= 0)
        assert np.all(m[~fg] == -1)


def test_topk_small_k_matches_lax():
    """ops/topk.py is a bit-identical lax.top_k drop-in (incl. ties)."""
    from glsdet_tpu.ops.topk import topk_small_k

    rs = np.random.RandomState(0)
    x = rs.rand(7, 160, 257).astype(np.float32)
    # force ties
    x[:, :, 1::3] = x[:, :, ::3][:, :, : x[:, :, 1::3].shape[2]]
    v0, i0 = jax.lax.top_k(jnp.asarray(x), 10)
    v1, i1 = topk_small_k(jnp.asarray(x), 10)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # k >= n fallback
    v0, i0 = jax.lax.top_k(jnp.asarray(x[..., :8]), 8)
    v1, i1 = topk_small_k(jnp.asarray(x[..., :8]), 8)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_first_k_true_matches_topk_mask_idiom():
    """first_k_true == the lax.top_k(mask.astype(f32), k) selection."""
    from glsdet_tpu.ops.topk import first_k_true

    rs = np.random.RandomState(1)
    for frac in (0.0, 0.01, 0.5, 1.0):
        mask = rs.rand(6, 500) < frac
        k = 32
        _, i0 = jax.lax.top_k(jnp.asarray(mask, jnp.float32), k)
        v0 = np.take_along_axis(mask, np.asarray(i0), axis=1)
        i1, v1 = first_k_true(jnp.asarray(mask), k)
        np.testing.assert_array_equal(v0, np.asarray(v1))
        # valid slots: identical indices
        np.testing.assert_array_equal(
            np.where(v0, np.asarray(i0), -1), np.where(v0, np.asarray(i1), -1))
