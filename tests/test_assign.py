"""Assigner unit tests (fixed-shape ATSS / SimOTA).

Modeled on the reference's tests/test_utils/test_assigner.py idiom: tiny
synthetic anchor/GT sets with hand-checkable expected assignments.
"""

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
