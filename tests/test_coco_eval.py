"""Numpy COCOeval tests: hand-computed fixtures.

The reference relies on pycocotools (plus a vendored editable copy at
yolox-drone/models/core/cocoeval.py); this validates our self-contained
reimplementation on cases whose AP can be derived by hand.
"""

import numpy as np

from glsdet_tpu.eval.coco_eval import CocoEvaluator, summarize


def _gt(boxes, labels):
    return (np.asarray(boxes, np.float64).reshape(-1, 4),
            np.asarray(labels, np.int64))


def _det(boxes, scores, labels):
    return (np.asarray(boxes, np.float64).reshape(-1, 4),
            np.asarray(scores, np.float64),
            np.asarray(labels, np.int64))


class TestCocoEval:
    def test_perfect_detections(self):
        gts = {1: _gt([[10, 10, 20, 20], [50, 50, 10, 10]], [0, 1])}
        dets = {1: _det([[10, 10, 20, 20], [50, 50, 10, 10]],
                        [0.9, 0.8], [0, 1])}
        ev = CocoEvaluator(num_classes=2)
        res = ev.evaluate(gts, dets)
        assert res.ap == 1.0
        assert res.ap50 == 1.0

    def test_no_detections(self):
        gts = {1: _gt([[10, 10, 20, 20]], [0])}
        dets = {1: _det(np.zeros((0, 4)), [], [])}
        res = CocoEvaluator(num_classes=1).evaluate(gts, dets)
        assert res.ap == 0.0

    def test_half_recall(self):
        # two GTs, one perfect det -> precision 1 at recall .5, 0 beyond.
        # 101-pt AP = 51/101 (recall thresholds 0.0..0.5 inclusive).
        gts = {1: _gt([[0, 0, 10, 10], [100, 100, 10, 10]], [0, 0])}
        dets = {1: _det([[0, 0, 10, 10]], [0.9], [0])}
        res = CocoEvaluator(num_classes=1).evaluate(gts, dets)
        assert np.isclose(res.ap, 51 / 101, atol=1e-6)

    def test_false_positive_ranked_above(self):
        # det1 (score .9) misses, det2 (score .8) hits the single GT:
        # precision at the hit = 1/2 -> AP = 0.5 (interp over all recalls)
        gts = {1: _gt([[0, 0, 10, 10]], [0])}
        dets = {1: _det([[50, 50, 10, 10], [0, 0, 10, 10]],
                        [0.9, 0.8], [0, 0])}
        res = CocoEvaluator(num_classes=1).evaluate(gts, dets)
        assert np.isclose(res.ap, 0.5, atol=1e-6)

    def test_iou_threshold_sensitivity(self):
        # det overlaps GT with IoU ~0.6: counts for thr .5/.55/.6 only
        gts = {1: _gt([[0, 0, 10, 10]], [0])}
        # shifted box: x 0..10 vs 0..10, y 2..12 overlap 8 -> iou 80/120=.667
        dets = {1: _det([[0, 2, 10, 10]], [0.9], [0])}
        res = CocoEvaluator(num_classes=1).evaluate(gts, dets)
        # matches at iou thr .5, .55, .6, .65 -> 4/10 thresholds
        assert np.isclose(res.ap, 0.4, atol=1e-6)
        assert res.ap50 == 1.0

    def test_max_dets_cap(self):
        # 3 dets for 3 GTs but maxDets=1 keeps only the top-scoring one
        gts = {1: _gt([[0, 0, 10, 10], [20, 0, 10, 10], [40, 0, 10, 10]],
                      [0, 0, 0])}
        dets = {1: _det([[0, 0, 10, 10], [20, 0, 10, 10], [40, 0, 10, 10]],
                        [0.9, 0.8, 0.7], [0, 0, 0])}
        ev = CocoEvaluator(num_classes=1, max_dets=(1, 2, 3))
        res = ev.evaluate(gts, dets)
        # AR@1 = 1/3, AR@2 = 2/3, AR@3 = 1
        assert np.isclose(res.stats[6], 1 / 3, atol=1e-6)
        assert np.isclose(res.stats[7], 2 / 3, atol=1e-6)
        assert np.isclose(res.stats[8], 1.0, atol=1e-6)

    def test_small_area_bucket(self):
        # small GT (16x16 < 32^2) only: AP small == AP all, AP large == -1
        gts = {1: _gt([[0, 0, 16, 16]], [0])}
        dets = {1: _det([[0, 0, 16, 16]], [0.9], [0])}
        res = CocoEvaluator(num_classes=1).evaluate(gts, dets)
        assert res.stats[3] == 1.0   # AP small
        assert res.stats[5] == -1.0  # AP large: no GTs

    def test_multiclass_independent(self):
        gts = {1: _gt([[0, 0, 10, 10], [20, 20, 10, 10]], [0, 1])}
        dets = {1: _det([[0, 0, 10, 10]], [0.9], [0])}  # class 1 missed
        res = CocoEvaluator(num_classes=2).evaluate(gts, dets)
        assert np.isclose(res.per_class_ap[0], 1.0)
        assert np.isclose(res.per_class_ap[1], 0.0)
        assert np.isclose(res.ap, 0.5, atol=1e-6)

    def test_summarize_runs(self):
        gts = {1: _gt([[0, 0, 10, 10]], [0])}
        dets = {1: _det([[0, 0, 10, 10]], [0.9], [0])}
        res = CocoEvaluator(num_classes=1).evaluate(gts, dets)
        txt = summarize(res, class_names=["car"])
        assert "AP@[.5:.95]" in txt and "car" in txt
