"""VOC mAP + ignore-filter tests with hand-computed fixtures."""

import numpy as np

from glsdet_tpu.eval.ignore import filter_ignore_regions
from glsdet_tpu.eval.voc_map import eval_voc_map, voc_ap


class TestVocAP:
    def test_perfect(self):
        ap = voc_ap(np.array([1.0]), np.array([1.0]))
        assert ap == 1.0

    def test_half_precision_flat(self):
        # precision 0.5 at all recalls
        ap = voc_ap(np.array([0.5, 1.0]), np.array([0.5, 0.5]))
        assert np.isclose(ap, 0.5)

    def test_envelope(self):
        # precision rises later -> earlier points lifted by the envelope
        ap = voc_ap(np.array([0.5, 1.0]), np.array([0.3, 0.8]))
        assert np.isclose(ap, 0.8)


class TestEvalVocMap:
    def test_perfect_detections(self):
        gts = {0: (np.array([[0., 0, 10, 10]]), np.array([0]))}
        dets = {0: (np.array([[0., 0, 10, 10]]), np.array([0.9]),
                    np.array([0]))}
        res = eval_voc_map(gts, dets, 1)
        assert res["map"] == 1.0

    def test_miss_and_fp(self):
        gts = {0: (np.array([[0., 0, 10, 10], [50., 50, 60, 60]]),
                   np.array([0, 0]))}
        dets = {0: (np.array([[0., 0, 10, 10], [100., 100, 110, 110]]),
                    np.array([0.9, 0.8]), np.array([0, 0]))}
        res = eval_voc_map(gts, dets, 1)
        # recall .5 with precision 1 at first det -> AP = 0.5
        assert np.isclose(res["map"], 0.5)

    def test_class_with_no_gt_is_nan_excluded(self):
        gts = {0: (np.array([[0., 0, 10, 10]]), np.array([0]))}
        dets = {0: (np.array([[0., 0, 10, 10]]), np.array([0.9]),
                    np.array([0]))}
        res = eval_voc_map(gts, dets, 3)
        assert np.isnan(res["per_class"][1]["ap"])
        assert res["map"] == 1.0


class TestIgnoreFilter:
    def test_drops_centered_inside(self):
        boxes = np.array([[0., 0, 10, 10], [100., 100, 120, 120]])
        scores = np.array([0.9, 0.8])
        labels = np.array([0, 1])
        ig = np.array([[95., 95, 130, 130]])
        b, s, l = filter_ignore_regions(boxes, scores, labels, ig)
        assert len(b) == 1 and l[0] == 0

    def test_no_ignore_passthrough(self):
        boxes = np.array([[0., 0, 10, 10]])
        b, s, l = filter_ignore_regions(
            boxes, np.array([0.9]), np.array([0]), np.zeros((0, 4)))
        assert len(b) == 1
