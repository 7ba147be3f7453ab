"""Decode + postprocess tests vs numpy oracles.

Reference semantics: YOLOX decode (utils_bbox.py:254 — cx=(grid+pred)*s,
wh=exp(pred)*s) and GFL integral decode + DistancePoint coder."""

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.eval.postprocess import gfl_postprocess, yolox_postprocess
from glsdet_tpu.models.yolox_head import decode_boxes, level_priors
from glsdet_tpu.ops.integral import bbox2distance, distance2bbox, integral_decode


class TestYOLOXDecode:
    def test_decode_oracle(self):
        grids = jnp.asarray([[0.0, 0.0], [1.0, 0.0]])
        strides = jnp.asarray([8.0, 8.0])
        reg = jnp.asarray([[[0.5, 0.5, 0.0, 0.0],
                            [0.0, 0.0, float(np.log(2)), 0.0]]])
        out = np.asarray(decode_boxes(reg, grids, strides))[0]
        # box0: center (4, 4), wh (8, 8) -> [0, 0, 8, 8]
        np.testing.assert_allclose(out[0], [0, 0, 8, 8], atol=1e-5)
        # box1: center (8, 0), wh (16, 8) -> [0, -4, 16, 4]
        np.testing.assert_allclose(out[1], [0, -4, 16, 4], atol=1e-5)

    def test_postprocess_finds_planted_box(self):
        """Plant one confident detection in otherwise-background maps."""
        hw = (64, 64)
        shapes = [(8, 8), (4, 4), (2, 2)]
        cls = [jnp.full((1, h, w, 3), -10.0) for h, w in shapes]
        reg = [jnp.zeros((1, h, w, 4)) for h, w in shapes]
        obj = [jnp.full((1, h, w, 1), -10.0) for h, w in shapes]
        # plant at level 0, cell (2, 3), class 1
        cls[0] = cls[0].at[0, 2, 3, 1].set(8.0)
        obj[0] = obj[0].at[0, 2, 3, 0].set(8.0)
        reg[0] = reg[0].at[0, 2, 3].set(
            jnp.asarray([0.5, 0.5, float(np.log(2)), float(np.log(2))]))
        out = yolox_postprocess(cls, reg, obj, hw, score_thr=0.5,
                                max_dets=10)
        v = np.asarray(out["valid"][0])
        assert v.sum() == 1
        b = np.asarray(out["boxes"][0][v][0])
        # center ((3+0.5)*8, (2+0.5)*8) = (28, 20), wh 16 -> [20,12,36,28]
        np.testing.assert_allclose(b, [20, 12, 36, 28], atol=1e-4)
        assert int(out["labels"][0][v][0]) == 1

    def test_nms_suppresses_duplicates(self):
        hw = (64, 64)
        shapes = [(8, 8), (4, 4), (2, 2)]
        cls = [jnp.full((1, h, w, 2), -10.0) for h, w in shapes]
        reg = [jnp.zeros((1, h, w, 4)) for h, w in shapes]
        obj = [jnp.full((1, h, w, 1), -10.0) for h, w in shapes]
        # two adjacent cells predicting the same box
        for cell in [(2, 3), (2, 4)]:
            cls[0] = cls[0].at[0, cell[0], cell[1], 0].set(8.0)
            obj[0] = obj[0].at[0, cell[0], cell[1], 0].set(8.0)
        # make cell (2,4) predict a box centered like (2,3)'s
        reg[0] = reg[0].at[0, 2, 4].set(
            jnp.asarray([-0.5, 0.5, float(np.log(2)), float(np.log(2))]))
        reg[0] = reg[0].at[0, 2, 3].set(
            jnp.asarray([0.5, 0.5, float(np.log(2)), float(np.log(2))]))
        out = yolox_postprocess(cls, reg, obj, hw, score_thr=0.5,
                                iou_thr=0.5, max_dets=10)
        assert int(np.asarray(out["valid"][0]).sum()) == 1


class TestGFLDecode:
    def test_integral_peak(self):
        # distribution peaked at bin 5 on each side -> distance 5
        logits = np.full((1, 4 * 17), -20.0, np.float32)
        for side in range(4):
            logits[0, side * 17 + 5] = 20.0
        d = np.asarray(integral_decode(jnp.asarray(logits), 16))
        np.testing.assert_allclose(d[0], [5, 5, 5, 5], atol=1e-4)

    def test_distance_roundtrip(self):
        pts = jnp.asarray([[10.0, 20.0]])
        box = jnp.asarray([[6.0, 15.0, 18.0, 26.0]])
        d = bbox2distance(pts, box)
        back = distance2bbox(pts, d)
        np.testing.assert_allclose(np.asarray(back), np.asarray(box),
                                   atol=1e-5)

    def test_gfl_postprocess_planted(self):
        hw = (64, 64)
        shapes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
        cls = [jnp.full((1, h, w, 3), -10.0) for h, w in shapes]
        reg = [jnp.zeros((1, h, w, 68)) for h, w in shapes]
        cls[0] = cls[0].at[0, 3, 3, 2].set(6.0)
        # distances peaked at 4 bins -> ltrb = 4 * stride 8 = 32
        r = np.full((68,), -20.0, np.float32)
        for side in range(4):
            r[side * 17 + 4] = 20.0
        reg[0] = reg[0].at[0, 3, 3].set(jnp.asarray(r))
        out = gfl_postprocess(cls, reg, hw, score_thr=0.5, max_dets=5)
        v = np.asarray(out["valid"][0])
        assert v.sum() == 1
        b = np.asarray(out["boxes"][0][v][0])
        # center (3*8, 3*8)=(24,24) offset 0; ltrb 32 -> clipped to [0,56]
        np.testing.assert_allclose(b, [0, 0, 56, 56], atol=1e-3)
