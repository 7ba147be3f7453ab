"""Box geometry vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from glsdet_tpu.ops import boxes as B


def np_pairwise_iou(b1, b2, offset=0.0):
    n, m = len(b1), len(b2)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            xx1 = max(b1[i, 0], b2[j, 0])
            yy1 = max(b1[i, 1], b2[j, 1])
            xx2 = min(b1[i, 2], b2[j, 2])
            yy2 = min(b1[i, 3], b2[j, 3])
            w = max(0.0, xx2 - xx1 + offset)
            h = max(0.0, yy2 - yy1 + offset)
            inter = w * h
            a1 = max(0.0, b1[i, 2] - b1[i, 0] + offset) * max(0.0, b1[i, 3] - b1[i, 1] + offset)
            a2 = max(0.0, b2[j, 2] - b2[j, 0] + offset) * max(0.0, b2[j, 3] - b2[j, 1] + offset)
            denom = a1 + a2 - inter
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out


def random_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_pairwise_iou_matches_numpy():
    rng = np.random.RandomState(0)
    b1, b2 = random_boxes(rng, 13), random_boxes(rng, 7)
    got = np.asarray(B.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    want = np_pairwise_iou(b1, b2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pairwise_iou_legacy_offset():
    rng = np.random.RandomState(1)
    b1, b2 = random_boxes(rng, 5), random_boxes(rng, 5)
    got = np.asarray(B.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2), offset=1.0))
    want = np_pairwise_iou(b1, b2, offset=1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_iof_normalizes_by_first_area():
    # Reference compute_iof (ufpmp_det_eval.py:36): inter / area(box1).
    small = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
    big = jnp.asarray([[0.0, 0.0, 100.0, 100.0]])
    np.testing.assert_allclose(np.asarray(B.pairwise_iof(small, big)), [[1.0]], atol=1e-6)
    got = np.asarray(B.pairwise_iof(big, small))
    np.testing.assert_allclose(got, [[100.0 / 10000.0]], atol=1e-6)


def test_format_roundtrips():
    rng = np.random.RandomState(2)
    b = jnp.asarray(random_boxes(rng, 11))
    np.testing.assert_allclose(
        np.asarray(B.box_cxcywh_to_xyxy(B.box_xyxy_to_cxcywh(b))), np.asarray(b), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(B.box_xywh_to_xyxy(B.box_xyxy_to_xywh(b))), np.asarray(b), atol=1e-4)


def test_giou_bounds_and_identity():
    rng = np.random.RandomState(3)
    b = jnp.asarray(random_boxes(rng, 9))
    g = np.asarray(B.giou(b, b))
    np.testing.assert_allclose(g, np.ones_like(g), atol=1e-5)
    b2 = jnp.asarray(random_boxes(rng, 9))
    g2 = np.asarray(B.giou(b, b2))
    assert np.all(g2 <= 1.0 + 1e-6) and np.all(g2 >= -1.0 - 1e-6)


def test_scale_boxes_matches_reference_semantics():
    # scale_boxes clips to dim-1 with (w, h) image_shape
    # (unified_foreground_packing.py:6-31).
    boxes = np.array([[10, 10, 30, 30], [0, 0, 2000, 1000]], np.float32)
    got = np.asarray(B.scale_boxes_about_center(jnp.asarray(boxes), 1.5, (1333, 800)))
    # box 0: center (20,20), half 10*1.5=15 -> [5,5,35,35]
    np.testing.assert_allclose(got[0], [5, 5, 35, 35], atol=1e-5)
    # box 1 clips to [0, 1332] x [0, 799]
    np.testing.assert_allclose(got[1], [0, 0, 1332, 799], atol=1e-5)


def test_zero_area_padding_boxes_are_harmless():
    pad = jnp.zeros((3, 4))
    real = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    assert np.all(np.asarray(B.pairwise_iou(pad, real)) == 0.0)
    assert np.all(np.asarray(B.bbox_area(pad)) == 0.0)
