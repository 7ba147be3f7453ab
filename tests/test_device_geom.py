"""Device geometric stage (data/device_geom.py) vs the host pipeline.

Contract (module docstring): box geometry BIT-EXACT (the two pipelines
share mosaic4_params/random_affine_params/affine_boxes and the rng
stream); pixels exact where the content is locally linear (bilinear
reproduces affine functions) and enveloped elsewhere (the fused single
bilinear vs the host's resize-then-warp double resample).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glsdet_tpu.data.augment import (mosaic4, mosaic4_params, random_affine,
                                     random_affine_params)
from glsdet_tpu.data.device_geom import (PAD_VAL, flip_affine, geom_warp,
                                         inverse_affine_2x3, quads_to_array)


def _gradient_img(h, w, ax=1.0, ay=0.5, c=30.0):
    """Locally-linear uint8 content: bilinear resampling chains are
    exact on it (up to the intermediate uint8 rounding)."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = np.clip(ax * xs + ay * ys + c, 0, 255)
    return np.stack([base, np.clip(base * 0.7 + 20, 0, 255),
                     255 - base], -1).astype(np.uint8)


@pytest.fixture
def tiny_ds(tmp_path):
    import cv2

    from glsdet_tpu.data.coco import CocoDataset

    rs = np.random.RandomState(0)
    imgs, anns = [], []
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    aid = 0
    for i in range(6):
        h, w = int(rs.randint(60, 100)), int(rs.randint(80, 120))
        img = _gradient_img(h, w, ax=rs.uniform(0.5, 2),
                            ay=rs.uniform(0.2, 1))
        cv2.imwrite(str(img_dir / f"{i}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 100])
        imgs.append({"id": i, "file_name": f"{i}.jpg",
                     "width": w, "height": h})
        for _ in range(3):
            x, y = rs.uniform(2, w - 30), rs.uniform(2, h - 30)
            bw, bh = rs.uniform(10, 25), rs.uniform(10, 25)
            anns.append({"id": aid, "image_id": i, "bbox": [x, y, bw, bh],
                         "category_id": int(rs.randint(1, 4)),
                         "iscrowd": 0, "area": bw * bh})
            aid += 1
    ann = {"images": imgs, "annotations": anns,
           "categories": [{"id": c, "name": str(c)} for c in (1, 2, 3)]}
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    return CocoDataset(str(ann_path), str(img_dir))


def test_identity_placement_reproduces_source():
    """One quadrant covering the whole output, 1:1 scale, identity
    affine: the warp must return the source bit-exactly."""
    h = w = 32
    src = _gradient_img(h, w)
    sources = jnp.asarray(src[None, None])  # (1, 1->pad to 4?) need 4
    sources = jnp.concatenate([sources] * 4, axis=1)
    quads = np.zeros((1, 4, 10), np.float32)
    # quadrant 0 owns [0,w)x[0,h); others are empty rects
    quads[0, 0] = (0, 0, w, h, 0, 0, 1.0, 1.0, w, h)
    mat = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    out = geom_warp(sources, jnp.asarray(quads), jnp.asarray(mat[None]),
                    (h, w))
    np.testing.assert_array_equal(np.asarray(out[0]), src.astype(np.float32))


def test_empty_region_is_pad():
    h = w = 16
    sources = jnp.zeros((1, 4, h, w, 3), jnp.uint8)
    quads = jnp.zeros((1, 4, 10), jnp.float32)  # all rects empty
    mat = jnp.asarray(np.array([[[1.0, 0, 0], [0, 1.0, 0]]], np.float32))
    out = geom_warp(sources, quads, mat, (h, w))
    assert float(jnp.min(out)) == PAD_VAL and float(jnp.max(out)) == PAD_VAL


def _run_both(tiny_ds, seed, flip_prob=0.0, mixup=False, hsv=False):
    from glsdet_tpu.data.loader import TrainPipeline

    host = TrainPipeline(tiny_ds, (64, 64), max_gt=50, enable_mixup=mixup,
                         hsv=hsv, flip_prob=flip_prob, device_color=True)
    dev = TrainPipeline(tiny_ds, (64, 64), max_gt=50, enable_mixup=mixup,
                        hsv=hsv, flip_prob=flip_prob, device_color=True,
                        device_geom=True, geom_src_hw=(128, 128))
    s_host = host(0, np.random.RandomState(seed))
    s_dev = dev(0, np.random.RandomState(seed))
    return s_host, s_dev


@pytest.mark.parametrize("seed,flip,mixup", [(0, 0.0, False), (1, 1.0, False),
                                             (2, 1.0, True), (3, 0.0, True)])
def test_boxes_bitexact_vs_host(tiny_ds, seed, flip, mixup):
    s_host, s_dev = _run_both(tiny_ds, seed, flip_prob=flip, mixup=mixup)
    np.testing.assert_array_equal(s_dev["gt_boxes"], s_host["gt_boxes"])
    np.testing.assert_array_equal(s_dev["gt_labels"], s_host["gt_labels"])
    np.testing.assert_array_equal(s_dev["gt_valid"], s_host["gt_valid"])
    assert "images" not in s_dev and "geom_sources" in s_dev
    if mixup and "mix_images" in s_host:
        np.testing.assert_array_equal(
            s_dev.get("mix_images"), s_host["mix_images"])


def _boundary_mask(quads, mat, out_hw, band=2.0):
    """Pixels whose canvas coordinate lies within ``band`` px of any
    quadrant-rect edge: there the host blends across the painted/pad
    seam at canvas-pixel resolution while the fused warp switches region
    on the continuous coordinate — the documented envelope exclusion."""
    ho, wo = out_hw
    ys, xs = np.meshgrid(np.arange(ho, dtype=np.float64),
                         np.arange(wo, dtype=np.float64), indexing="ij")
    u = mat[0, 0] * xs + mat[0, 1] * ys + mat[0, 2]
    v = mat[1, 0] * xs + mat[1, 1] * ys + mat[1, 2]
    near = np.zeros((ho, wo), bool)
    for q in range(4):
        x1, y1, x2, y2 = quads[q, :4]
        near |= (np.abs(u - x1) < band) | (np.abs(u - x2) < band)
        near |= (np.abs(v - y1) < band) | (np.abs(v - y2) < band)
    return near


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pixels_enveloped_on_linear_content(tiny_ds, seed):
    """Gradient sources: both resampling chains are exact on linear
    content away from quadrant/crop boundaries, so pixels agree to a
    few uint8 codes there; the 1-2px boundary bands (a large fraction
    of this 64^2 fixture, ~0.6% at production 640^2) are excluded via
    the analytically-known seam mask."""
    s_host, s_dev = _run_both(tiny_ds, seed)
    out = geom_warp(jnp.asarray(s_dev["geom_sources"][None]),
                    jnp.asarray(s_dev["geom_quads"][None]),
                    jnp.asarray(s_dev["geom_mat"][None]), (64, 64))
    dev_px = np.asarray(out[0])
    host_px = s_host["images"].astype(np.float32)
    diff = np.abs(dev_px - host_px).max(axis=-1)
    seam = _boundary_mask(s_dev["geom_quads"], s_dev["geom_mat"], (64, 64))
    interior = diff[~seam]
    assert interior.size > diff.size * 0.5, "seam mask ate the fixture"
    assert np.quantile(interior, 0.99) <= 3.0, (
        f"99th-pct interior pixel diff {np.quantile(interior, 0.99)}")
    assert interior.mean() <= 1.0, f"mean interior diff {interior.mean()}"


def test_flip_folds_into_matrix(tiny_ds):
    """flip_prob=1: the device output must equal the flipped unflipped
    output exactly (same params, matrix composed with the flip)."""
    from glsdet_tpu.data.loader import TrainPipeline

    flip = TrainPipeline(tiny_ds, (64, 64), max_gt=50, enable_mixup=False,
                         hsv=False, flip_prob=1.0, device_color=True,
                         device_geom=True, geom_src_hw=(128, 128))
    noflip = TrainPipeline(tiny_ds, (64, 64), max_gt=50, enable_mixup=False,
                           hsv=False, flip_prob=0.0, device_color=True,
                           device_geom=True, geom_src_hw=(128, 128))
    # flip_prob 1.0 and 0.0 both consume ONE rng draw for the decision,
    # so the geometry draws before it are identical
    s_f = flip(0, np.random.RandomState(5))
    s_n = noflip(0, np.random.RandomState(5))
    out_f = np.asarray(geom_warp(
        jnp.asarray(s_f["geom_sources"][None]),
        jnp.asarray(s_f["geom_quads"][None]),
        jnp.asarray(s_f["geom_mat"][None]), (64, 64))[0])
    out_n = np.asarray(geom_warp(
        jnp.asarray(s_n["geom_sources"][None]),
        jnp.asarray(s_n["geom_quads"][None]),
        jnp.asarray(s_n["geom_mat"][None]), (64, 64))[0])
    np.testing.assert_allclose(out_f, out_n[:, ::-1], atol=1e-3)


def test_train_step_consumes_geom_batch(tiny_ds):
    """End-to-end: a geom batch through make_yolox_train_step."""
    from glsdet_tpu.data.coco import make_batch
    from glsdet_tpu.data.loader import TrainPipeline
    from glsdet_tpu.models import YOLOXDetector
    from glsdet_tpu.train import TrainState, make_yolox_train_step, yolox_sgd

    pipe = TrainPipeline(tiny_ds, (64, 64), max_gt=50, device_color=True,
                         device_geom=True, geom_src_hw=(128, 128))
    rs = np.random.RandomState(0)
    batch = make_batch([pipe(i % len(tiny_ds), rs) for i in range(2)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model = YOLOXDetector(num_classes=3, phi="nano")
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames="train")(
        rng, jnp.zeros((1, 64, 64, 3)), train=False)
    tx = yolox_sgd(lambda s: 0.01)
    state = TrainState.create(variables, tx, rng)
    step = jax.jit(make_yolox_train_step(model, tx, (64, 64),
                                         normalize=True))
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
