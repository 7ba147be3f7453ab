"""Predictor facade + TTA tests."""

import numpy as np
import pytest

from glsdet_tpu.eval.tta import tta_detect


class TestTTA:
    def test_aggregates_scales_and_flip(self):
        calls = []

        def detect_fn(img):
            calls.append(img.shape)
            h, w = img.shape[:2]
            return {
                "boxes": np.array([[10.0, 10, 30, 30]], np.float32),
                "scores": np.array([0.9], np.float32),
                "labels": np.array([0], np.int64),
            }

        img = np.zeros((100, 200, 3), np.uint8)
        out = tta_detect(detect_fn, img, scales=(1.0, 0.5), flip=True)
        # 2 scales x (orig + flip) = 4 calls
        assert len(calls) == 4
        # the stub returns a fixed box per call, so the 4 variants map
        # back to 4 disjoint locations — all survive NMS
        assert len(out["boxes"]) == 4
        assert out["boxes"].shape[1] == 4

    def test_identical_variants_merge(self):
        def detect_fn(img):
            return {
                "boxes": np.array([[10.0, 10, 30, 30]], np.float32),
                "scores": np.array([0.9], np.float32),
                "labels": np.array([0], np.int64),
            }

        img = np.zeros((100, 200, 3), np.uint8)
        # two identical scale-1 passes -> duplicate boxes -> NMS keeps 1
        out = tta_detect(detect_fn, img, scales=(1.0, 1.0), flip=False)
        assert len(out["boxes"]) == 1

    def test_empty_detections(self):
        def detect_fn(img):
            return {
                "boxes": np.zeros((0, 4), np.float32),
                "scores": np.zeros((0,), np.float32),
                "labels": np.zeros((0,), np.int64),
            }

        out = tta_detect(detect_fn, np.zeros((50, 50, 3), np.uint8),
                         scales=(1.0,), flip=False)
        assert len(out["boxes"]) == 0


class TestDetectorFacade:
    @pytest.fixture(scope="class")
    def detector(self):
        from glsdet_tpu.apis import Detector
        from glsdet_tpu.config import apply_overrides, get_config

        # tiny detector without checkpoint (random weights)
        det = Detector.__new__(Detector)
        # build via public path but with small overrides
        import jax

        from glsdet_tpu.eval.postprocess import yolox_postprocess
        from glsdet_tpu.train.loop import build_model

        cfg = get_config("coarse_det")
        apply_overrides(cfg, {"model.phi": "nano", "model.dtype": "float32",
                              "data.img_hw": (96, 96),
                              "eval.score_thr": 1e-4})
        model = build_model(cfg)
        rng = jax.random.PRNGKey(0)
        import jax.numpy as jnp

        variables = model.init(rng, jnp.zeros((1, 96, 96, 3)), train=False)
        det.cfg = cfg
        det.class_names = [str(i) for i in range(10)]
        det.score_thr = 1e-4

        def _fwd(v, images):
            cls, reg, obj = model.apply(v, images, train=False)
            return yolox_postprocess(cls, reg, obj, (96, 96),
                                     score_thr=1e-4, max_dets=20)

        det._fwd = jax.jit(_fwd)
        det._variables = variables
        return det

    def test_detect_returns_image_coords(self, detector):
        img = np.random.RandomState(0).randint(
            0, 255, (200, 300, 3), np.uint8)
        d = detector.detect(img)
        assert d["boxes"].shape[1:] == (4,)
        if len(d["boxes"]):
            assert d["boxes"][:, 2].max() <= 305

    def test_get_map_txt_format(self, detector, tmp_path):
        img = np.random.RandomState(1).randint(
            0, 255, (96, 96, 3), np.uint8)
        path = detector.get_map_txt("img1", img, str(tmp_path))
        lines = open(path).read().strip().splitlines()
        if lines:
            parts = lines[0].split()
            assert len(parts) == 6
            float(parts[1])  # confidence parses

    def test_detect_image_draws(self, detector):
        img = np.random.RandomState(2).randint(
            0, 255, (96, 96, 3), np.uint8)
        drawn = detector.detect_image(img, score_thr=0.0)
        assert drawn.shape == img.shape

    def test_detect_batch_matches_detect(self, detector):
        rs = np.random.RandomState(5)
        imgs = [rs.randint(0, 255, (120 + 20 * i, 200, 3), np.uint8)
                for i in range(3)]
        batch = detector.detect_batch(imgs)
        singles = [detector.detect(im) for im in imgs]
        assert len(batch) == 3
        for b, s in zip(batch, singles):
            assert b["boxes"].shape == s["boxes"].shape
            np.testing.assert_allclose(b["boxes"], s["boxes"], atol=1e-3)
            np.testing.assert_allclose(b["scores"], s["scores"], atol=1e-5)
        assert detector.detect_batch([]) == []
