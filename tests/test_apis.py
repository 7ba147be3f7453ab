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


class TestRunEvalTTA:
    """The CLI TTA path (tools/test.py --tta-scales/--tta-flip ->
    eval/runner.py: run_eval_tta)."""

    @pytest.fixture(scope="class")
    def eval_setup(self):
        import os
        import tempfile

        import cv2
        import jax
        import jax.numpy as jnp

        from glsdet_tpu.data.coco import CocoDataset
        from glsdet_tpu.data.visdrone import visdrone_to_coco
        from glsdet_tpu.models import YOLOXDetector

        root = tempfile.mkdtemp()
        os.makedirs(f"{root}/images")
        os.makedirs(f"{root}/annotations")
        rs = np.random.RandomState(3)
        for i in range(4):
            cv2.imwrite(f"{root}/images/{i:04d}.jpg",
                        rs.randint(0, 255, (96, 128, 3), np.uint8))
            open(f"{root}/annotations/{i:04d}.txt", "w").write(
                "10,10,30,20,1,4,0,0\n")
        visdrone_to_coco(root, f"{root}/t.json")
        ds = CocoDataset(f"{root}/t.json", f"{root}/images")
        model = YOLOXDetector(num_classes=10, phi="nano")
        variables = jax.jit(model.init, static_argnames="train")(
            jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)),
            train=False)
        return ds, model, variables

    def test_maybe_normalize_matches_host(self):
        import jax.numpy as jnp

        from glsdet_tpu.data.coco import normalize
        from glsdet_tpu.eval.runner import _maybe_normalize

        img = np.random.RandomState(0).randint(
            0, 256, (2, 8, 8, 3), np.uint8)
        dev = np.asarray(_maybe_normalize(jnp.asarray(img)))
        np.testing.assert_allclose(dev, normalize(img), rtol=0,
                                   atol=1e-5)
        # f32 passes through untouched
        f32 = jnp.asarray(normalize(img))
        assert _maybe_normalize(f32) is f32

    def test_single_scale_matches_run_eval(self, eval_setup):
        from glsdet_tpu.eval.runner import run_eval, run_eval_tta

        ds, model, variables = eval_setup
        apply_fn = lambda v, im: model.apply(v, im, train=False)
        ref, _ = run_eval(ds, apply_fn, "yolox", (96, 96), 10,
                          batch_size=4, variables=variables,
                          verbose=False)
        tta, stats = run_eval_tta(ds, apply_fn, "yolox", (96, 96), 10,
                                  tta_scales=(1.0,), tta_flip=False,
                                  variables=variables, verbose=False)
        # one scale, no flip: the TTA path must reproduce the plain
        # runner's AP (same letterbox, same program; the extra fused
        # NMS over a single variant's own output is a no-op)
        assert tta.ap == pytest.approx(ref.ap, abs=1e-6)
        assert stats["tta_scales"] == [1.0]

    def test_multi_scale_flip_runs(self, eval_setup, tmp_path):
        import json

        from glsdet_tpu.eval.runner import run_eval_tta

        ds, model, variables = eval_setup
        apply_fn = lambda v, im: model.apply(v, im, train=False)
        out = tmp_path / "dets.json"
        res, stats = run_eval_tta(
            ds, apply_fn, "yolox", (96, 96), 10,
            tta_scales=(0.75, 1.0), tta_flip=True,
            variables=variables, verbose=False, out_json=str(out))
        assert stats["images"] == 4 and stats["tta_flip"]
        dump = json.loads(out.read_text())
        assert all({"image_id", "category_id", "bbox", "score"}
                   <= set(d) for d in dump)


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


class TestStepsPerCall:
    """train.steps_per_call: scan-group dispatches in the real loop."""

    def _write_dataset(self, tmp_path, n):
        import json

        import cv2

        img_dir = tmp_path / "images"
        img_dir.mkdir()
        rs = np.random.RandomState(0)
        images, annotations = [], []
        for i in range(n):
            img = rs.randint(0, 255, (64, 64, 3), np.uint8)
            cv2.imwrite(str(img_dir / f"{i}.jpg"), img)
            images.append({"id": i + 1, "file_name": f"{i}.jpg",
                           "width": 64, "height": 64})
            annotations.append({
                "id": i + 1, "image_id": i + 1, "category_id": 1,
                "bbox": [8, 8, 24, 24], "area": 576, "iscrowd": 0})
        ann = tmp_path / "train.json"
        ann.write_text(json.dumps({
            "images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "car"}]}))
        return ann, img_dir

    def _cfg(self, tmp_path, ann, img_dir, **over):
        from glsdet_tpu.config import apply_overrides, get_config

        cfg = get_config("coarse_det")
        apply_overrides(cfg, {
            "model.phi": "nano", "model.dtype": "float32",
            "model.num_classes": 1,
            "data.ann_file": str(ann), "data.img_root": str(img_dir),
            "data.img_hw": (64, 64), "data.batch_size": 4,
            "data.max_gt": 4, "data.mosaic": False, "data.mixup": False,
            "data.hsv": False, "data.flip_prob": 0.0,
            "data.num_workers": 1,
            "train.epochs": 1, "train.ckpt_interval": 100,
            "train.log_interval": 2,
            "train.work_dir": str(tmp_path / "wd"),
            **over,
        })
        return cfg

    def test_groups_and_tail_single(self, tmp_path):
        # 12 imgs / b4 -> 3 steps/epoch with K=2: one group + one single
        from glsdet_tpu.train.loop import train

        ann, img_dir = self._write_dataset(tmp_path, 12)
        cfg = self._cfg(tmp_path, ann, img_dir,
                        **{"train.steps_per_call": 2})
        state = train(cfg)
        assert int(state.step) == 3

    def test_interval_validation(self, tmp_path):
        from glsdet_tpu.train.loop import train

        ann, img_dir = self._write_dataset(tmp_path, 8)
        cfg = self._cfg(tmp_path, ann, img_dir,
                        **{"train.steps_per_call": 3})
        with pytest.raises(ValueError, match="steps_per_call"):
            train(cfg)
