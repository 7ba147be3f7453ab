"""Dataset-analysis + CAM tool logic (basetools analogs).

Reference: ``yolox-drone/tools/basetools/analysis_scale.py`` (scale-
imbalance parameter), ``analysis_objects.py`` (per-class area stats),
``draw_cam.py`` (``returnCAM`` channel-weighted activation map).
"""

import importlib.util
import os

import numpy as np

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_TOOLS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestAnalyzeDataset:
    def _coco(self):
        return {
            "images": [{"id": 1}, {"id": 2}],
            "categories": [{"id": 1, "name": "car"},
                           {"id": 2, "name": "person"}],
            "annotations": [
                {"category_id": 1, "bbox": [0, 0, 10, 10]},     # small
                {"category_id": 1, "bbox": [0, 0, 40, 40]},     # medium
                {"category_id": 1, "bbox": [0, 0, 100, 100]},   # large
                {"category_id": 2, "bbox": [0, 0, 20, 10]},
                {"category_id": 2, "bbox": [0, 0, 20, 10],
                 "iscrowd": 1},                                 # skipped
            ],
        }

    def test_per_class_stats(self):
        mod = _load("analyze_dataset")
        stats = mod.analyze(self._coco())
        car = stats["car"]
        assert car["count"] == 3
        assert (car["small"], car["medium"], car["large"]) == (1, 1, 1)
        person = stats["person"]
        assert person["count"] == 1          # iscrowd dropped
        assert person["aspect_mean"] == 2.0
        assert stats["_total"]["objects"] == 4
        assert stats["_total"]["objects_per_image"] == 2.0

    def test_scale_imbalance_semantics(self):
        mod = _load("analyze_dataset")
        # uniform areas -> ratios all 1
        assert mod.scale_imbalance(np.array([4.0, 4.0, 4.0])) == 1.0
        # 1,2,4: ratios [1, 2, 2] -> 5/3
        np.testing.assert_allclose(
            mod.scale_imbalance(np.array([1.0, 2.0, 4.0])), 5 / 3)
        assert mod.scale_imbalance(np.zeros((0,))) == 0.0

    def test_cli_json(self, tmp_path, capsys):
        import json
        import sys

        mod = _load("analyze_dataset")
        p = tmp_path / "anno.json"
        p.write_text(json.dumps(self._coco()))
        argv = sys.argv
        sys.argv = ["analyze_dataset.py", str(p), "--json"]
        try:
            mod.main()
        finally:
            sys.argv = argv
        out = json.loads(capsys.readouterr().out)
        assert out["car"]["count"] == 3


class TestComputeCam:
    def test_cam_normalized_and_weighted(self):
        mod = _load("draw_cam")
        feat = np.zeros((4, 4, 2), np.float32)
        feat[1, 1, 0] = 8.0     # strong channel 0 peak
        feat[2, 2, 1] = 1.0
        cam = mod.compute_cam(feat)
        assert cam.shape == (4, 4)
        assert cam.min() == 0.0 and cam.max() == 1.0
        assert cam[1, 1] == 1.0  # peak follows the dominant channel

    def test_constant_feature_no_nan(self):
        mod = _load("draw_cam")
        cam = mod.compute_cam(np.ones((3, 3, 4), np.float32))
        assert np.isfinite(cam).all()

    def test_pick_intermediate_from_capture(self):
        """End-to-end on a tiny flax model: capture_intermediates
        feeds pick_intermediate (the forward-hook analog)."""
        import jax
        import jax.numpy as jnp

        jax.config.update("jax_platforms", "cpu")
        from flax import linen as nn

        mod = _load("draw_cam")

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(4, (3, 3), name="backbone_conv")(x)
                return nn.Conv(2, (1, 1), name="head_conv")(x)

        m = Tiny()
        x = jnp.ones((1, 8, 8, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        _, state = m.apply(v, x, capture_intermediates=True,
                           mutable=["intermediates"])
        feat = mod.pick_intermediate(state["intermediates"],
                                     "backbone", -1)
        assert feat.shape == (8, 8, 4)
