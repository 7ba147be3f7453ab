"""Corruption-benchmark transforms (data/corruptions.py).

Reference semantics: mmdet's test_robustness.py applies ImageNet-C
corruptions at severities 1-5; our self-contained set must be
deterministic, dtype/shape-preserving, and monotonically destructive.
"""

import numpy as np
import pytest

from glsdet_tpu.data.corruptions import (BENCHMARK_CORRUPTIONS,
                                         CORRUPTIONS, CorruptedDataset,
                                         corrupt)


def _img(seed=0, hw=(96, 128)):
    return np.random.RandomState(seed).randint(
        0, 255, (*hw, 3), np.uint8)


class TestCorrupt:
    @pytest.mark.parametrize("name", sorted(CORRUPTIONS))
    def test_shape_dtype_and_determinism(self, name):
        img = _img()
        for sev in (1, 3, 5):
            a = corrupt(img, name, sev, seed=7)
            b = corrupt(img, name, sev, seed=7)
            assert a.shape == img.shape and a.dtype == np.uint8
            np.testing.assert_array_equal(a, b)
            assert not np.array_equal(a, img), f"{name} sev {sev} no-op"

    def test_severity_zero_is_identity(self):
        img = _img(1)
        np.testing.assert_array_equal(corrupt(img, "gaussian_noise", 0),
                                      img)

    def test_severity_monotone_distortion(self):
        """Higher severity distorts more (L1 from clean), for the
        deterministic corruptions where this must hold exactly."""
        img = _img(2)
        for name in ("defocus_blur", "contrast", "pixelate",
                     "jpeg_compression"):
            dists = [
                np.abs(corrupt(img, name, s, seed=3).astype(np.int32)
                       - img.astype(np.int32)).mean()
                for s in (1, 3, 5)
            ]
            assert dists[0] < dists[-1], (name, dists)

    def test_invalid_severity(self):
        with pytest.raises(ValueError):
            corrupt(_img(), "contrast", 6)

    def test_benchmark_set_is_registered(self):
        assert set(BENCHMARK_CORRUPTIONS) == set(CORRUPTIONS)


class TestCorruptedDataset:
    def test_proxy_and_per_image_seed(self, tmp_path):
        import json

        from PIL import Image

        from glsdet_tpu.data.coco import CocoDataset

        imgs, anns = [], []
        for i in range(2):
            arr = _img(10 + i, hw=(32, 40))
            Image.fromarray(arr).save(tmp_path / f"{i}.jpg")
            imgs.append({"id": i + 1, "file_name": f"{i}.jpg",
                         "width": 40, "height": 32})
            anns.append({"id": i + 1, "image_id": i + 1, "category_id": 0,
                         "bbox": [2, 2, 10, 10], "area": 100,
                         "iscrowd": 0})
        ann_file = tmp_path / "ann.json"
        ann_file.write_text(json.dumps({
            "images": imgs, "annotations": anns,
            "categories": [{"id": 0, "name": "thing"}]}))
        ds = CocoDataset(str(ann_file), str(tmp_path))
        cds = CorruptedDataset(ds, "gaussian_noise", 3)
        assert len(cds) == len(ds)
        assert cds.class_names == ds.class_names   # attr passthrough
        a = cds.load_image(cds.records[0])
        b = cds.load_image(cds.records[0])
        np.testing.assert_array_equal(a, b)        # per-image determinism
        assert not np.array_equal(a, ds.load_image(ds.records[0]))
        # different images get different noise (different seeds)
        n0 = a.astype(np.int32) - ds.load_image(ds.records[0]).astype(np.int32)
        n1 = (cds.load_image(cds.records[1]).astype(np.int32)
              - ds.load_image(ds.records[1]).astype(np.int32))
        assert not np.array_equal(n0[:16, :16], n1[:16, :16])
