"""Albu bridge (mmdet transforms.py:1320 analog).

albumentations is absent from this image, so the gate is tested
directly and the bridge logic runs against a minimal protocol shim
(Compose/BboxParams + one flip transform implementing the
albumentations call convention).
"""

import sys
import types

import numpy as np
import pytest


def _make_shim():
    """A module implementing just enough of the albumentations protocol
    for the bridge: Compose(transforms, bbox_params)(image=, bboxes=,
    idx_mapper=) -> dict, pascal_voc boxes, label_fields filtration."""
    shim = types.ModuleType("albumentations")

    class BboxParams:
        def __init__(self, format, label_fields, **kw):
            assert format == "pascal_voc"
            self.label_fields = label_fields

    class HorizontalFlip:
        def __init__(self, p=1.0):
            self.p = p

        def apply(self, image, bboxes):
            w = image.shape[1]
            out = [(w - x2, y1, w - x1, y2) for x1, y1, x2, y2 in bboxes]
            return image[:, ::-1].copy(), out

    class DropTinyBoxes:
        """Drops boxes under min_side — exercises label filtration."""

        def __init__(self, min_side):
            self.min_side = min_side

        def apply(self, image, bboxes):
            keep = [b for b in bboxes
                    if (b[2] - b[0]) >= self.min_side
                    and (b[3] - b[1]) >= self.min_side]
            return image, keep

    class OneOf:
        def __init__(self, transforms, p=1.0):
            self.transforms = transforms

        def apply(self, image, bboxes):
            return self.transforms[0].apply(image, bboxes)

    class Compose:
        def __init__(self, transforms, bbox_params=None):
            self.transforms = transforms
            self.bbox_params = bbox_params

        def __call__(self, image, bboxes, **fields):
            # albumentations keeps label_fields aligned with surviving
            # bboxes; the shim mimics that by tracking identity
            tagged = list(zip(bboxes, fields["idx_mapper"]))
            for t in self.transforms:
                image, new = t.apply(image, [b for b, _ in tagged])
                if len(new) == len(tagged):     # geometric: same order
                    tagged = [(b, i) for b, (_, i) in zip(new, tagged)]
                else:                           # filtration: match rows
                    old = {tuple(b): i for b, i in tagged}
                    tagged = [(b, old[tuple(b)]) for b in new]
            return {"image": image,
                    "bboxes": [b for b, _ in tagged],
                    "idx_mapper": [i for _, i in tagged]}

    shim.BboxParams = BboxParams
    shim.Compose = Compose
    shim.HorizontalFlip = HorizontalFlip
    shim.DropTinyBoxes = DropTinyBoxes
    shim.OneOf = OneOf
    return shim


@pytest.fixture()
def shim(monkeypatch):
    monkeypatch.setitem(sys.modules, "albumentations", _make_shim())


class TestAlbuGate:
    def test_missing_package_raises_clear_error(self):
        assert "albumentations" not in sys.modules  # absent from image
        from glsdet_tpu.data.augment import Albu

        with pytest.raises(ImportError, match="albumentations"):
            Albu([{"type": "HorizontalFlip", "p": 1.0}])


class TestAlbuBridge:
    def _data(self):
        img = (np.arange(100 * 80 * 3) % 251).astype(
            np.uint8).reshape(100, 80, 3)
        boxes = np.array([[10, 10, 30, 40], [50, 20, 54, 24]],
                         np.float32)
        labels = np.array([2, 5], np.int64)
        return img, boxes, labels

    def test_flip_maps_boxes(self, shim):
        from glsdet_tpu.data.augment import Albu

        img, boxes, labels = self._data()
        a = Albu([{"type": "HorizontalFlip", "p": 1.0}])
        out_img, out_boxes, out_labels = a(img, boxes, labels)
        np.testing.assert_array_equal(out_img, img[:, ::-1])
        np.testing.assert_allclose(
            out_boxes, [[50, 10, 70, 40], [26, 20, 30, 24]])
        np.testing.assert_array_equal(out_labels, labels)

    def test_box_filtration_keeps_labels_aligned(self, shim):
        from glsdet_tpu.data.augment import Albu

        img, boxes, labels = self._data()
        a = Albu([{"type": "DropTinyBoxes", "min_side": 10}])
        _, out_boxes, out_labels = a(img, boxes, labels)
        assert len(out_boxes) == 1
        np.testing.assert_allclose(out_boxes, [[10, 10, 30, 40]])
        np.testing.assert_array_equal(out_labels, [2])

    def test_nested_transforms_build(self, shim):
        from glsdet_tpu.data.augment import Albu

        img, boxes, labels = self._data()
        a = Albu([{"type": "OneOf", "p": 0.5, "transforms": [
            {"type": "HorizontalFlip", "p": 1.0}]}])
        out_img, out_boxes, _ = a(img, boxes, labels)
        np.testing.assert_array_equal(out_img, img[:, ::-1])

    def test_empty_boxes(self, shim):
        from glsdet_tpu.data.augment import Albu

        img, _, _ = self._data()
        a = Albu([{"type": "HorizontalFlip", "p": 1.0}])
        _, out_boxes, out_labels = a(
            img, np.zeros((0, 4), np.float32), np.zeros((0,), np.int64))
        assert out_boxes.shape == (0, 4) and len(out_labels) == 0
