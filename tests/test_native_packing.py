"""C++ packing parity vs the python reference implementation."""

import numpy as np
import pytest

from glsdet_tpu.native import native_available, unified_foreground_packing_native
from glsdet_tpu.ufp.packing import unified_foreground_packing


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
class TestNativePacking:
    def test_bitwise_parity_random(self):
        rs = np.random.RandomState(42)
        for trial in range(20):
            n = rs.randint(1, 120)
            x1 = rs.uniform(0, 1200, n)
            y1 = rs.uniform(0, 700, n)
            w = rs.uniform(4, 150, n)
            h = rs.uniform(4, 150, n)
            boxes = np.stack([x1, y1, x1 + w, y1 + h], 1)
            py_r, py_w, py_h = unified_foreground_packing(
                boxes, 1.5, (1360, 765))
            c_r, c_w, c_h = unified_foreground_packing_native(
                boxes, 1.5, (1360, 765))
            assert len(py_r) == len(c_r), f"trial {trial}"
            assert py_w == c_w and py_h == c_h
            for a, b in zip(py_r, c_r):
                np.testing.assert_array_equal(a.as_row(), b.as_row())

    def test_empty(self):
        r, w, h = unified_foreground_packing_native(
            np.zeros((0, 4)), 1.5, (100, 100))
        assert r == [] and w == 0.0 and h == 0.0

    def test_scale_2_dataset_build_variant(self):
        boxes = np.array([[10.0, 10, 40, 40], [300, 300, 360, 340]])
        py = unified_foreground_packing(boxes, 2.0, (640, 480))
        cc = unified_foreground_packing_native(boxes, 2.0, (640, 480))
        assert py[1:] == cc[1:]

    def test_native_faster_than_python(self):
        import time

        rs = np.random.RandomState(0)
        n = 200
        x1 = rs.uniform(0, 1200, n)
        y1 = rs.uniform(0, 700, n)
        boxes = np.stack(
            [x1, y1, x1 + rs.uniform(5, 120, n),
             y1 + rs.uniform(5, 120, n)], 1)
        # warm both paths
        unified_foreground_packing(boxes, 1.5, (1360, 765))
        unified_foreground_packing_native(boxes, 1.5, (1360, 765))
        t0 = time.time()
        for _ in range(10):
            unified_foreground_packing(boxes, 1.5, (1360, 765))
        t_py = time.time() - t0
        t0 = time.time()
        for _ in range(10):
            unified_foreground_packing_native(boxes, 1.5, (1360, 765))
        t_c = time.time() - t0
        assert t_c < t_py
