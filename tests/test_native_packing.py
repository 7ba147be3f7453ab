"""C++ packing parity vs the python reference implementation."""

import numpy as np
import pytest

from glsdet_tpu.native import (
    build_tile_tables_native,
    native_available,
    unified_foreground_packing_native,
    unified_foreground_packing_rows,
    unified_foreground_packing_rows_fit,
)
from glsdet_tpu.ufp.packing import (
    unified_foreground_packing, unified_foreground_packing_fit)


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

    def test_bucket_fit_bitwise_parity_random(self):
        from glsdet_tpu.ufp.assembly import regions_to_array

        buckets = (768.0, 1024.0, 1152.0, 1280.0, 1536.0, 2688.0)
        rs = np.random.RandomState(7)
        chosen = []
        for trial in range(20):
            n = rs.randint(1, 150)
            x1 = rs.uniform(0, 1200, n)
            y1 = rs.uniform(0, 700, n)
            w = rs.uniform(4, 150, n)
            h = rs.uniform(4, 150, n)
            boxes = np.stack([x1, y1, x1 + w, y1 + h], 1)
            py_r, py_w, py_h, py_b = unified_foreground_packing_fit(
                boxes, 1.5, (1360, 765), buckets)
            rows, n_reg, c_w, c_h, c_b = unified_foreground_packing_rows_fit(
                boxes, 1.5, (1360, 765), 64, buckets)
            assert py_b == c_b and len(py_r) == n_reg, f"trial {trial}"
            assert py_w == c_w and py_h == c_h
            np.testing.assert_array_equal(
                rows, regions_to_array(py_r, 64))
            chosen.append(py_b)
        assert any(b is not None for b in chosen)

    def test_bucket_fit_fallback_no_fit(self):
        # ladder smaller than the biggest region -> reference layout,
        # bucket None, identical to the square-pack rows
        boxes = np.array([[0.0, 0, 500, 400], [600, 100, 1100, 500]])
        rows, n_reg, w, h, b = unified_foreground_packing_rows_fit(
            boxes, 1.5, (1360, 765), 8, (64.0, 128.0))
        ref_rows, ref_n, rw, rh = unified_foreground_packing_rows(
            boxes, 1.5, (1360, 765), 8)
        assert b is None and n_reg == ref_n and (w, h) == (rw, rh)
        np.testing.assert_array_equal(rows, ref_rows)

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

    def test_rows_fast_path_matches_list_api(self):
        from glsdet_tpu.ufp.assembly import regions_to_array

        rs = np.random.RandomState(7)
        for max_regions in (8, 32, 64):
            n = rs.randint(1, 150)
            x1 = rs.uniform(0, 1200, n)
            y1 = rs.uniform(0, 700, n)
            boxes = np.stack(
                [x1, y1, x1 + rs.uniform(4, 120, n),
                 y1 + rs.uniform(4, 120, n)], 1).astype(np.float32)
            regions, mw, mh = unified_foreground_packing_native(
                boxes, 1.5, (1360, 765))
            rows, nr, rw, rh = unified_foreground_packing_rows(
                boxes, 1.5, (1360, 765), max_regions)
            assert nr == len(regions) and (rw, rh) == (mw, mh)
            np.testing.assert_array_equal(
                rows, regions_to_array(regions, max_regions))

    def test_rows_fast_path_empty(self):
        rows, nr, w, h = unified_foreground_packing_rows(
            np.zeros((0, 4), np.float32), 1.5, (100, 100), 16)
        assert nr == 0 and w == 0.0 and h == 0.0
        assert rows.shape == (16, 7) and not rows.any()

    def test_tile_tables_parity(self):
        from glsdet_tpu.ufp.pallas_paint import build_tile_tables_py

        rs = np.random.RandomState(3)
        for trial in range(10):
            r = rs.randint(0, 40)
            rows = np.zeros((r, 7), np.float32)
            for i in range(r):
                w, h = rs.randint(8, 400), rs.randint(8, 400)
                f = rs.choice([0, 1, 2, 4])
                rows[i] = [rs.randint(0, 900), rs.randint(0, 500), w, h,
                           rs.randint(0, 1280 - 8), rs.randint(0, 1280 - 8),
                           f]
            for cap in (2, 24):
                py_t, py_ovf = build_tile_tables_py(rows, 1280, 1280,
                                                    256, cap)
                nat = build_tile_tables_native(rows, 1280, 1280, 256, cap)
                assert nat is not None
                c_t, c_ovf = nat
                assert py_ovf == c_ovf, f"trial {trial} cap {cap}"
                np.testing.assert_array_equal(py_t, c_t)
