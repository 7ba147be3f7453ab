"""Pallas mosaic painter vs the XLA tiled painter (interpret mode, CPU).

The kernel must reproduce ``assemble_mosaic_tiled_batch`` exactly (same
crop/residue/tap math, float32 taps): property tests over random region
sets covering factors {1,2,4}, tile-straddling chips, canvas-edge
overhang and empty inputs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from glsdet_tpu.ufp.assembly import (assemble_mosaic,
                                     assemble_mosaic_tiled_batch,
                                     regions_to_array,
                                     split_rows_for_tile)
from glsdet_tpu.ufp.pallas_paint import (assemble_mosaic_pallas_batch,
                                         build_tile_tables)

OUT, TILE, CAP = 256, 128, 16


def _flat_paint(per_img_rows):
    out = []
    for s, rows in enumerate(per_img_rows):
        out.append(np.concatenate(
            [rows, np.full((rows.shape[0], 1), s, np.float32)], axis=1))
    return np.concatenate(out, axis=0)


def _ring_masks(per_img_rows, out):
    """(B, out, out) bool: True where a pixel is in the outer f-wide
    ring of some chip (the documented deviation class of every
    slice-based painter in this repo vs the gather oracle — edge taps
    bleed neighboring source pixels instead of clamping at the crop
    edge; the pallas painter's tile-aligned crops shift where in the
    ring that happens)."""
    masks = []
    for rows in per_img_rows:
        ring = np.zeros((out, out), bool)
        for x1, y1, w, h, nx, ny, f in np.asarray(rows, np.int64):
            if f <= 0 or w <= 0 or h <= 0:
                continue
            ax0, ay0 = max(nx, 0), max(ny, 0)
            ax1, ay1 = min(nx + w * f, out), min(ny + h * f, out)
            if ax1 <= ax0 or ay1 <= ay0:
                continue
            outer = np.zeros((out, out), bool)
            outer[ay0:ay1, ax0:ax1] = True
            inner = np.zeros((out, out), bool)
            inner[ay0 + f:max(ay1 - f, ay0 + f),
                  ax0 + f:max(ax1 - f, ax0 + f)] = True
            ring |= outer & ~inner
        masks.append(ring)
    return np.stack(masks)


def _compare(images, per_img_regions, out=OUT, tile=TILE):
    b = images.shape[0]
    unmap = [regions_to_array(r, 16) if not isinstance(r, np.ndarray)
             else r for r in per_img_regions]
    # ground truth: the gather oracle (cv2 semantics) on unsplit rows
    oracle = np.stack([np.asarray(assemble_mosaic(
        jnp.asarray(images[i]), jnp.asarray(unmap[i]), out, out))
        for i in range(b)])
    tables = []
    for u in unmap:
        tbl, ovf = build_tile_tables(u, out, out, tile, CAP)
        assert not ovf
        tables.append(tbl)
    got = np.asarray(assemble_mosaic_pallas_batch(
        jnp.asarray(images), jnp.asarray(np.stack(tables)), out, out,
        tile=tile, dtype=jnp.float32, interpret=True))
    assert got.shape == oracle.shape == (b, out, out, 3)
    # interiors must match cv2 semantics exactly (incl. across the
    # kernel's tile boundaries — the halo taps make splits seamless);
    # only the outer f-wide chip ring may deviate (edge taps bleed the
    # neighboring source pixel where cv2's crop clamps — the same
    # deviation class assemble_mosaic_fast documents)
    ring = _ring_masks(unmap, out)
    bad = np.abs(got - oracle).max(-1) > 1e-3
    assert not (bad & ~ring).any(), \
        f"{(bad & ~ring).sum()} interior pixels differ from the oracle"
    return got


def _rand_images(b, h, w, seed=0):
    return np.random.RandomState(seed).randint(
        0, 255, (b, h, w, 3), np.uint8)


class TestPallasPainter:
    def test_single_region_each_factor(self):
        imgs = _rand_images(3, 200, 320)
        regions = [
            np.array([[10, 20, 100, 80, 5, 7, 1]], np.float32),
            np.array([[10, 20, 60, 40, 33, 17, 2]], np.float32),
            np.array([[10, 20, 30, 20, 65, 129, 4]], np.float32),
        ]
        rows = [np.concatenate([r, np.zeros((15, 7), np.float32)])
                for r in regions]
        got = _compare(imgs, rows)
        assert got.sum() > 0

    def test_tile_straddling_and_multi_region(self):
        imgs = _rand_images(2, 180, 260, seed=1)
        # chips crossing the 128-tile boundaries in both axes
        r0 = np.array([
            [5, 5, 120, 90, 70, 100, 1],    # straddles x and y boundary
            [30, 40, 50, 30, 190, 10, 1],
            [0, 0, 40, 40, 100, 180, 2],    # x2, crosses y boundary
        ], np.float32)
        r1 = np.array([
            [8, 8, 30, 30, 120, 120, 4],    # x4 across the center cross
        ], np.float32)
        rows = [np.concatenate([r0, np.zeros((13, 7), np.float32)]),
                np.concatenate([r1, np.zeros((15, 7), np.float32)])]
        got = _compare(imgs, rows)
        assert got[0].sum() > 0 and got[1].sum() > 0

    def test_canvas_edge_overhang_clips(self):
        imgs = _rand_images(1, 150, 150, seed=2)
        rows = [np.concatenate([np.array([
            [10, 10, 100, 100, 200, 220, 2],   # overhangs right+bottom
        ], np.float32), np.zeros((15, 7), np.float32)])]
        _compare(imgs, rows)

    def test_empty_rows_zero_canvas(self):
        imgs = _rand_images(2, 100, 100, seed=3)
        rows = [np.zeros((16, 7), np.float32)] * 2
        got = _compare(imgs, rows)
        assert got.sum() == 0

    def test_random_property(self):
        rs = np.random.RandomState(7)
        imgs = _rand_images(2, 220, 300, seed=4)
        all_rows = []
        for _ in range(2):
            rows = np.zeros((16, 7), np.float32)
            for i in range(8):
                f = rs.choice([1, 2, 4])
                w = rs.randint(4, 60)
                h = rs.randint(4, 60)
                rows[i] = [rs.randint(0, 300 - w), rs.randint(0, 220 - h),
                           w, h, rs.randint(0, OUT), rs.randint(0, OUT),
                           f]
            all_rows.append(rows)
        _compare(imgs, all_rows)

    def test_overflow_flag(self):
        rows = np.tile(np.array([[0, 0, 8, 8, 4, 4, 1]], np.float32),
                       (CAP + 2, 1))
        _, ovf = build_tile_tables(rows, OUT, OUT, TILE, CAP)
        assert ovf

    def test_bfloat16_canvas_close(self):
        imgs = _rand_images(1, 120, 120, seed=5)
        rows = [np.concatenate([np.array([
            [5, 5, 80, 80, 10, 10, 2]], np.float32),
            np.zeros((15, 7), np.float32)])]
        tbl, _ = build_tile_tables(rows[0], OUT, OUT, TILE, CAP)
        got = np.asarray(assemble_mosaic_pallas_batch(
            jnp.asarray(imgs), jnp.asarray(tbl[None]), OUT, OUT,
            tile=TILE, dtype=jnp.bfloat16, interpret=True),
            dtype=np.float32)
        paint = [split_rows_for_tile(rows[0], TILE, 64)]
        ref = np.asarray(assemble_mosaic_tiled_batch(
            jnp.asarray(imgs), jnp.asarray(_flat_paint(paint)), OUT, OUT,
            tile=TILE, dtype=jnp.float32))
        # interior-exact up to bf16 rounding; ring pixels may bleed
        inner = np.abs(got[0, 12:168, 12:168] - ref[0, 12:168, 12:168])
        assert inner.max() <= 1.01


class TestPaintAtAlignedCanvasThenCrop:
    """The serving pipeline paints at paint_hw_for(bucket) (a tile
    multiple) and crops to the model bucket (two_stage.paint_hw_for).
    The kernel itself always sees an aligned canvas; this checks the
    crop composition equals painting content directly: a 192-bucket
    mosaic painted on a 256 canvas, cropped, must match the oracle at
    192 interior-exactly."""

    def test_crop_matches_oracle(self):
        from glsdet_tpu.ufp.assembly import assemble_mosaic

        imgs = _rand_images(1, 150, 150, seed=7)
        rows = np.concatenate([np.array([
            [5, 5, 60, 60, 8, 8, 2],       # -> (8,8)..(128,128)
            [80, 20, 40, 50, 130, 100, 1],  # -> within 192
            np.zeros(7)], np.float32)])
        rows = rows.reshape(3, 7)
        tbl, ovf = build_tile_tables(rows, OUT, OUT, TILE, CAP)
        assert not ovf
        painted = np.asarray(assemble_mosaic_pallas_batch(
            jnp.asarray(imgs), jnp.asarray(tbl[None]), OUT, OUT,
            tile=TILE, dtype=jnp.float32, interpret=True))
        crop = painted[:, :192, :192, :]
        oracle = np.asarray(assemble_mosaic(
            jnp.asarray(imgs[0]), jnp.asarray(rows), 192, 192))
        ring = _ring_masks([rows], 192)[0]
        bad = np.abs(crop[0] - oracle).max(-1) > 1e-3
        assert not (bad & ~ring).any()


class TestDeviceTableBuild:
    """build_tile_tables_jax (in-program binning) must reproduce the
    python/native host builder bit-for-bit, and tile_max_count must
    agree with the builder's overflow semantics — together they let the
    serving pipeline ship only the (b, R, 7) unmap rows and bin on
    device (two_stage table_build="device")."""

    def _rand_rows(self, rs, n_rows=24, pad_to=32):
        rows = np.zeros((pad_to, 7), np.float32)
        for i in range(n_rows):
            f = rs.choice([1, 2, 4])
            w = rs.randint(1, 90)
            h = rs.randint(1, 90)
            rows[i] = [rs.randint(0, 300), rs.randint(0, 220), w, h,
                       rs.randint(0, OUT), rs.randint(0, OUT), f]
        return rows

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_py_builder(self, seed):
        from glsdet_tpu.ufp.pallas_paint import (build_tile_tables_jax,
                                                 build_tile_tables_py)
        rs = np.random.RandomState(seed)
        rows = self._rand_rows(rs)
        ref, _ = build_tile_tables_py(rows, OUT, OUT, TILE, CAP)
        got = np.asarray(build_tile_tables_jax(
            jnp.asarray(rows), OUT, OUT, TILE, CAP))
        np.testing.assert_array_equal(got, ref)

    def test_cap_drop_matches_py(self):
        # more entries in one tile than cap: both builders keep the
        # first cap rows in row order and drop the rest
        from glsdet_tpu.ufp.pallas_paint import (build_tile_tables_jax,
                                                 build_tile_tables_py)
        rows = np.zeros((CAP + 6, 7), np.float32)
        for i in range(CAP + 4):
            rows[i] = [i, i, 8, 8, 4, 4, 1]
        ref, ovf = build_tile_tables_py(rows, OUT, OUT, TILE, CAP)
        assert ovf
        got = np.asarray(build_tile_tables_jax(
            jnp.asarray(rows), OUT, OUT, TILE, CAP))
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("seed", [5, 6, 7])
    def test_tile_max_count_matches_builder(self, seed):
        from glsdet_tpu.ufp.pallas_paint import (build_tile_tables_py,
                                                 tile_max_count)
        rs = np.random.RandomState(seed)
        rows = self._rand_rows(rs, n_rows=28)
        # a huge cap makes the py builder count without saturating
        tbl, _ = build_tile_tables_py(rows, OUT, OUT, TILE, cap=512)
        true_max = int(tbl[..., 7].sum(axis=-1).max())
        assert tile_max_count(rows, OUT, OUT, TILE) == true_max
        # overflow agreement at the real cap
        _, ovf = build_tile_tables_py(rows, OUT, OUT, TILE, CAP)
        assert (tile_max_count(rows, OUT, OUT, TILE) > CAP) == ovf
