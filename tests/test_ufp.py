"""UFP packing geometry + on-device mosaic assembly tests."""

import numpy as np
import jax.numpy as jnp

from glsdet_tpu.ufp.packing import (
    foreground_regions, pack_regions, pack_regions_fit, scale_boxes,
    strip_pack, unified_foreground_packing, unified_foreground_packing_fit)
from glsdet_tpu.ufp.assembly import (
    assemble_mosaic, chip_boxes_from_regions, regions_to_array,
    unmap_chip_detections)


def test_scale_boxes_expand_and_clip():
    boxes = np.array([[10, 10, 30, 30], [0, 0, 2000, 1000]], np.float64)
    got = scale_boxes(boxes, 1.5, (1333, 800))
    np.testing.assert_allclose(got[0], [5, 5, 35, 35])
    np.testing.assert_allclose(got[1], [0, 0, 1332, 799])


def test_foreground_regions_merges_overlaps():
    # Merge happens iff union-bbox area < sum of areas: [0,0,10,10] and
    # [2,2,12,12] union to 144 < 200 so they merge; the far one stays.
    boxes = np.array([[0, 0, 10, 10], [2, 2, 12, 12], [100, 100, 110, 110]],
                     np.float64)
    regions, factors = foreground_regions(boxes, boxes.copy())
    assert regions.shape[0] == 2
    np.testing.assert_allclose(regions[0], [0, 0, 12, 12])
    np.testing.assert_allclose(regions[1], [100, 100, 110, 110])
    # 10x10 boxes (+1 convention -> 121 px^2) are < 32^2 -> 4x upscale.
    assert factors.tolist() == [4, 4]


def test_foreground_regions_scale_factor_thresholds():
    mk = lambda s: np.array([[0, 0, s - 1, s - 1]], np.float64)  # area s^2
    for size, want in ((16, 4), (40, 2), (100, 1)):
        _, f = foreground_regions(mk(size), mk(size).copy())
        assert f.tolist() == [want], size


def test_strip_pack_no_overlap_and_within_width():
    rng = np.random.RandomState(0)
    sizes = [(float(rng.randint(10, 120)), float(rng.randint(10, 120)))
             for _ in range(25)]
    width = 300.0
    height, placed = strip_pack(width, sizes, sort_by="height")
    assert height > 0
    rects = []
    for (w, h), (x, y) in zip(sizes, placed):
        assert x >= 0 and y >= 0
        assert x + w <= width + 1e-9
        assert y + h <= height + 1e-9
        rects.append((x, y, x + w, y + h))
    # pairwise non-overlap
    for i in range(len(rects)):
        for j in range(i + 1, len(rects)):
            a, b = rects[i], rects[j]
            ix = min(a[2], b[2]) - max(a[0], b[0])
            iy = min(a[3], b[3]) - max(a[1], b[1])
            assert ix <= 1e-9 or iy <= 1e-9, (i, j, a, b)


def test_pack_regions_near_square():
    rng = np.random.RandomState(1)
    regions = []
    for _ in range(12):
        x, y = rng.randint(0, 800, 2)
        w, h = rng.randint(40, 200, 2)
        regions.append([x, y, x + w, y + h])
    regions = np.asarray(regions, np.float64)
    factors = np.ones(12, np.int64)
    out, mw, mh = pack_regions(regions, factors)
    assert len(out) == 12
    assert mw <= 2666 and mh <= 2666 + 200  # near-square by construction
    for r in out:
        assert r.new_x >= 0 and r.new_y >= 0
        assert r.new_x + r.w * r.scale_factor <= mw + 1e-9
        assert r.new_y + r.h * r.scale_factor <= mh + 1e-9


def test_ufp_end_to_end_regions_cover_inputs():
    rng = np.random.RandomState(2)
    n = 30
    xy = rng.uniform(0, 900, (n, 2))
    wh = rng.uniform(10, 80, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1)
    regions, mw, mh = unified_foreground_packing(boxes, 1.5, (1000, 1000))
    assert len(regions) >= 1 and mw > 0 and mh > 0
    # Total packed area ~= sum of scaled region areas (no overlap proven in
    # strip test; here just sanity-check the mosaic isn't degenerate).
    area = sum(r.w * r.scale_factor * r.h * r.scale_factor for r in regions)
    assert area <= mw * mh + 1e-6


def _assert_layout_valid(out, bound_w, bound_h):
    rects = []
    for r in out:
        x2 = r.new_x + r.w * r.scale_factor
        y2 = r.new_y + r.h * r.scale_factor
        assert r.new_x >= 0 and r.new_y >= 0
        assert x2 <= bound_w + 1e-9 and y2 <= bound_h + 1e-9
        rects.append((r.new_x, r.new_y, x2, y2))
    for i in range(len(rects)):
        for j in range(i + 1, len(rects)):
            a, b = rects[i], rects[j]
            ix = min(a[2], b[2]) - max(a[0], b[0])
            iy = min(a[3], b[3]) - max(a[1], b[1])
            assert ix <= 1e-9 or iy <= 1e-9, (i, j, a, b)


def test_pack_regions_fit_fits_ladder_and_keeps_crops():
    rng = np.random.RandomState(3)
    for trial in range(5):
        regions = []
        for _ in range(40):
            x, y = rng.randint(0, 1200, 2)
            w, h = rng.randint(20, 160, 2)
            regions.append([x, y, x + w, y + h])
        regions = np.asarray(regions, np.float64)
        factors = rng.choice([1, 2, 4], 40).astype(np.int64)
        buckets = (768, 1024, 1152, 1280, 1536, 2688)
        out, mw, mh, bucket = pack_regions_fit(regions, factors, buckets)
        assert bucket in buckets
        assert mw <= bucket + 1e-9 and mh <= bucket + 1e-9
        _assert_layout_valid(out, bucket, bucket)
        # crops/factors identical to the reference pack (layout-only change)
        ref, _, _ = pack_regions(regions, factors)
        for a, b in zip(out, ref):
            assert (a.x1, a.y1, a.w, a.h, a.scale_factor) == \
                   (b.x1, b.y1, b.w, b.h, b.scale_factor), trial


def test_pack_regions_fit_fallback_matches_reference():
    rng = np.random.RandomState(4)
    regions = []
    for _ in range(20):
        x, y = rng.randint(0, 600, 2)
        w, h = rng.randint(50, 300, 2)
        regions.append([x, y, x + w, y + h])
    regions = np.asarray(regions, np.float64)
    factors = np.full(20, 2, np.int64)
    # ladder far too small -> no fit -> exact reference layout
    out, mw, mh, bucket = pack_regions_fit(regions, factors, (64, 128))
    ref, rw, rh = pack_regions(regions, factors)
    assert bucket is None and (mw, mh) == (rw, rh)
    assert [r.as_row() for r in out] == [r.as_row() for r in ref]


def test_ufp_fit_end_to_end():
    rng = np.random.RandomState(5)
    n = 60
    xy = rng.uniform(0, 1200, (n, 2))
    wh = rng.uniform(10, 90, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1)
    buckets = (768, 1024, 1152, 1280, 1536, 2688)
    regions, mw, mh, bucket = unified_foreground_packing_fit(
        boxes, 1.5, (1400, 1400), buckets)
    ref_regions, ref_w, ref_h = unified_foreground_packing(
        boxes, 1.5, (1400, 1400))
    assert len(regions) == len(ref_regions)
    if bucket is not None:
        from glsdet_tpu.eval.two_stage import pick_bucket
        assert bucket <= pick_bucket(ref_h, ref_w, buckets)
        _assert_layout_valid(regions, bucket, bucket)


def test_ufp_empty_input():
    regions, mw, mh = unified_foreground_packing(np.zeros((0, 4)), 1.5, (100, 100))
    assert regions == [] and mw == 0 and mh == 0


def test_assemble_mosaic_identity_region():
    # One region, factor 1, pasted at origin => mosaic equals the crop.
    img = np.arange(40 * 40 * 3, dtype=np.float32).reshape(40, 40, 3)
    regions = np.zeros((4, 7), np.float32)
    regions[0] = [5, 7, 16, 12, 0, 0, 1]  # crop 16x12 at (5,7) -> (0,0) x1
    out = np.asarray(assemble_mosaic(jnp.asarray(img), jnp.asarray(regions), 32, 32))
    np.testing.assert_allclose(out[:12, :16], img[7:19, 5:21], atol=1e-4)
    assert np.all(out[12:, :] == 0) and np.all(out[:, 16:] == 0)


def test_assemble_mosaic_2x_upscale_matches_bilinear():
    rng = np.random.RandomState(3)
    img = rng.uniform(0, 255, (24, 24, 3)).astype(np.float32)
    regions = np.zeros((2, 7), np.float32)
    regions[0] = [4, 4, 8, 8, 0, 0, 2]  # 8x8 crop upscaled 2x -> 16x16
    out = np.asarray(assemble_mosaic(jnp.asarray(img), jnp.asarray(regions), 16, 16))
    crop = img[4:12, 4:12]
    # cv2-convention bilinear 2x oracle
    want = np.zeros((16, 16, 3), np.float32)
    for yo in range(16):
        for xo in range(16):
            sy = np.clip((yo + 0.5) / 2 - 0.5, 0, 7)
            sx = np.clip((xo + 0.5) / 2 - 0.5, 0, 7)
            y0, x0 = int(np.floor(sy)), int(np.floor(sx))
            y1, x1 = min(y0 + 1, 7), min(x0 + 1, 7)
            wy, wx = sy - y0, sx - x0
            want[yo, xo] = (crop[y0, x0] * (1 - wy) * (1 - wx)
                            + crop[y0, x1] * (1 - wy) * wx
                            + crop[y1, x0] * wy * (1 - wx)
                            + crop[y1, x1] * wy * wx)
    np.testing.assert_allclose(out, want, atol=1e-3)


def test_unmap_chip_detections_inverse_affine():
    regions = np.zeros((3, 7), np.float32)
    regions[0] = [100, 200, 50, 40, 0, 0, 2]    # chip [0,0,100,80]
    regions[1] = [300, 300, 30, 30, 120, 0, 1]  # chip [120,0,150,30]
    det = jnp.asarray([[10.0, 10, 30, 30],      # inside chip 0
                       [125.0, 5, 145, 25],     # inside chip 1
                       [90.0, 70, 130, 85]])    # straddles -> IoF < 0.9
    valid = jnp.asarray([True, True, True])
    boxes, take = unmap_chip_detections(det, valid, jnp.asarray(regions))
    take = np.asarray(take)
    assert take[0].tolist() == [True, False, False]
    assert take[1].tolist() == [False, True, False]
    assert not take[2].any()
    b0 = np.asarray(boxes)[0, 0]
    # x: 10/2 + 100 = 105; y: 10/2 + 200 = 205; w = 20/2 = 10
    np.testing.assert_allclose(b0, [105, 205, 115, 215], atol=1e-5)
    b1 = np.asarray(boxes)[1, 1]
    np.testing.assert_allclose(b1, [305, 305, 325, 325], atol=1e-5)


def test_regions_roundtrip_and_chip_boxes():
    from glsdet_tpu.ufp.packing import Region
    rs = [Region(1.2, 2.7, 10.9, 5.1, 3.4, 4.9, 2)]
    arr = regions_to_array(rs, 4)
    assert arr.shape == (4, 7)
    np.testing.assert_allclose(arr[0], [1, 2, 10, 5, 3, 4, 2])  # floored
    chips = np.asarray(chip_boxes_from_regions(jnp.asarray(arr)))
    np.testing.assert_allclose(chips[0], [3, 4, 3 + 20, 4 + 10])


def test_unmap_argmax_matches_expanded():
    from glsdet_tpu.ufp.assembly import unmap_chip_detections_argmax

    regions = np.zeros((3, 7), np.float32)
    regions[0] = [100, 200, 50, 40, 0, 0, 2]
    regions[1] = [300, 300, 30, 30, 120, 0, 1]
    det = jnp.asarray([[10.0, 10, 30, 30],
                       [125.0, 5, 145, 25],
                       [90.0, 70, 130, 85]])
    valid = jnp.asarray([True, True, True])
    boxes, keep = unmap_chip_detections_argmax(det, valid,
                                               jnp.asarray(regions))
    keep = np.asarray(keep)
    assert keep.tolist() == [True, True, False]
    np.testing.assert_allclose(np.asarray(boxes)[0],
                               [105, 205, 115, 215], atol=1e-5)
    np.testing.assert_allclose(np.asarray(boxes)[1],
                               [305, 305, 325, 325], atol=1e-5)


class TestAssembleFast:
    """assemble_mosaic_fast (slice+static-upscale) vs the inverse-map
    oracle: identical except the outermost 1px ring of each region
    (crop-edge clamp vs source bleed, documented in assembly.py)."""

    def _interior_mask(self, regions, out):
        m = np.zeros((out, out), bool)
        for r in regions:
            x1, y1, w, h, nx, ny, f = r
            if f <= 0:
                continue
            ax, ay = int(nx), int(ny)
            bx = min(int(nx + w * f), out)
            by = min(int(ny + h * f), out)
            fi = int(f)
            m[ay + fi:by - fi, ax + fi:bx - fi] = True
        return m

    def test_matches_oracle_random_regions(self):
        from glsdet_tpu.ufp.assembly import assemble_mosaic_fast

        rng = np.random.RandomState(0)
        img = rng.uniform(0, 255, (60, 80, 3)).astype(np.float32)
        out = 64
        regions = np.zeros((8, 7), np.float32)
        # non-overlapping paste sites, mixed factors, odd offsets
        regions[0] = [3, 5, 14, 10, 1, 3, 1]
        regions[1] = [20, 8, 9, 7, 17, 2, 2]
        regions[2] = [40, 30, 5, 6, 37, 21, 4]
        regions[3] = [10, 40, 12, 11, 1, 47, 1]
        ref = np.asarray(assemble_mosaic(
            jnp.asarray(img), jnp.asarray(regions), out, out))
        fast = np.asarray(assemble_mosaic_fast(
            jnp.asarray(img), jnp.asarray(regions), out, out))
        inner = self._interior_mask(regions, out)
        np.testing.assert_allclose(fast[inner], ref[inner], atol=1e-3)
        # outside every region both are exactly zero
        outside = ~self._interior_mask(
            regions + np.array([0, 0, 2, 2, -1, -1, 0], np.float32), out)
        outside &= (ref == 0).all(-1)
        assert (fast[outside] == 0).all()

    def test_uint8_input_and_identity(self):
        from glsdet_tpu.ufp.assembly import assemble_mosaic_fast

        img = np.arange(40 * 40 * 3, dtype=np.uint8).reshape(40, 40, 3)
        regions = np.zeros((4, 7), np.float32)
        regions[0] = [5, 7, 16, 12, 0, 0, 1]
        fast = np.asarray(assemble_mosaic_fast(
            jnp.asarray(img), jnp.asarray(regions), 32, 32))
        np.testing.assert_allclose(fast[:12, :16],
                                   img[7:19, 5:21].astype(np.float32))
        assert np.all(fast[12:, :] == 0) and np.all(fast[:, 16:] == 0)

    def test_empty_regions_zero_canvas(self):
        from glsdet_tpu.ufp.assembly import assemble_mosaic_fast

        img = np.ones((20, 20, 3), np.float32)
        fast = np.asarray(assemble_mosaic_fast(
            jnp.asarray(img), jnp.zeros((4, 7), jnp.float32), 16, 16))
        assert (fast == 0).all()


class TestAssembleTiled:
    """assemble_mosaic_tiled (windowed RMW painter): exact on chip
    interiors vs both the fast path and the gather oracle; the
    factor-wide border ring deviates by <= 1 source pixel of
    clamp/bleed (deviation class documented in assembly.py).  Splitting
    via split_rows_for_tile is seamless — sub-crops slice the same
    padded source, so split lines are NOT deviation zones."""

    def _interior(self, regions, out):
        m = np.zeros((out, out), bool)
        for r in np.asarray(regions):
            x1, y1, w, h, nx, ny, f = r
            if f <= 0:
                continue
            fi = int(f)
            m[int(ny) + fi:min(int(ny + h * f), out) - fi,
              int(nx) + fi:min(int(nx + w * f), out) - fi] = True
        return m

    def test_matches_fast_and_oracle_interiors(self):
        from glsdet_tpu.ufp.assembly import (assemble_mosaic_fast,
                                             assemble_mosaic_tiled)

        rng = np.random.RandomState(1)
        img = rng.uniform(0, 255, (60, 80, 3)).astype(np.float32)
        out = 64
        regions = np.zeros((8, 7), np.float32)
        regions[0] = [3, 5, 14, 10, 1, 3, 1]
        regions[1] = [20, 8, 9, 7, 17, 2, 2]
        regions[2] = [40, 30, 5, 6, 37, 21, 4]
        regions[3] = [10, 40, 12, 11, 1, 47, 1]
        fast = np.asarray(assemble_mosaic_fast(
            jnp.asarray(img), jnp.asarray(regions), out, out))
        oracle = np.asarray(assemble_mosaic(
            jnp.asarray(img), jnp.asarray(regions), out, out))
        tiled = np.asarray(assemble_mosaic_tiled(
            jnp.asarray(img), jnp.asarray(regions), out, out, tile=32))
        inner = self._interior(regions, out)
        np.testing.assert_allclose(tiled[inner], fast[inner], atol=1e-3)
        np.testing.assert_allclose(tiled[inner], oracle[inner], atol=1e-3)
        # border ring bounded by 1 src px of clamp/bleed; canvas zeros
        # outside chips
        assert np.abs(tiled - fast).max() < 256.0
        outside = ~self._interior(
            regions + np.array([0, 0, 2, 2, -1, -1, 0], np.float32), out)
        outside &= (oracle == 0).all(-1)
        assert (tiled[outside] == 0).all()

    def test_split_rows_seamless(self):
        from glsdet_tpu.ufp.assembly import (assemble_mosaic_fast,
                                             assemble_mosaic_tiled,
                                             split_rows_for_tile)

        rng = np.random.RandomState(2)
        img = rng.uniform(0, 255, (80, 100, 3)).astype(np.float32)
        out = 64
        # one chip larger than the tile in both dims (48x40 at f=1),
        # one 2x chip whose scaled size (44) exceeds the 32-tile
        regions = np.zeros((4, 7), np.float32)
        regions[0] = [10, 12, 48, 40, 2, 3, 1]
        regions[1] = [60, 50, 22, 13, 2, 45, 2]
        fast = np.asarray(assemble_mosaic_fast(
            jnp.asarray(img), jnp.asarray(regions), out, out))
        paint = split_rows_for_tile(regions, 32, 32)
        assert (paint[:, 6] > 0).sum() > 2  # actually split
        # scaled sub-chips all fit the tile
        live = paint[paint[:, 6] > 0]
        assert (live[:, 2] * live[:, 6] <= 32).all()
        assert (live[:, 3] * live[:, 6] <= 32).all()
        tiled = np.asarray(assemble_mosaic_tiled(
            jnp.asarray(img), jnp.asarray(paint), out, out, tile=32))
        # compare on ORIGINAL-chip interiors: split lines inside them
        # must be seamless (any split artifact would show up here)
        inner = self._interior(regions, out)
        assert inner.sum() > 1500
        np.testing.assert_allclose(tiled[inner], fast[inner], atol=1e-3)

    def test_canvas_edge_overhang_and_empty(self):
        from glsdet_tpu.ufp.assembly import assemble_mosaic_tiled

        img = np.ones((40, 40, 3), np.float32) * 7.0
        regions = np.zeros((2, 7), np.float32)
        # chip overhangs the right/bottom canvas edge
        regions[0] = [0, 0, 20, 20, 50, 50, 1]
        tiled = np.asarray(assemble_mosaic_tiled(
            jnp.asarray(img), jnp.asarray(regions), 64, 64, tile=32))
        assert (tiled[50:, 50:] == 7.0).all()
        assert (tiled[:50, :] == 0).all() and (tiled[:, :50] == 0).all()
        empty = np.asarray(assemble_mosaic_tiled(
            jnp.asarray(img), jnp.zeros((3, 7), jnp.float32), 32, 32,
            tile=16))
        assert (empty == 0).all()

    def test_batch_painter_matches_single(self):
        from glsdet_tpu.ufp.assembly import (assemble_mosaic_tiled,
                                             assemble_mosaic_tiled_batch,
                                             split_rows_for_tile)

        rng = np.random.RandomState(3)
        imgs = rng.uniform(0, 255, (2, 60, 80, 3)).astype(np.float32)
        out = 64
        r0 = np.zeros((4, 7), np.float32)
        r0[0] = [3, 5, 14, 10, 1, 3, 1]
        r0[1] = [20, 8, 9, 7, 17, 2, 2]
        r1 = np.zeros((4, 7), np.float32)
        r1[0] = [40, 30, 5, 6, 37, 21, 4]
        p0 = split_rows_for_tile(r0, 32, 8)
        p1 = split_rows_for_tile(r1, 32, 8)
        flat = np.concatenate([
            np.concatenate([p0, np.full((8, 1), 0, np.float32)], 1),
            np.concatenate([p1, np.full((8, 1), 1, np.float32)], 1)], 0)
        got = np.asarray(assemble_mosaic_tiled_batch(
            jnp.asarray(imgs), jnp.asarray(flat), out, out, tile=32))
        for b, p in enumerate((p0, p1)):
            want = np.asarray(assemble_mosaic_tiled(
                jnp.asarray(imgs[b]), jnp.asarray(p), out, out, tile=32))
            np.testing.assert_allclose(got[b], want, atol=1e-4)
