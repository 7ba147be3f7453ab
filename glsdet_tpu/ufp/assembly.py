"""On-device mosaic assembly and chip-detection unmapping.

The reference assembles the UFP mosaic on the host with a python loop of
``cv2`` crop/resize/paste per region (ufpmp_det_eval.py:182-193) and
unmaps chip detections with nested python loops (:282-296).  Both are
rebuilt here as fixed-shape XLA programs:

- ``assemble_mosaic``: *inverse mapping* — every output pixel computes
  which region covers it and bilinearly samples the source image at the
  corresponding (downscaled) coordinate.  One gather pass, no dynamic
  shapes, embarrassingly parallel — the natural TPU formulation of
  crop+resize+paste.
- ``unmap_chip_detections``: vectorized IoF gating of mosaic detections
  against chip rectangles plus the inverse affine back to original image
  coordinates.

Regions are padded to a fixed ``max_regions``; padding rows have
``scale_factor = 0`` and are ignored.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.ops.boxes import pairwise_iof_min


def regions_to_array(regions, max_regions: int) -> np.ndarray:
    """Pack a list of ``Region`` into a padded (max_regions, 7) float array
    ``[x1, y1, w, h, new_x, new_y, scale_factor]``; padding rows are zero.

    Coordinates are floored like the reference's mosaic assembly
    (``math.floor`` at ufpmp_det_eval.py:188) so chip boundaries land on
    integer pixels.
    """
    arr = np.zeros((max_regions, 7), dtype=np.float32)
    for i, r in enumerate(regions[:max_regions]):
        arr[i] = np.floor(np.asarray(r.as_row(), dtype=np.float64))
    return arr


def assemble_mosaic(image: jnp.ndarray, regions: jnp.ndarray,
                    out_h: int, out_w: int) -> jnp.ndarray:
    """Build the packed mosaic from a source image.

    Args:
        image: (H, W, C) source image (any float/int dtype).
        regions: (R, 7) padded rows ``[x1, y1, w, h, new_x, new_y, factor]``
            with integer-valued entries; ``factor == 0`` marks padding.
        out_h, out_w: static mosaic canvas size (regions outside are
            clipped; callers bucket mosaic sizes to bound recompiles).

    Returns:
        (out_h, out_w, C) float32 mosaic; uncovered pixels are zero.
    """
    img = image.astype(jnp.float32)
    h, w = img.shape[0], img.shape[1]
    yy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)

    def per_region(carry, region):
        src_y, src_x, covered = carry
        x1, y1, rw, rh, nx, ny, f = (region[0], region[1], region[2],
                                     region[3], region[4], region[5],
                                     region[6])
        valid = f > 0
        inv_f = jnp.where(valid, 1.0 / jnp.maximum(f, 1.0), 0.0)
        inside = ((xx >= nx) & (xx < nx + rw * f)
                  & (yy >= ny) & (yy < ny + rh * f) & valid)
        # cv2.resize (bilinear) coordinate convention:
        #   src = (dst + 0.5) * (src_size / dst_size) - 0.5
        ry = (yy - ny + 0.5) * inv_f - 0.5
        rx = (xx - nx + 0.5) * inv_f - 0.5
        # Clamp inside the crop so samples never bleed past the region.
        ry = jnp.clip(ry, 0.0, rh - 1.0) + y1
        rx = jnp.clip(rx, 0.0, rw - 1.0) + x1
        src_y = jnp.where(inside, ry, src_y)
        src_x = jnp.where(inside, rx, src_x)
        covered = covered | inside
        return (src_y, src_x, covered), None

    zeros = jnp.zeros((out_h, out_w), jnp.float32)
    (src_y, src_x, covered), _ = jax.lax.scan(
        per_region, (zeros, zeros, zeros.astype(bool)), regions)

    # Bilinear gather from the source image.
    y0 = jnp.clip(jnp.floor(src_y), 0, h - 1)
    x0 = jnp.clip(jnp.floor(src_x), 0, w - 1)
    y1i = jnp.clip(y0 + 1, 0, h - 1)
    x1i = jnp.clip(x0 + 1, 0, w - 1)
    wy = (src_y - y0)[..., None]
    wx = (src_x - x0)[..., None]
    y0, x0, y1i, x1i = (a.astype(jnp.int32) for a in (y0, x0, y1i, x1i))

    p00 = img[y0, x0]
    p01 = img[y0, x1i]
    p10 = img[y1i, x0]
    p11 = img[y1i, x1i]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    out = top * (1 - wy) + bot * wy
    return jnp.where(covered[..., None], out, 0.0)


def _upscale2(a: jnp.ndarray) -> jnp.ndarray:
    """cv2 INTER_LINEAR x2 upscale, separable, static shapes.

    dst[2i] = 0.25*a[i-1] + 0.75*a[i]; dst[2i+1] = 0.75*a[i] + 0.25*a[i+1]
    (edge-clamped) — exactly ``src = (dst+0.5)/2 - 0.5``.
    """
    def axis_up(x):                      # upscale axis 0
        prev = jnp.concatenate([x[:1], x[:-1]], axis=0)
        nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)
        even = 0.25 * prev + 0.75 * x
        odd = 0.75 * x + 0.25 * nxt
        return jnp.stack([even, odd], axis=1).reshape(
            (2 * x.shape[0],) + x.shape[1:])

    a = axis_up(a)
    return jnp.swapaxes(axis_up(jnp.swapaxes(a, 0, 1)), 0, 1)


def _upscale4(a: jnp.ndarray) -> jnp.ndarray:
    """cv2 INTER_LINEAR x4 upscale (offsets ±0.375, ±0.125)."""
    def axis_up(x):
        prev = jnp.concatenate([x[:1], x[:-1]], axis=0)
        nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)
        p0 = 0.375 * prev + 0.625 * x
        p1 = 0.125 * prev + 0.875 * x
        p2 = 0.875 * x + 0.125 * nxt
        p3 = 0.625 * x + 0.375 * nxt
        return jnp.stack([p0, p1, p2, p3], axis=1).reshape(
            (4 * x.shape[0],) + x.shape[1:])

    a = axis_up(a)
    return jnp.swapaxes(axis_up(jnp.swapaxes(a, 0, 1)), 0, 1)


def assemble_mosaic_fast(image: jnp.ndarray, regions: jnp.ndarray,
                         out_h: int, out_w: int) -> jnp.ndarray:
    """Gather-free mosaic assembly: per region ONE dynamic_slice from a
    padded source + a static integer-factor bilinear upscale + a masked
    paste.  Upscale factors are the UFP set {1, 2, 4}
    (unified_foreground_packing.py:96-101), so every branch has static
    shapes and the whole pass is contiguous DMA + VPU math — no
    per-pixel gathers (the inverse-map formulation in
    ``assemble_mosaic`` spends ~98% of its time in a 20M-element random
    gather on TPU; this version is ~10x faster at 1280x1280).

    Numerics: identical to ``assemble_mosaic`` except the outermost 1px
    ring of each region, where cv2-crop semantics clamp at the crop edge
    but the sliced source bleeds into neighboring pixels.

    Requires out_h == out_w divisible by 4.
    """
    assert out_h == out_w and out_h % 4 == 0
    src_h, src_w = int(image.shape[0]), int(image.shape[1])
    c = int(image.shape[2])
    pad_t, pad_l = out_h, out_w
    padded = jnp.pad(image, ((pad_t, out_h + 4), (pad_l, out_w + 4),
                             (0, 0)))

    yy = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)

    def region_canvas(region, factor: int):
        """The full (out_h, out_w) canvas as if this region's upscaled
        crop covered everything; masked by the caller."""
        x1, y1 = region[0], region[1]
        nx, ny = region[4], region[5]
        f = float(factor)
        qy = jnp.floor(ny / f)
        qx = jnp.floor(nx / f)
        ry = (ny - qy * f).astype(jnp.int32)      # residue in [0, f)
        rx = (nx - qx * f).astype(jnp.int32)
        sy = (y1 - qy + pad_t).astype(jnp.int32)
        sx = (x1 - qx + pad_l).astype(jnp.int32)
        n = out_h // factor + 1
        crop = jax.lax.dynamic_slice(
            padded, (sy, sx, jnp.int32(0)), (n, n, c)).astype(jnp.float32)
        if factor == 1:
            up = crop
        elif factor == 2:
            up = _upscale2(crop)
        else:
            up = _upscale4(crop)                   # (out+f, out+f, c)
        # out[y] = up[y - ry]: pad top/left by f, slice at (f-ry, f-rx)
        up = jnp.pad(up, ((factor, 0), (factor, 0), (0, 0)))
        return jax.lax.dynamic_slice(
            up, (factor - ry, factor - rx, jnp.int32(0)),
            (out_h, out_w, c))

    def per_region(canvas, region):
        rw, rh, nx, ny, f = (region[2], region[3], region[4], region[5],
                             region[6])
        fi = jnp.clip(f, 1.0, 4.0).astype(jnp.int32)
        branch = jnp.int32(0) + (fi >= 2) + (fi >= 4)  # 1->0, 2->1, 4->2
        val = jax.lax.switch(
            branch,
            [lambda r: region_canvas(r, 1),
             lambda r: region_canvas(r, 2),
             lambda r: region_canvas(r, 4)], region)
        inside = ((xx >= nx) & (xx < nx + rw * f)
                  & (yy >= ny) & (yy < ny + rh * f) & (f > 0))
        return jnp.where(inside[..., None], val, canvas), None

    canvas = jnp.zeros((out_h, out_w, c), jnp.float32)
    canvas, _ = jax.lax.scan(per_region, canvas, regions)
    return canvas


def split_rows_for_tile(rows: np.ndarray, tile: int,
                        max_rows: int) -> np.ndarray:
    """Split region rows whose *scaled* chip exceeds ``tile`` in either
    dimension into a grid of sub-chips that each fit a (tile, tile)
    canvas window (for ``assemble_mosaic_tiled``).

    Sub-chips crop the same source image, so sampling is seamless across
    split lines (the tiled assembly reads the full padded source, not
    per-chip crops).  Use the split rows only for *painting*; unmapping
    must keep the original rows so IoF gating sees whole chips.

    Args:
        rows: (R, 7) float rows ``[x1, y1, w, h, nx, ny, f]`` (integer
            valued; f == 0 padding rows are dropped).
        tile: window size the painter uses.
        max_rows: output capacity (overflow rows are dropped).

    Returns (max_rows, 7) float32, zero-padded.
    """
    out = []
    for r in np.asarray(rows, np.float64):
        x1, y1, w, h, nx, ny, f = r
        if f <= 0 or w <= 0 or h <= 0:
            continue
        step = tile // int(f)          # source pixels per window
        for oy in range(0, int(h), step):
            for ox in range(0, int(w), step):
                sw = min(step, int(w) - ox)
                sh = min(step, int(h) - oy)
                out.append([x1 + ox, y1 + oy, sw, sh,
                            nx + ox * f, ny + oy * f, f])
    arr = np.zeros((max_rows, 7), np.float32)
    for i, row in enumerate(out[:max_rows]):
        arr[i] = row
    return arr


def assemble_mosaic_tiled(image: jnp.ndarray, paint_regions: jnp.ndarray,
                          out_h: int, out_w: int,
                          tile: int = 512) -> jnp.ndarray:
    """Tiled read-modify-write mosaic assembly.

    Same crop -> x{1,2,4} upscale -> paste semantics as
    ``assemble_mosaic_fast``: interiors (>= factor pixels from a chip
    border) are exact; the outermost factor-wide ring of each chip
    differs from the gather oracle (and from ``assemble_mosaic_fast``)
    by at most one source pixel of edge-clamp/bleed — the deviation
    class documented on ``assemble_mosaic_fast``.  Every per-region
    operation is sized to a (tile, tile) canvas window around the chip
    instead of the full canvas: dynamic_slice the window, blend the
    upscaled crop, dynamic_update_slice it back.  At 1280^2 with 32
    regions this is ~25x less HBM traffic than the full-canvas scan
    (which XLA cannot shrink, and which pays all three factor branches
    under vmap).

    ``paint_regions`` rows must satisfy ``w*f <= tile`` and
    ``h*f <= tile`` — produced by ``split_rows_for_tile``.  Chips may
    overhang the canvas edge (window origin is clamped; overhanging
    pixels drop, as in the masked full-canvas paste).

    Requires tile % 4 == 0 and out_h >= tile, out_w >= tile.
    """
    t = int(tile)
    assert t % 4 == 0 and out_h >= t and out_w >= t
    c = int(image.shape[2])
    # Source padding: window crops start at x1 - qx with qx in [0, t/f],
    # and read t/f + 1 (+1 halo) pixels.
    padded = jnp.pad(image, ((t, t + 4), (t, t + 4), (0, 0)))

    p_iota = jax.lax.broadcasted_iota(jnp.float32, (t, t), 0)
    q_iota = jax.lax.broadcasted_iota(jnp.float32, (t, t), 1)

    def window_val(region, ty, tx, factor: int):
        """Upscaled crop covering the whole (t, t) window at canvas
        origin (ty, tx); caller masks to the chip rect."""
        x1, y1 = region[0], region[1]
        nyw = region[5] - ty           # chip origin in window coords >= 0
        nxw = region[4] - tx
        f = float(factor)
        qy = jnp.floor(nyw / f)
        qx = jnp.floor(nxw / f)
        ry = (nyw - qy * f).astype(jnp.int32)
        rx = (nxw - qx * f).astype(jnp.int32)
        sy = (y1 - qy + t).astype(jnp.int32)
        sx = (x1 - qx + t).astype(jnp.int32)
        n = t // factor + 1
        crop = jax.lax.dynamic_slice(
            padded, (sy, sx, jnp.int32(0)), (n, n, c)).astype(jnp.float32)
        if factor == 1:
            up = crop
        elif factor == 2:
            up = _upscale2(crop)
        else:
            up = _upscale4(crop)                   # (t + f, t + f, c)
        up = jnp.pad(up, ((factor, 0), (factor, 0), (0, 0)))
        return jax.lax.dynamic_slice(
            up, (factor - ry, factor - rx, jnp.int32(0)), (t, t, c))

    def per_region(canvas, region):
        rw, rh, nx, ny, f = (region[2], region[3], region[4], region[5],
                             region[6])
        ty = jnp.clip(ny, 0, out_h - t).astype(jnp.int32)
        tx = jnp.clip(nx, 0, out_w - t).astype(jnp.int32)
        fi = jnp.clip(f, 1.0, 4.0).astype(jnp.int32)
        branch = jnp.int32(0) + (fi >= 2) + (fi >= 4)
        val = jax.lax.switch(
            branch,
            [lambda r: window_val(r, ty.astype(jnp.float32),
                                  tx.astype(jnp.float32), 1),
             lambda r: window_val(r, ty.astype(jnp.float32),
                                  tx.astype(jnp.float32), 2),
             lambda r: window_val(r, ty.astype(jnp.float32),
                                  tx.astype(jnp.float32), 4)], region)
        # global canvas coords of the window pixels
        yy = p_iota + ty.astype(jnp.float32)
        xx = q_iota + tx.astype(jnp.float32)
        inside = ((xx >= nx) & (xx < nx + rw * f)
                  & (yy >= ny) & (yy < ny + rh * f) & (f > 0))
        win = jax.lax.dynamic_slice(
            canvas, (ty, tx, jnp.int32(0)), (t, t, c))
        win = jnp.where(inside[..., None], val, win)
        canvas = jax.lax.dynamic_update_slice(canvas, win, (ty, tx,
                                                            jnp.int32(0)))
        return canvas, None

    canvas = jnp.zeros((out_h, out_w, c), jnp.float32)
    canvas, _ = jax.lax.scan(per_region, canvas, paint_regions)
    return canvas


def assemble_mosaic_tiled_batch(images: jnp.ndarray,
                                paint_rows: jnp.ndarray,
                                out_h: int, out_w: int,
                                tile: int = 256,
                                dtype=jnp.float32) -> jnp.ndarray:
    """Batched tiled painter: one flat scan over every image's rows.

    Same per-chip semantics as ``assemble_mosaic_tiled``, but takes the
    whole batch at once and is NOT vmapped: rows carry their image index
    and the scan walks all of them against a (B, out_h, out_w, C)
    canvas.  Because nothing is batched *per step*, ``lax.switch``
    executes only the taken upscale branch and padding rows short-cut
    through ``lax.cond`` — on TPU this is ~3x less HBM traffic than the
    vmapped per-image scan (where vectorized switch pays all branches
    for every row).

    Args:
        images: (B, H, W, C) source batch (uint8 or float).
        paint_rows: (N, 8) rows ``[x1, y1, w, h, nx, ny, f, img]`` from
            ``split_rows_for_tile`` + an image-index column; ``f == 0``
            rows are skipped.  Scaled chips must fit ``tile``.
        out_h, out_w: canvas size; tile % 4 == 0, canvas >= tile.
        dtype: canvas dtype.  The upscale taps always run in float32;
            ``bfloat16`` halves the canvas HBM traffic (window RMW +
            final write) at a sub-LSB pixel cost (<=0.5/255) — the right
            choice when the consumer is a bfloat16 model.

    Returns (B, out_h, out_w, C) ``dtype``.
    """
    t = int(tile)
    assert t % 4 == 0 and out_h >= t and out_w >= t
    bsz, c = int(images.shape[0]), int(images.shape[3])
    padded = jnp.pad(images, ((0, 0), (t, t + 4), (t, t + 4), (0, 0)))

    p_iota = jax.lax.broadcasted_iota(jnp.float32, (t, t), 0)
    q_iota = jax.lax.broadcasted_iota(jnp.float32, (t, t), 1)

    def window_val(row, img_i, ty, tx, factor: int):
        x1, y1 = row[0], row[1]
        nyw = row[5] - ty
        nxw = row[4] - tx
        f = float(factor)
        qy = jnp.floor(nyw / f)
        qx = jnp.floor(nxw / f)
        ry = (nyw - qy * f).astype(jnp.int32)
        rx = (nxw - qx * f).astype(jnp.int32)
        sy = (y1 - qy + t).astype(jnp.int32)
        sx = (x1 - qx + t).astype(jnp.int32)
        n = t // factor + 1
        crop = jax.lax.dynamic_slice(
            padded, (img_i, sy, sx, jnp.int32(0)),
            (1, n, n, c))[0].astype(jnp.float32)
        if factor == 1:
            up = crop
        elif factor == 2:
            up = _upscale2(crop)
        else:
            up = _upscale4(crop)
        up = jnp.pad(up, ((factor, 0), (factor, 0), (0, 0)))
        return jax.lax.dynamic_slice(
            up, (factor - ry, factor - rx, jnp.int32(0)), (t, t, c))

    def paint(canvas, row):
        rw, rh, nx, ny, f = row[2], row[3], row[4], row[5], row[6]
        img_i = row[7].astype(jnp.int32)
        ty = jnp.clip(ny, 0, out_h - t).astype(jnp.int32)
        tx = jnp.clip(nx, 0, out_w - t).astype(jnp.int32)
        fi = jnp.clip(f, 1.0, 4.0).astype(jnp.int32)
        branch = jnp.int32(0) + (fi >= 2) + (fi >= 4)
        tyf, txf = ty.astype(jnp.float32), tx.astype(jnp.float32)
        val = jax.lax.switch(
            branch,
            [lambda r: window_val(r, img_i, tyf, txf, 1),
             lambda r: window_val(r, img_i, tyf, txf, 2),
             lambda r: window_val(r, img_i, tyf, txf, 4)], row)
        yy = p_iota + tyf
        xx = q_iota + txf
        inside = ((xx >= nx) & (xx < nx + rw * f)
                  & (yy >= ny) & (yy < ny + rh * f))
        win = jax.lax.dynamic_slice(
            canvas, (img_i, ty, tx, jnp.int32(0)), (1, t, t, c))
        win = jnp.where(inside[..., None], val.astype(dtype),
                        win[0])[None]
        return jax.lax.dynamic_update_slice(
            canvas, win, (img_i, ty, tx, jnp.int32(0)))

    def per_row(canvas, row):
        return jax.lax.cond(row[6] > 0, lambda cv: paint(cv, row),
                            lambda cv: cv, canvas), None

    canvas = jnp.zeros((bsz, out_h, out_w, c), dtype)
    canvas, _ = jax.lax.scan(per_row, canvas, paint_rows)
    return canvas


def chip_boxes_from_regions(regions: jnp.ndarray) -> jnp.ndarray:
    """(R, 7) region rows -> (R, 4) xyxy chip rectangles in mosaic coords."""
    nx, ny = regions[:, 4], regions[:, 5]
    w, h, f = regions[:, 2], regions[:, 3], regions[:, 6]
    return jnp.stack([nx, ny, nx + w * f, ny + h * f], axis=-1)


def unmap_chip_detections(det_boxes: jnp.ndarray, det_valid: jnp.ndarray,
                          regions: jnp.ndarray,
                          iof_threshold: float = 0.9):
    """Map mosaic-space detections back to original-image coordinates.

    A detection transfers through a chip when IoF(det, chip) > threshold
    (normalized by min(det area, chip area) — exactly the driver's
    ``compute_iof``, ufpmp_det_eval.py:36-50, applied at :290); it is
    then un-scaled by the chip's factor and translated to the source crop
    origin.  A detection matching several chips is duplicated by each in
    the reference's nested loop — here every (det, chip) pair above the
    threshold yields an output slot, which is identical semantics.

    Args:
        det_boxes: (N, 4) xyxy in mosaic coords.
        det_valid: (N,) bool.
        regions: (R, 7) padded region rows.

    Returns:
        boxes: (N, R, 4) unmapped xyxy; valid: (N, R) bool transfer mask.
    """
    chips = chip_boxes_from_regions(regions)           # (R, 4)
    live = regions[:, 6] > 0                           # (R,)
    iof = pairwise_iof_min(det_boxes, chips)               # (N, R)
    take = (iof > iof_threshold) & det_valid[:, None] & live[None, :]

    f = jnp.maximum(regions[:, 6], 1.0)                # (R,)
    ox, oy = regions[:, 0], regions[:, 1]
    nx, ny = regions[:, 4], regions[:, 5]
    x1 = (det_boxes[:, None, 0] - nx) / f + ox
    y1 = (det_boxes[:, None, 1] - ny) / f + oy
    x2 = x1 + (det_boxes[:, None, 2] - det_boxes[:, None, 0]) / f
    y2 = y1 + (det_boxes[:, None, 3] - det_boxes[:, None, 1]) / f
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)       # (N, R, 4)
    return boxes, take


def unmap_chip_detections_argmax(det_boxes: jnp.ndarray,
                                 det_valid: jnp.ndarray,
                                 regions: jnp.ndarray,
                                 iof_threshold: float = 0.9):
    """Single-chip unmap: each detection transfers through its best-IoF
    chip only.

    Chips are disjoint rectangles in mosaic space, so for a detection
    no larger than the chips it touches, min-IoF > 0.9 can hold for at
    most one chip — the reference's duplicate-per-matching-chip loop
    (ufpmp_det_eval.py:282-296) emits at most one copy in practice.
    (A degenerate detection that fully covers several *smaller* chips
    min-gates through each in the reference and is duplicated; here it
    transfers through its best chip only.)
    Collapsing the (N, R) expansion to an argmax keeps the downstream NMS
    at N candidates instead of N*R (the N*R form made a 16k-candidate
    NMS out of 500 detections — a 1GB IoU matrix).

    Returns boxes (N, 4) in original coords and valid (N,) bool.
    """
    chips = chip_boxes_from_regions(regions)           # (R, 4)
    live = regions[:, 6] > 0
    iof = pairwise_iof_min(det_boxes, chips)               # (N, R)
    iof = jnp.where(live[None, :], iof, -1.0)
    best = jnp.argmax(iof, axis=1)                     # (N,)
    best_iof = jnp.max(iof, axis=1)
    valid = (best_iof > iof_threshold) & det_valid

    r = regions[best]                                  # (N, 7)
    f = jnp.maximum(r[:, 6], 1.0)
    x1 = (det_boxes[:, 0] - r[:, 4]) / f + r[:, 0]
    y1 = (det_boxes[:, 1] - r[:, 5]) / f + r[:, 1]
    x2 = x1 + (det_boxes[:, 2] - det_boxes[:, 0]) / f
    y2 = y1 + (det_boxes[:, 3] - det_boxes[:, 1]) / f
    return jnp.stack([x1, y1, x2, y2], axis=-1), valid
