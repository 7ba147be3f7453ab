"""Unified Foreground Packing (UFP).

Re-derivation of the GLSDet packing stage (behavior studied from
``yolox-ufp/mmdet/core/ufp/unified_foreground_packing.py`` and ``spp.py``):

1. expand each coarse detection about its center by ``scale`` and clip,
2. greedily merge overlapping expanded boxes into foreground regions —
   merge whenever the union bbox's area is smaller than the sum of the two
   areas (i.e. the boxes overlap enough that packing them together is
   cheaper), accumulating per-region mean object area,
3. assign an integer upscale factor per region from the mean contained
   object area (<32^2 -> 4x, <96^2 -> 2x, else 1x) — small objects get
   super-resolved in the mosaic,
4. binary-search the strip width in [300, 2666] for a near-square mosaic
   and strip-pack the scaled regions with the PH guillotine heuristic
   (no rotation).

This runs on the host: it is inherently sequential, operates on at most a
few hundred boxes, and costs microseconds — the expensive part (mosaic
pixel assembly) happens on device in ``glsdet_tpu.ufp.assembly``.  A C++
implementation with identical semantics lives in ``glsdet_tpu/native``
for zero-Python-overhead dataset builds.

Unlike the reference, region identity is tracked by index through the
packing instead of re-matching rectangles by (w, h) afterwards.  The
reference's re-match loop (unified_foreground_packing.py:163-177) lacks a
break, so duplicate-size regions all collapse onto the first matching
rectangle's slot and overlap in the mosaic; index tracking keeps each
region in its own strip-pack slot.  For distinct sizes (the generic
case) layouts are bit-identical — verified directly against the
reference implementation in tests/test_reference_parity.py.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class Region:
    """One packed foreground region.

    Mirrors the reference's per-region record
    ``[x1, y1, w, h, new_x, new_y, scale_factor]``: crop ``(w, h)`` at
    ``(x1, y1)`` from the source image, resize by ``scale_factor`` and
    paste at ``(new_x, new_y)`` in the mosaic.
    """

    x1: float
    y1: float
    w: float
    h: float
    new_x: float
    new_y: float
    scale_factor: int

    def as_row(self) -> List[float]:
        return [self.x1, self.y1, self.w, self.h,
                self.new_x, self.new_y, self.scale_factor]


def scale_boxes(boxes: np.ndarray, scale: float,
                image_shape: Sequence[float]) -> np.ndarray:
    """Expand xyxy boxes about their centers; clip to ``[0, dim-1]``.

    ``image_shape`` is (width, height), matching the reference call
    ``UnifiedForegroundPacking(..., input_shape=[width, height])``.
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    w_img, h_img = image_shape[0], image_shape[1]
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    hw = (boxes[:, 2] - boxes[:, 0]) * 0.5 * scale
    hh = (boxes[:, 3] - boxes[:, 1]) * 0.5 * scale
    out = np.empty_like(boxes)
    out[:, 0] = np.clip(cx - hw, 0, w_img - 1)
    out[:, 1] = np.clip(cy - hh, 0, h_img - 1)
    out[:, 2] = np.clip(cx + hw, 0, w_img - 1)
    out[:, 3] = np.clip(cy + hh, 0, h_img - 1)
    return out


def foreground_regions(boxes: np.ndarray, scaled: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy merge of expanded boxes into foreground regions.

    Merge criterion: union-bbox area < sum of the two areas.  The merged
    region accumulates the (legacy ``+1``) areas of the original boxes it
    absorbed; the mean absorbed-object area selects the upscale factor.

    Returns (regions (R, 4) xyxy, scale_factor (R,) int in {1, 2, 4}).
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    scaled = np.array(scaled, dtype=np.float64, copy=True)
    n = boxes.shape[0]
    if n == 0:
        return np.zeros((0, 4)), np.zeros((0,), dtype=np.int64)

    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    area_sum = areas.copy()
    count = np.ones(n)
    alive = np.ones(n, dtype=bool)

    for i in range(n):
        if not alive[i]:
            continue
        cur = scaled[i].copy()
        cur_area = (cur[2] - cur[0]) * (cur[3] - cur[1])
        for j in range(n):
            if j == i or not alive[j]:
                continue
            other = scaled[j]
            other_area = (other[2] - other[0]) * (other[3] - other[1])
            ux1, uy1 = min(cur[0], other[0]), min(cur[1], other[1])
            ux2, uy2 = max(cur[2], other[2]), max(cur[3], other[3])
            union_area = (ux2 - ux1) * (uy2 - uy1)
            if union_area < cur_area + other_area:
                cur = np.array([ux1, uy1, ux2, uy2])
                cur_area = union_area
                alive[j] = False
                area_sum[i] += area_sum[j]
                count[i] += count[j]
        scaled[i] = cur

    mean_area = area_sum / count
    factor = np.where(mean_area < 32 * 32, 4,
                      np.where(mean_area < 96 * 96, 2, 1))
    return scaled[alive], factor[alive].astype(np.int64)


# ---------------------------------------------------------------------------
# PH strip-packing heuristic (guillotine, no rotation — "OG" variant).
# ---------------------------------------------------------------------------

_PLACE_EXACT = 1          # fills the hole exactly
_PLACE_FULL_WIDTH = 2     # same width, shorter
_PLACE_FULL_HEIGHT = 3    # same height, narrower
_PLACE_FITS = 4           # strictly smaller
_NO_FIT = 5


def _best_fit(hole_w: float, hole_h: float, sizes, pending: List[int]):
    """Pick the highest-priority pending rectangle for a (w, h) hole.

    Priorities (ties broken by pending order, i.e. descending width):
    exact fill > full-width > full-height > fits-inside.
    """
    priority = _NO_FIT
    best = -1
    for idx in pending:
        rw, rh = sizes[idx]
        if priority > _PLACE_EXACT and rw == hole_w and rh == hole_h:
            return _PLACE_EXACT, idx
        if priority > _PLACE_FULL_WIDTH and rw == hole_w and rh < hole_h:
            priority, best = _PLACE_FULL_WIDTH, idx
        elif priority > _PLACE_FULL_HEIGHT and rw < hole_w and rh == hole_h:
            priority, best = _PLACE_FULL_HEIGHT, idx
        elif priority > _PLACE_FITS and rw < hole_w and rh < hole_h:
            priority, best = _PLACE_FITS, idx
    return priority, best


def _fill_hole(x: float, y: float, w: float, h: float, sizes,
               pending: List[int], placed):
    """Recursively pack pending rectangles into the leftover hole at
    (x, y) of size (w, h), splitting guillotine-style."""
    priority, best = _best_fit(w, h, sizes, pending)
    if priority >= _NO_FIT or best < 0:
        return
    rw, rh = sizes[best]
    placed[best] = (x, y)
    pending.remove(best)
    if priority == _PLACE_EXACT:
        return
    if priority == _PLACE_FULL_WIDTH:
        _fill_hole(x, y + rh, w, h - rh, sizes, pending, placed)
    elif priority == _PLACE_FULL_HEIGHT:
        _fill_hole(x + rw, y, w - rw, h, sizes, pending, placed)
    else:  # _PLACE_FITS: split the L-shaped leftover along the smaller of
        # the two candidate cuts, mirroring the reference's min-dimension
        # look-ahead (spp.py:149-167).
        min_side = min((min(sizes[i]) for i in pending), default=np.inf)
        if w - rw < min_side:
            _fill_hole(x, y + rh, w, h - rh, sizes, pending, placed)
        elif h - rh < min_side:
            _fill_hole(x + rw, y, w - rw, h, sizes, pending, placed)
        elif rw < min_side:
            _fill_hole(x + rw, y, w - rw, rh, sizes, pending, placed)
            _fill_hole(x, y + rh, w, h - rh, sizes, pending, placed)
        else:
            _fill_hole(x, y + rh, rw, h - rh, sizes, pending, placed)
            _fill_hole(x + rw, y, w - rw, h, sizes, pending, placed)


_SORT_KEYS = {
    "width": lambda s: -s[0],
    "height": lambda s: -s[1],
    "area": lambda s: -(s[0] * s[1]),
    "perim": lambda s: -(s[0] + s[1]),
}


def strip_pack(width: float, sizes: Sequence[Sequence[float]],
               sort_by: str = "width"):
    """PH strip packing, no rotation, guillotine cuts.

    Args:
        width: strip width.
        sizes: [(w, h), ...] rectangle sizes.
        sort_by: 'width' | 'height' | 'area' | 'perim' — descending
            placement order (ties broken by index, stable).

    Returns:
        (total_height, positions) where positions[i] = (x, y) bottom-left
        placement of sizes[i].
    """
    key = _SORT_KEYS[sort_by]
    n = len(sizes)
    placed = [None] * n
    pending = sorted(range(n), key=lambda i: key(sizes[i]))
    strip_h = 0.0
    while pending:
        idx = pending.pop(0)
        rw, rh = sizes[idx]
        placed[idx] = (0.0, strip_h)
        # The newly opened shelf leaves a hole right of the seed rectangle.
        _fill_hole(rw, strip_h, width - rw, rh, sizes, pending, placed)
        strip_h += rh
    return strip_h, placed


def pack_regions(regions: np.ndarray, factors: np.ndarray,
                 width_min: float = 300.0, width_max: float = 2666.0
                 ) -> Tuple[List[Region], float, float]:
    """Binary-search the strip width for a near-square mosaic, then pack.

    The search halves on ``height > width`` exactly like the reference
    (unified_foreground_packing.py:150-156), including the float
    ``(lo+hi)/2`` midpoints and ``+-1`` bound updates; the final layout is
    produced by the last evaluated width.

    Returns (list of Region, mosaic_w, mosaic_h).
    """
    sizes = [((r[2] - r[0]) * f, (r[3] - r[1]) * f)
             for r, f in zip(regions, factors)]
    if not sizes:
        return [], 0.0, 0.0

    lo, hi = width_min, width_max
    height, placed = strip_pack(hi, sizes, sort_by="height")
    while lo <= hi:
        mid = (lo + hi) / 2
        height, placed = strip_pack(mid, sizes, sort_by="height")
        if height > mid:
            lo = mid + 1
        else:
            hi = mid - 1

    out: List[Region] = []
    mosaic_w = mosaic_h = 0.0
    for i, ((rw, rh), (px, py)) in enumerate(zip(sizes, placed)):
        mosaic_w = max(mosaic_w, px + rw)
        mosaic_h = max(mosaic_h, py + rh)
        out.append(Region(
            x1=float(regions[i][0]), y1=float(regions[i][1]),
            w=float(regions[i][2] - regions[i][0]),
            h=float(regions[i][3] - regions[i][1]),
            new_x=float(px), new_y=float(py),
            scale_factor=int(factors[i])))
    return out, mosaic_w, mosaic_h


# Sort orders tried per bucket by the bucket-fit packer, cheapest-win
# first.  "height" is the reference's order (pack_regions); the others
# rescue near-full layouts where one order fragments the strip.
FIT_SORT_ORDERS = ("height", "area", "perim", "width")


def pack_regions_fit(regions: np.ndarray, factors: np.ndarray,
                     buckets: Sequence[float],
                     sort_orders: Sequence[str] = FIT_SORT_ORDERS,
                     ) -> Tuple[List[Region], float, float, Optional[int]]:
    """Bucket-fit strip packing: pack INTO the serving canvas ladder.

    The reference's width binary search (pack_regions) targets a
    near-square mosaic, but the serving pipeline then rounds the mosaic
    up to a square model-canvas bucket whose area sets the dominant
    MP-Det forward cost.  Packing directly at each candidate bucket
    width (ascending; several placement orders per bucket) finds the
    smallest bucket the regions actually fit, instead of the smallest
    bucket covering the square-ish layout — on dense VisDrone-like
    loads this moves most frames one bucket down (1152 -> 1024, 0.79x
    the stage-2 pixels).

    Pure layout change: region crops/factors are identical to the
    reference path; only (new_x, new_y) placements differ.

    Returns (regions, mosaic_w, mosaic_h, bucket) — ``bucket`` is the
    chosen ladder entry, or None when nothing fit (the layout then
    comes from the reference binary search and the caller buckets it
    as usual).
    """
    sizes = [((r[2] - r[0]) * f, (r[3] - r[1]) * f)
             for r, f in zip(regions, factors)]
    if not sizes:
        return [], 0.0, 0.0, None

    def _emit(placed):
        out: List[Region] = []
        mw = mh = 0.0
        for i, ((rw, rh), (px, py)) in enumerate(zip(sizes, placed)):
            mw = max(mw, px + rw)
            mh = max(mh, py + rh)
            out.append(Region(
                x1=float(regions[i][0]), y1=float(regions[i][1]),
                w=float(regions[i][2] - regions[i][0]),
                h=float(regions[i][3] - regions[i][1]),
                new_x=float(px), new_y=float(py),
                scale_factor=int(factors[i])))
        return out, mw, mh

    for b in buckets:
        for order in sort_orders:
            height, placed = strip_pack(float(b), sizes, sort_by=order)
            if height > b:
                continue
            width = max(p[0] + s[0] for p, s in zip(placed, sizes))
            if width <= b:
                out, mw, mh = _emit(placed)
                return out, mw, mh, int(b)

    out, mw, mh = pack_regions(regions, factors)
    return out, mw, mh, None


def unified_foreground_packing_fit(
        boxes: np.ndarray, scale: float, input_shape: Sequence[float],
        buckets: Sequence[float],
) -> Tuple[List[Region], float, float, Optional[int]]:
    """Full UFP with bucket-fit packing (see pack_regions_fit)."""
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    if boxes.shape[0] == 0:
        return [], 0.0, 0.0, None
    scaled = scale_boxes(boxes, scale, input_shape)
    regions, factors = foreground_regions(boxes, scaled)
    return pack_regions_fit(regions, factors, buckets)


def unified_foreground_packing(boxes: np.ndarray, scale: float,
                               input_shape: Sequence[float]
                               ) -> Tuple[List[Region], float, float]:
    """Full UFP: expand -> merge -> scale-factor -> pack.

    Args:
        boxes: (N, 4) xyxy coarse detections.
        scale: box expansion factor (1.5 at eval, 2.0 for dataset build).
        input_shape: (width, height) of the source image.

    Returns:
        (regions, mosaic_w, mosaic_h).
    """
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    if boxes.shape[0] == 0:
        return [], 0.0, 0.0
    scaled = scale_boxes(boxes, scale, input_shape)
    regions, factors = foreground_regions(boxes, scaled)
    return pack_regions(regions, factors)
