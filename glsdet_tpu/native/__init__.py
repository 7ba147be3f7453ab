"""Native (C++) host-side components, loaded via ctypes.

The reference shipped no native code of its own but leaned on external
CUDA/C++ (mmcv NMS, torchvision ops — SURVEY.md §0); here the device-side
equivalents are XLA programs, and the host-side hot loop (UFP packing,
run per image during dataset builds and two-stage eval) has this C++
implementation.  The library auto-builds with g++ on first use and falls
back to the pure-python implementation when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "packing.cpp")
_SO = os.path.join(_DIR, "libufp.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 _SRC, "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.ufp_pack.restype = ctypes.c_int
        lib.ufp_pack.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        if hasattr(lib, "ufp_pack_fit"):
            lib.ufp_pack_fit.restype = ctypes.c_int
            lib.ufp_pack_fit.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
        if hasattr(lib, "ufp_tile_tables"):
            lib.ufp_tile_tables.restype = ctypes.c_int
            lib.ufp_tile_tables.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int),
            ]
        return lib
    except (subprocess.CalledProcessError, OSError):
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                _lib = _build()
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def unified_foreground_packing_native(
    boxes: np.ndarray, scale: float, input_shape: Sequence[float],
    width_min: float = 300.0, width_max: float = 2666.0,
):
    """C++ UFP with the python API: returns (list[Region], w, h).

    Falls back to the python implementation if the library is missing.
    """
    from glsdet_tpu.ufp.packing import Region, unified_foreground_packing

    lib = get_lib()
    boxes = np.ascontiguousarray(
        np.asarray(boxes, np.float64).reshape(-1, 4))
    if lib is None:
        return unified_foreground_packing(boxes, scale, input_shape)
    n = boxes.shape[0]
    if n == 0:
        return [], 0.0, 0.0
    out = np.zeros((n, 7), np.float64)
    wh = np.zeros((2,), np.float64)
    r = lib.ufp_pack(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        float(scale), float(input_shape[0]), float(input_shape[1]),
        float(width_min), float(width_max),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        wh.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if r < 0:
        return unified_foreground_packing(boxes, scale, input_shape)
    regions = [
        Region(x1=row[0], y1=row[1], w=row[2], h=row[3],
               new_x=row[4], new_y=row[5], scale_factor=int(row[6]))
        for row in out[:r]
    ]
    return regions, float(wh[0]), float(wh[1])


def unified_foreground_packing_rows(
    boxes: np.ndarray, scale: float, input_shape: Sequence[float],
    max_regions: int,
    width_min: float = 300.0, width_max: float = 2666.0,
) -> Tuple[np.ndarray, int, float, float]:
    """Array fast path for the serving pipeline: UFP packing straight to
    the padded, floored (max_regions, 7) float32 row form that
    ``ufp.assembly.regions_to_array`` produces — skipping the per-region
    ``Region`` object construction of the list API (hundreds of dataclass
    allocations per dense frame on the host's hot path).

    Returns ``(rows, n_regions, mosaic_w, mosaic_h)``; rows beyond
    ``max_regions`` are truncated exactly like ``regions_to_array``.
    Falls back to the python implementation when the library is missing.
    """
    lib = get_lib()
    boxes = np.ascontiguousarray(
        np.asarray(boxes, np.float64).reshape(-1, 4))
    n = boxes.shape[0]
    if lib is None:
        from glsdet_tpu.ufp.assembly import regions_to_array
        from glsdet_tpu.ufp.packing import unified_foreground_packing
        regions, mw, mh = unified_foreground_packing(
            boxes, scale, input_shape)
        return (regions_to_array(regions, max_regions), len(regions),
                mw, mh)
    if n == 0:
        return np.zeros((max_regions, 7), np.float32), 0, 0.0, 0.0
    out = np.zeros((n, 7), np.float64)
    wh = np.zeros((2,), np.float64)
    r = lib.ufp_pack(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        float(scale), float(input_shape[0]), float(input_shape[1]),
        float(width_min), float(width_max),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        wh.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if r < 0:
        raise RuntimeError("ufp_pack failed")
    rows = np.zeros((max_regions, 7), np.float32)
    k = min(r, max_regions)
    rows[:k] = np.floor(out[:k])
    return rows, r, float(wh[0]), float(wh[1])


def unified_foreground_packing_rows_fit(
    boxes: np.ndarray, scale: float, input_shape: Sequence[float],
    max_regions: int, buckets: Sequence[float],
) -> Tuple[np.ndarray, int, float, float, Optional[int]]:
    """Bucket-fit twin of :func:`unified_foreground_packing_rows`
    (packing.py pack_regions_fit semantics): packs directly into the
    serving canvas ladder and returns the chosen bucket.

    Returns ``(rows, n_regions, mosaic_w, mosaic_h, bucket)``;
    ``bucket`` is None when no ladder entry fit (reference-pack layout,
    caller buckets it as usual).  Falls back to the python
    implementation when the library is missing or stale.
    """
    lib = get_lib()
    boxes = np.ascontiguousarray(
        np.asarray(boxes, np.float64).reshape(-1, 4))
    n = boxes.shape[0]
    if lib is None or not hasattr(lib, "ufp_pack_fit"):
        from glsdet_tpu.ufp.assembly import regions_to_array
        from glsdet_tpu.ufp.packing import unified_foreground_packing_fit
        regions, mw, mh, bucket = unified_foreground_packing_fit(
            boxes, scale, input_shape, buckets)
        return (regions_to_array(regions, max_regions), len(regions),
                mw, mh, bucket)
    if n == 0:
        return np.zeros((max_regions, 7), np.float32), 0, 0.0, 0.0, None
    bkt = np.ascontiguousarray(np.asarray(buckets, np.float64))
    out = np.zeros((n, 7), np.float64)
    wh = np.zeros((2,), np.float64)
    chosen = np.zeros((1,), np.float64)
    r = lib.ufp_pack_fit(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        float(scale), float(input_shape[0]), float(input_shape[1]),
        bkt.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(bkt),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        wh.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        chosen.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if r < 0:
        raise RuntimeError("ufp_pack_fit failed")
    rows = np.zeros((max_regions, 7), np.float32)
    k = min(r, max_regions)
    rows[:k] = np.floor(out[:k])
    bucket = int(chosen[0]) if chosen[0] > 0 else None
    return rows, r, float(wh[0]), float(wh[1]), bucket


def build_tile_tables_native(rows: np.ndarray, out_h: int, out_w: int,
                             tile: int, cap: int
                             ) -> Optional[Tuple[np.ndarray, bool]]:
    """C++ twin of ``ufp.pallas_paint.build_tile_tables`` (same table
    layout and overflow flag).  Returns None when the library is missing
    so the caller can use the python implementation."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "ufp_tile_tables"):
        return None
    rows = np.ascontiguousarray(np.asarray(rows, np.float32))
    nty, ntx = out_h // tile, out_w // tile
    table = np.zeros((nty, ntx, cap, 8), np.int32)
    ovf = lib.ufp_tile_tables(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows.shape[0], out_h, out_w, tile, cap,
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return table, bool(ovf)
