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
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
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
