"""Utilities: profiling, logging, env collection, visualization."""

from glsdet_tpu.utils.observe import (
    LossHistory,
    collect_env,
    get_root_logger,
    profile_time,
)
from glsdet_tpu.utils.visualize import draw_detections

__all__ = [
    "LossHistory",
    "collect_env",
    "get_root_logger",
    "profile_time",
    "draw_detections",
]
