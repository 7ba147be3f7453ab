"""Evaluation: postprocess/NMS, COCO metrics, fusion, two-stage driver."""

from glsdet_tpu.eval.coco_eval import CocoEvaluator, CocoEvalResult, summarize
from glsdet_tpu.eval.fusion import fuse_detections, fuse_detections_batch
from glsdet_tpu.eval.postprocess import (
    gfl_postprocess,
    rescale_detections,
    yolox_postprocess,
)

__all__ = [
    "CocoEvaluator",
    "CocoEvalResult",
    "summarize",
    "fuse_detections",
    "fuse_detections_batch",
    "gfl_postprocess",
    "rescale_detections",
    "yolox_postprocess",
]
