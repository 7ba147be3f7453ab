from glsdet_tpu.ops.boxes import (
    bbox_area,
    bbox_overlaps,
    box_cxcywh_to_xyxy,
    box_xywh_to_xyxy,
    box_xyxy_to_cxcywh,
    box_xyxy_to_xywh,
    giou,
    iof,
    iou,
    pairwise_iof,
    pairwise_iof_min,
    pairwise_iou,
)
# NB: the bare `nms`/`sinkhorn` functions are NOT re-exported here because
# they would shadow their submodules; import them from the submodule.
from glsdet_tpu.ops.nms import batched_nms, soft_nms
from glsdet_tpu.ops.kmeans import cosine_kmeans
from glsdet_tpu.ops.image import letterbox, normalize_image, resize_keep_ratio
from glsdet_tpu.ops.integral import integral_decode

__all__ = [
    "bbox_area",
    "bbox_overlaps",
    "box_cxcywh_to_xyxy",
    "box_xywh_to_xyxy",
    "box_xyxy_to_cxcywh",
    "box_xyxy_to_xywh",
    "giou",
    "iof",
    "iou",
    "pairwise_iof",
    "pairwise_iof_min",
    "pairwise_iou",
    "batched_nms",
    "soft_nms",
    "cosine_kmeans",
    "letterbox",
    "normalize_image",
    "resize_keep_ratio",
    "integral_decode",
]
