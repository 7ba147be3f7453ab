"""Data layer: converters, COCO reader, augmentations, loaders."""

from glsdet_tpu.data.coco import (
    CocoDataset,
    CocoRecord,
    IMAGENET_MEAN,
    IMAGENET_STD,
    make_batch,
    normalize,
    pad_gts,
)
from glsdet_tpu.data.uavdt import UAVDT_CLASSES, UAVDT_TEST_SEQS, uavdt_to_coco
from glsdet_tpu.data.visdrone import (
    VISDRONE_CLASSES,
    parse_visdrone_txt,
    visdrone_to_coco,
)

__all__ = [
    "CocoDataset",
    "CocoRecord",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "make_batch",
    "normalize",
    "pad_gts",
    "UAVDT_CLASSES",
    "UAVDT_TEST_SEQS",
    "uavdt_to_coco",
    "VISDRONE_CLASSES",
    "parse_visdrone_txt",
    "visdrone_to_coco",
]
