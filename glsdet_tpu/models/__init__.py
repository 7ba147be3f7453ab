"""Flax model zoo: backbones, necks, heads, detectors."""

from glsdet_tpu.models.csp_darknet import CSPDarknet, PHI_TABLE
from glsdet_tpu.models.detectors import GFLDet, MPDet, YOLOXDetector
from glsdet_tpu.models.fpn import FPN
from glsdet_tpu.models.gfl_head import GFLHead
from glsdet_tpu.models.layers import (
    Bottleneck,
    ConvNormAct,
    CSPLayer,
    DWConvBlock,
    Focus,
    Scale,
    SPPBottleneck,
    upsample2x,
)
from glsdet_tpu.models.mp_head import (
    MPHead,
    VISDRONE_PROXIES,
    proxy_class_matrix,
    proxy_scores,
)
from glsdet_tpu.models.pafpn import YOLOXPAFPN
from glsdet_tpu.models.resnet import ResNet
from glsdet_tpu.models.yolox_head import (
    YOLOXHead,
    decode_boxes,
    flatten_head_outputs,
    level_priors,
)

__all__ = [
    "CSPDarknet",
    "PHI_TABLE",
    "GFLDet",
    "MPDet",
    "YOLOXDetector",
    "FPN",
    "GFLHead",
    "Bottleneck",
    "ConvNormAct",
    "CSPLayer",
    "DWConvBlock",
    "Focus",
    "Scale",
    "SPPBottleneck",
    "upsample2x",
    "MPHead",
    "VISDRONE_PROXIES",
    "proxy_class_matrix",
    "proxy_scores",
    "YOLOXPAFPN",
    "ResNet",
    "YOLOXHead",
    "decode_boxes",
    "flatten_head_outputs",
    "level_priors",
]
