"""Experimental attention/fusion model variants (yolox-drone zoo)."""

from glsdet_tpu.models.variants.attention import (
    ConAugModule,
    MSCAM,
    NonLocalBlock,
    PatchConvNonLocal,
    PatchConvNonLocal44,
    PatchConvNonLocalAdapt,
    PatchNonLocal,
    PatchNonLocalQuad,
    SE,
    SEAttention,
    SEBlock,
    SEBlockFPN,
    SpatialAttention,
    VANAttention,
)
from glsdet_tpu.models.variants.batchformer import BatchFormer
from glsdet_tpu.models.variants.blocks import IdentityConv, ReverseFocus
from glsdet_tpu.models.variants.cfp import EVCBlock, LightMLPBlock, LVCBlock
from glsdet_tpu.models.variants.dyhead import (
    DeformConv3x3,
    DyConv,
    DyHead,
    DyReLU,
    bilinear_gather,
)
from glsdet_tpu.models.variants.ffa import FFA, pixel_shuffle_2x
from glsdet_tpu.models.variants.ffa_model import FFA_STRIDES, FFAYoloBody
from glsdet_tpu.models.variants.lsk import LSKAttention, LSKBlock
from glsdet_tpu.models.variants.necks import (
    FeatureGroup,
    FeatureGroupFPN,
    cross_scale_concat,
)

__all__ = [
    "ConAugModule",
    "MSCAM",
    "NonLocalBlock",
    "PatchConvNonLocal",
    "PatchConvNonLocal44",
    "PatchConvNonLocalAdapt",
    "PatchNonLocal",
    "PatchNonLocalQuad",
    "SE",
    "SEAttention",
    "SEBlock",
    "SEBlockFPN",
    "SpatialAttention",
    "VANAttention",
    "BatchFormer",
    "IdentityConv",
    "ReverseFocus",
    "EVCBlock",
    "LightMLPBlock",
    "LVCBlock",
    "DeformConv3x3",
    "DyConv",
    "DyHead",
    "DyReLU",
    "bilinear_gather",
    "FFA",
    "pixel_shuffle_2x",
    "FFA_STRIDES",
    "FFAYoloBody",
    "LSKAttention",
    "LSKBlock",
    "FeatureGroup",
    "FeatureGroupFPN",
    "cross_scale_concat",
]
