"""Detector assemblies: backbone -> neck -> head.

The reference's ``SingleStageDetector`` contract
(yolox-ufp/mmdet/models/detectors/single_stage.py:12 — ``extract_feat``,
``forward_train``, ``simple_test``) collapses here to a single flax module
whose ``__call__`` returns raw head outputs; training losses and test-time
decode+NMS are pure functions applied on top, so the same forward serves
both paths and jits once.

- ``YOLOXDetector`` ~ the missing ``class YOLOX`` + yolox-drone ``YoloBody``
  (models/base/yolox.py:237): CSPDarknet -> PAFPN -> decoupled head.
- ``MPDet`` ~ detectors/mpdet.py:7: ResNet-50 -> FPN(5 lvls) -> MPHead.
- ``GFLDet`` — plain GFL single-stage (the MP-Det ablation baseline).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.csp_darknet import CSPDarknet, PHI_TABLE, scaled_channels, scaled_depths
from glsdet_tpu.models.fpn import FPN
from glsdet_tpu.models.gfl_head import GFLHead
from glsdet_tpu.models.mp_head import MPHead, VISDRONE_PROXIES
from glsdet_tpu.models.pafpn import YOLOXPAFPN
from glsdet_tpu.models.resnet import ResNet
from glsdet_tpu.models.yolox_head import YOLOXHead

YOLOX_STRIDES = (8, 16, 32)
GFL_STRIDES = (8, 16, 32, 64, 128)


class YOLOXDetector(nn.Module):
    """YOLOX coarse detector. ``phi`` selects width/depth."""

    num_classes: int = 10
    phi: str = "s"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        depth_mult, width_mult, depthwise = PHI_TABLE[self.phi]
        chans = scaled_channels(width_mult)
        feats = CSPDarknet(
            depth_mult=depth_mult, width_mult=width_mult,
            depthwise=depthwise, dtype=self.dtype,
            axis_name=self.axis_name, name="backbone",
        )(images, train=train)
        feats = YOLOXPAFPN(
            channels=chans[2:5],
            num_csp_blocks=scaled_depths(depth_mult)[0],
            depthwise=depthwise, dtype=self.dtype,
            axis_name=self.axis_name, name="neck",
        )(feats, train=train)
        return YOLOXHead(
            num_classes=self.num_classes,
            feat_channels=chans[2],
            depthwise=depthwise, dtype=self.dtype,
            axis_name=self.axis_name, name="head",
        )(feats, train=train)


class GFLDet(nn.Module):
    """ResNet + FPN + GFL head (stock GFL single-stage)."""

    num_classes: int = 10
    depth: int = 50
    feat_channels: int = 256
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        feats = ResNet(depth=self.depth, dtype=self.dtype,
                       axis_name=self.axis_name, name="backbone")(
            images, train=train)
        feats = FPN(out_channels=self.feat_channels, num_outs=5,
                    dtype=self.dtype, name="neck")(feats, train=train)
        return GFLHead(num_classes=self.num_classes,
                       feat_channels=self.feat_channels,
                       dtype=self.dtype, name="head")(feats, train=train)


class MPDet(nn.Module):
    """MP-Det: ResNet-50 + FPN + MPHead (mp_det_res50 config)."""

    num_classes: int = 10
    depth: int = 50
    feat_channels: int = 256
    proxies_list: Sequence[int] = VISDRONE_PROXIES
    gamma: float = 10.0
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        feats = ResNet(depth=self.depth, dtype=self.dtype,
                       axis_name=self.axis_name, name="backbone")(
            images, train=train)
        feats = FPN(out_channels=self.feat_channels, num_outs=5,
                    dtype=self.dtype, name="neck")(feats, train=train)
        return MPHead(num_classes=self.num_classes,
                      feat_channels=self.feat_channels,
                      proxies_list=tuple(self.proxies_list),
                      gamma=self.gamma, dtype=self.dtype,
                      name="head")(feats, train=train)
