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
    """YOLOX coarse detector. ``phi`` selects width/depth.

    ``variant`` enables the yolox-drone experimental attention modules
    (SURVEY.md §2.3) as config-selectable plugins:
      - "lsk":  LSK attention after each backbone stage (darknet_lsk.py)
      - "se":   SEBlock on each neck output
      - "mscam": MS-CAM gate on each neck output
      - "nonlocal": patch non-local on each neck output
      - "evc":  EVC (CFP) block on the deepest backbone feature
      - "fg_fpn": FeatureGroupFPN re-mix after the neck
    """

    num_classes: int = 10
    phi: str = "s"
    variant: str = ""
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        from glsdet_tpu.models.variants.attention import (
            MSCAM, PatchNonLocal, SEBlock)
        from glsdet_tpu.models.variants.cfp import EVCBlock
        from glsdet_tpu.models.variants.lsk import LSKAttention
        from glsdet_tpu.models.variants.necks import FeatureGroupFPN

        depth_mult, width_mult, depthwise = PHI_TABLE[self.phi]
        chans = scaled_channels(width_mult)
        feats = CSPDarknet(
            depth_mult=depth_mult, width_mult=width_mult,
            depthwise=depthwise, dtype=self.dtype,
            axis_name=self.axis_name, name="backbone",
        )(images, train=train)
        if self.variant == "lsk":
            feats = tuple(
                LSKAttention(dtype=self.dtype, name=f"lsk{i}")(f)
                for i, f in enumerate(feats))
        elif self.variant == "evc":
            feats = (*feats[:-1], EVCBlock(
                dtype=self.dtype, axis_name=self.axis_name,
                name="evc")(feats[-1], train=train))
        feats = YOLOXPAFPN(
            channels=chans[2:5],
            num_csp_blocks=scaled_depths(depth_mult)[0],
            depthwise=depthwise, dtype=self.dtype,
            axis_name=self.axis_name, name="neck",
        )(feats, train=train)
        if self.variant == "se":
            feats = tuple(
                SEBlock(dtype=self.dtype, name=f"se{i}")(f)
                for i, f in enumerate(feats))
        elif self.variant == "mscam":
            feats = tuple(
                MSCAM(dtype=self.dtype, axis_name=self.axis_name,
                      name=f"mscam{i}")(f, train=train)
                for i, f in enumerate(feats))
        elif self.variant == "nonlocal":
            feats = tuple(
                PatchNonLocal(patch=4, dtype=self.dtype,
                              name=f"nl{i}")(f)
                for i, f in enumerate(feats))
        elif self.variant == "fg_fpn":
            feats = FeatureGroupFPN(
                dtype=self.dtype, axis_name=self.axis_name,
                name="fg_fpn")(feats, train=train)
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
    remat: bool = False  # checkpoint backbone blocks + head towers

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        feats = ResNet(depth=self.depth, dtype=self.dtype,
                       axis_name=self.axis_name, remat=self.remat,
                       name="backbone")(images, train=train)
        feats = FPN(out_channels=self.feat_channels, num_outs=5,
                    dtype=self.dtype, name="neck")(feats, train=train)
        return GFLHead(num_classes=self.num_classes,
                       feat_channels=self.feat_channels,
                       dtype=self.dtype, remat=self.remat,
                       name="head")(feats, train=train)


class MPDet(nn.Module):
    """MP-Det: ResNet-50 + FPN + MPHead (mp_det_res50 config)."""

    num_classes: int = 10
    depth: int = 50
    feat_channels: int = 256
    proxies_list: Sequence[int] = VISDRONE_PROXIES
    gamma: float = 10.0
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    remat: bool = False  # checkpoint backbone blocks + head towers: the
    # backward at detection resolutions is bound by saved-activation HBM
    # traffic, not FLOPs — remat cuts train-step time ~25% at 1024^2 and
    # lets the batch grow (see docs/ARCHITECTURE.md)

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        feats = ResNet(depth=self.depth, dtype=self.dtype,
                       axis_name=self.axis_name, remat=self.remat,
                       name="backbone")(images, train=train)
        feats = FPN(out_channels=self.feat_channels, num_outs=5,
                    dtype=self.dtype, name="neck")(feats, train=train)
        return MPHead(num_classes=self.num_classes,
                      feat_channels=self.feat_channels,
                      proxies_list=tuple(self.proxies_list),
                      gamma=self.gamma, dtype=self.dtype,
                      remat=self.remat,
                      name="head")(feats, train=train)
