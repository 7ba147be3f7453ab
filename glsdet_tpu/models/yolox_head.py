"""YOLOX decoupled head + grid decode, flax/NHWC.

Behavioral reference: ``yolox-ufp/mmdet/models/dense_heads/yolox_head.py:21``
(stem 1x1 -> 2 stacked 3x3 convs per branch -> 1x1 preds; per-level weight
sharing is NOT used — separate towers per level, matching the reference
ModuleList-per-level layout) and the decode semantics of
``yolox-drone/models/core/utils_bbox.py:254`` /
``yolox_head.py:298`` (_bbox_decode):

    cx = (grid_x + pred_x) * stride        w = exp(pred_w) * stride
    cy = (grid_y + pred_y) * stride        h = exp(pred_h) * stride

Head outputs are flattened across levels into one fixed-shape (B, A, ...)
tensor so downstream assignment/NMS are single fused XLA ops.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from glsdet_tpu.models.layers import ConvNormAct, DWConvBlock


class YOLOXHead(nn.Module):
    """Decoupled YOLOX head over N pyramid levels.

    Returns per-level NHWC maps: cls (num_classes), reg (4), obj (1).

    ``cross_scale_cls`` enables the "yolox6" decoupled-head-attention
    variant (yolox-drone/models/lsk/yolox6_lsk.py:43-53,90-96): the cls
    branch concatenates [current, downsampled finer, upsampled coarser]
    stem features before its convs; reg/obj stay single-scale.
    """

    num_classes: int
    feat_channels: int = 128  # 256 * width_mult
    stacked_convs: int = 2
    num_levels: int = 3
    depthwise: bool = False
    cross_scale_cls: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, *, train: bool = False):
        assert len(feats) == self.num_levels
        common = dict(act=self.act, dtype=self.dtype, axis_name=self.axis_name)
        conv_blk = DWConvBlock if self.depthwise else ConvNormAct

        stems = [
            ConvNormAct(self.feat_channels, 1, 1,
                        name=f"stem{lvl}", **common)(x, train=train)
            for lvl, x in enumerate(feats)
        ]
        cls_out, reg_out, obj_out = [], [], []
        for lvl, x in enumerate(stems):
            if self.cross_scale_cls:
                from glsdet_tpu.models.variants.necks import (
                    cross_scale_concat)

                cls_feat = cross_scale_concat(stems, lvl)
            else:
                cls_feat = x
            reg_feat = x
            for i in range(self.stacked_convs):
                cls_feat = conv_blk(self.feat_channels, 3, 1,
                                    name=f"cls{lvl}_{i}", **common)(
                    cls_feat, train=train)
                reg_feat = conv_blk(self.feat_channels, 3, 1,
                                    name=f"reg{lvl}_{i}", **common)(
                    reg_feat, train=train)
            # prior-prob 0.01 bias on cls/obj logits (reference init_weights)
            bias_init = nn.initializers.constant(float(-np.log((1 - 0.01) / 0.01)))
            cls_out.append(
                nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        bias_init=bias_init, name=f"cls_pred{lvl}")(cls_feat))
            reg_out.append(
                nn.Conv(4, (1, 1), dtype=self.dtype,
                        name=f"reg_pred{lvl}")(reg_feat))
            obj_out.append(
                nn.Conv(1, (1, 1), dtype=self.dtype, bias_init=bias_init,
                        name=f"obj_pred{lvl}")(reg_feat))
        return cls_out, reg_out, obj_out


def level_priors(
    featmap_sizes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
) -> Tuple[np.ndarray, np.ndarray]:
    """Flattened per-anchor grid centers and strides.

    The MlvlPointGenerator analog (mmdet/core/anchor/point_generator.py):
    returns (A, 2) float grid coords (in units of stride, offset 0) and
    (A,) strides, concatenated over levels in order.
    """
    grids, strs = [], []
    for (h, w), s in zip(featmap_sizes, strides):
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grids.append(np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1))
        strs.append(np.full((h * w,), s))
    return (
        np.concatenate(grids, axis=0).astype(np.float32),
        np.concatenate(strs, axis=0).astype(np.float32),
    )


def flatten_head_outputs(cls_out, reg_out, obj_out):
    """Per-level NHWC maps -> (B, A, C)/(B, A, 4)/(B, A) flat tensors."""
    b = cls_out[0].shape[0]
    cls_flat = jnp.concatenate(
        [c.reshape(b, -1, c.shape[-1]) for c in cls_out], axis=1)
    reg_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in reg_out], axis=1)
    obj_flat = jnp.concatenate(
        [o.reshape(b, -1) for o in obj_out], axis=1)
    return cls_flat, reg_flat, obj_flat


def decode_boxes(reg_flat, grids, strides):
    """YOLOX decode to xyxy. reg_flat (B, A, 4); grids (A, 2); strides (A,)."""
    xy = (reg_flat[..., :2] + grids) * strides[:, None]
    wh = jnp.exp(reg_flat[..., 2:4]) * strides[:, None]
    return jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
