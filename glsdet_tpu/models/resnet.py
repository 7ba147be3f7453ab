"""ResNet backbone (MP-Det uses ResNet-50), flax/NHWC.

Behavioral reference: ``yolox-ufp/mmdet/models/backbones/resnet.py`` with
mmdet defaults for detection: deep_stem=False (7x7 stem), 4 stages,
out_indices (0,1,2,3), strides (1,2,2,2), dilations 1, BN frozen-stats in
reference fine-tuning (we expose ``norm_train`` instead; training from
scratch keeps BN live).  Bottleneck is the torchvision/"pytorch-style"
variant: stride on the 3x3 conv.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.layers import BN_EPS, BN_MOMENTUM, remat_active, remat_policy

STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class ResNetConv(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    act: bool = True
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"),
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
            name="bn",
        )(x)
        if self.act:
            x = jax.nn.relu(x)
        return x


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        identity = x
        y = ResNetConv(self.channels, 3, self.stride, dtype=self.dtype,
                       axis_name=self.axis_name, name="conv1")(x, train=train)
        y = ResNetConv(self.channels, 3, 1, act=False, dtype=self.dtype,
                       axis_name=self.axis_name, name="conv2")(y, train=train)
        if self.stride != 1 or x.shape[-1] != self.channels:
            identity = ResNetConv(self.channels, 1, self.stride, act=False,
                                  dtype=self.dtype, axis_name=self.axis_name,
                                  name="down")(x, train=train)
        return jax.nn.relu(y + identity)


class Bottleneck(nn.Module):
    channels: int  # bottleneck width; out = 4x
    stride: int = 1
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out_ch = self.channels * 4
        identity = x
        y = ResNetConv(self.channels, 1, 1, dtype=self.dtype,
                       axis_name=self.axis_name, name="conv1")(x, train=train)
        y = ResNetConv(self.channels, 3, self.stride, dtype=self.dtype,
                       axis_name=self.axis_name, name="conv2")(y, train=train)
        y = ResNetConv(out_ch, 1, 1, act=False, dtype=self.dtype,
                       axis_name=self.axis_name, name="conv3")(y, train=train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = ResNetConv(out_ch, 1, self.stride, act=False,
                                  dtype=self.dtype, axis_name=self.axis_name,
                                  name="down")(x, train=train)
        return jax.nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet-{18,34,50,101,152}. Returns stage features C2..C5."""

    depth: int = 50
    base_channels: int = 64
    out_indices: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    remat: bool = False  # jax.checkpoint each block: backward recomputes
    # activations instead of saving them.  At detection resolutions the
    # saved-activation traffic, not FLOPs, bounds the backward (10.7GB of
    # temps at 1024^2 b4 on a 16GB chip), so remat makes training both
    # smaller AND faster; inference is unaffected.

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        blocks = STAGE_BLOCKS[self.depth]
        block_cls = Bottleneck if self.depth >= 50 else BasicBlock
        # ``train`` stays a closed-over Python bool: passing it through
        # the remat boundary would trace it (TracerBoolConversionError).
        run = (nn.remat(lambda mdl, h: mdl(h, train=train),
               policy=remat_policy(),
                        prevent_cse=False)
               if remat_active(self.remat)
               else (lambda mdl, h: mdl(h, train=train)))

        x = ResNetConv(self.base_channels, 7, 2, dtype=self.dtype,
                       axis_name=self.axis_name, name="stem")(x, train=train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        for stage, n in enumerate(blocks):
            ch = self.base_channels * (2 ** stage)
            for i in range(n):
                stride = 2 if (i == 0 and stage > 0) else 1
                x = run(block_cls(ch, stride, dtype=self.dtype,
                                  axis_name=self.axis_name,
                                  name=f"layer{stage + 1}_{i}"), x)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)
