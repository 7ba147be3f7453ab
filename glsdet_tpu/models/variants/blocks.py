"""Identity-initialized convs and the reverse-Focus upsampler, flax/NHWC.

Behavioral reference: ``yolox-drone/models/block/IdentityConv.py`` —
- Identity_Conv{,_three,_five,_seven,_nine} (:7,:27,:47,:67,:87): convs
  whose weights start as a dirac delta (output f copies input f % in_g
  at the kernel center) and biases at zero, so insertion into a trained
  net is a no-op at step 0.  One ``kernel_size`` parameter here replaces
  the five copy-pasted classes.  Quirk note: the reference's grouped
  branch hardcodes center index (1, 1) for every kernel size (wrong for
  k != 3); this implementation always uses the true center k//2.
- Reverse_Focus (:107): inverse of the YOLOX Focus stem — conv to
  4*out_channels, then interleave the four channel groups (torch-slice
  order, group g = channel % 4) into a 2x-upsampled map:
  g0 -> (even row, even col), g1 -> (odd, even), g2 -> (even, odd),
  g3 -> (odd, odd).  The reference writes into an x.repeat(2,2) buffer
  that every assignment overwrites (requiring in == out channels to even
  construct); here it is a pure reshape/stack depth-to-space, any
  out_channels.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.layers import ConvNormAct


def _dirac_init(key, shape, dtype=jnp.float32):
    """(kh, kw, in_g, out) kernel: out f reads in f % in_g at center."""
    kh, kw, in_g, out = shape
    w = np.zeros(shape, np.float32)
    for f in range(out):
        w[kh // 2, kw // 2, f % in_g, f] = 1.0
    return jnp.asarray(w, dtype)


class IdentityConv(nn.Module):
    """Dirac-initialized conv (IdentityConv.py:7-105 family)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        pad = k // 2
        return nn.Conv(
            self.features, (k, k), strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            kernel_init=_dirac_init, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv")(x)


class ReverseFocus(nn.Module):
    """Inverse Focus 2x upsampler (IdentityConv.py:107)."""

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    act: str = "silu"
    dtype: Any = jnp.float32
    axis_name: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        y = ConvNormAct(self.out_channels * 4, self.kernel_size,
                        self.stride, act=self.act, dtype=self.dtype,
                        axis_name=self.axis_name,
                        name="conv")(x, train=train)
        b, h, w, c4 = y.shape
        o = c4 // 4
        # channel index = 4*f + g, g = torch-slice group
        t = y.reshape(b, h, w, o, 4)
        tl, bl, tr, br = t[..., 0], t[..., 1], t[..., 2], t[..., 3]
        top = jnp.stack([tl, tr], axis=3).reshape(b, h, 2 * w, o)
        bot = jnp.stack([bl, br], axis=3).reshape(b, h, 2 * w, o)
        return jnp.stack([top, bot], axis=2).reshape(b, 2 * h, 2 * w, o)
