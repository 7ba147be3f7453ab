"""FFA — feature fusion attention (the global–local feature-level fusion).

Behavioral reference: ``yolox-drone/models/ffa/ffa.py:22`` (FTT-style
super-resolution fusion): the low-res "top" feature is expanded 1x1 to
4C, content-extracted, SE-gated residual, PixelShuffle-upsampled 2x to C
channels at 2x resolution; concatenated with the high-res "bottom"
feature, texture-extracted, reduced to C; output = upsampled-top +
fused-bottom.  Used by the FFA model (yolox_ffa.py:66-73) to fuse deep
semantics into the P2 branch for small objects (the reference's ``FTT``
symbol is this module — it is undefined in the snapshot, SURVEY.md §0).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.layers import ConvNormAct
from glsdet_tpu.models.variants.attention import SE


def pixel_shuffle_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) -> (B, 2H, 2W, C), NHWC depth-to-space.

    Channel-MAJOR ordering, matching ``torch.nn.PixelShuffle``:
    out[..., 2h+i, 2w+j, c] = in[..., h, w, c*4 + i*2 + j].  The
    ordering matters for reference-checkpoint transplants (the
    preceding conv's output channels are laid out torch-style); pinned
    by tests/test_variant_torch_parity.py.
    """
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * 2, w * 2, c)


class FFA(nn.Module):
    """fuse(bottom@2x-res C ch, top@1x-res 2C ch) -> 2x-res C ch."""

    channels: int  # C: bottom's channel count
    act: str = "relu"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, bottom, top, *, train: bool = False):
        common = dict(act=self.act, dtype=self.dtype,
                      axis_name=self.axis_name)
        c = self.channels
        t = ConvNormAct(c * 4, 1, 1, name="scale", **common)(
            top, train=train)
        t = ConvNormAct(c * 4, 1, 1, name="content1", **common)(
            t, train=train)
        t = ConvNormAct(c * 4, 1, 1, name="content2", **common)(
            t, train=train)
        t = t + SE(dtype=self.dtype, name="se")(t)
        t = pixel_shuffle_2x(t)  # (B, 2H, 2W, C)

        btm = jnp.concatenate([bottom, t], axis=-1)  # 2C
        btm = ConvNormAct(c * 2, 1, 1, name="texture", **common)(
            btm, train=train)
        btm = ConvNormAct(c, 1, 1, name="reduce", **common)(
            btm, train=train)
        return t + btm
