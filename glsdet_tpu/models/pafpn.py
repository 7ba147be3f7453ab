"""YOLOX PAFPN neck (top-down FPN + bottom-up PAN), flax/NHWC.

Behavioral reference: ``yolox-ufp/mmdet/models/necks/yolox_pafpn.py:14`` and
``yolox-drone/models/base/yolox.py:95`` (YOLOPAFPN).  Three levels in
(P3,P4,P5), three levels out at the same strides:

  top-down:  reduce P5 -> up2x -> cat P4 -> CSP -> reduce -> up2x -> cat P3 -> CSP
  bottom-up: down-conv /2 -> cat -> CSP, twice
  per-level out 1x1/"identity" (mmdet variant uses out_convs; drone variant
  feeds head directly) — we expose raw PAN features; the head owns its stem.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.layers import ConvNormAct, CSPLayer, DWConvBlock, upsample2x


class YOLOXPAFPN(nn.Module):
    """3-level PAN-FPN. in/out channels = (256w, 512w, 1024w)."""

    channels: Sequence[int] = (128, 256, 512)  # for width_mult=0.5
    num_csp_blocks: int = 1  # round(3 * depth_mult)
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, *, train: bool = False):
        c3, c4, c5 = self.channels
        p3, p4, p5 = feats
        common = dict(act=self.act, dtype=self.dtype, axis_name=self.axis_name)
        down = (
            (lambda c, name: DWConvBlock(c, 3, 2, name=name, **common))
            if self.depthwise
            else (lambda c, name: ConvNormAct(c, 3, 2, name=name, **common))
        )

        def csp(c, name):
            return CSPLayer(
                c,
                num_blocks=self.num_csp_blocks,
                shortcut=False,
                depthwise=self.depthwise,
                name=name,
                **common,
            )

        # top-down
        lat5 = ConvNormAct(c4, 1, 1, name="reduce5", **common)(p5, train=train)
        x = jnp.concatenate([upsample2x(lat5), p4], axis=-1)
        td4 = csp(c4, "td_csp4")(x, train=train)

        lat4 = ConvNormAct(c3, 1, 1, name="reduce4", **common)(td4, train=train)
        x = jnp.concatenate([upsample2x(lat4), p3], axis=-1)
        out3 = csp(c3, "td_csp3")(x, train=train)

        # bottom-up
        x = down(c3, "bu_down3")(out3, train=train)
        x = jnp.concatenate([x, lat4], axis=-1)
        out4 = csp(c4, "bu_csp4")(x, train=train)

        x = down(c4, "bu_down4")(out4, train=train)
        x = jnp.concatenate([x, lat5], axis=-1)
        out5 = csp(c5, "bu_csp5")(x, train=train)

        return (out3, out4, out5)
