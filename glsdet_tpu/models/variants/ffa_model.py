"""FFA YoloBody — 4-level YOLOX with P2 branch and FFA semantic fusion.

Behavioral reference: ``yolox-drone/models/ffa/yolox_ffa.py`` —
YOLOPAFPN over (dark2, dark3, dark4, dark5) returning
(feat0=P2-raw, P3, P4, P5) (:196-262), and a head whose finest branch
fuses ``FTT(P4_upsampled-pathway)`` into the P2 feature through a CSP
block (:66-73).  ``FTT`` is undefined in the snapshot (SURVEY.md §0) and
behaviorally equals the FFA fusion block — reconstructed that way here:

    p2_in = CSP(concat(P2_raw, FFA(bottom=upsample-path, top=P3)))

Head output is 4 levels at strides (4, 8, 16, 32) for small objects.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.csp_darknet import CSPDarknet, PHI_TABLE, scaled_channels, scaled_depths
from glsdet_tpu.models.layers import ConvNormAct, CSPLayer, upsample2x
from glsdet_tpu.models.variants.ffa import FFA
from glsdet_tpu.models.yolox_head import YOLOXHead

FFA_STRIDES = (4, 8, 16, 32)


class FFAYoloBody(nn.Module):
    """4-level FFA model: CSPDarknet(out 1..4) -> PAFPN -> FFA-P2 head."""

    num_classes: int = 10
    phi: str = "s"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        depth_mult, width_mult, depthwise = PHI_TABLE[self.phi]
        chans = scaled_channels(width_mult)  # (64w,128w,256w,512w,1024w)
        n = scaled_depths(depth_mult)[0]
        common = dict(act="silu", dtype=self.dtype, axis_name=self.axis_name)

        feats = CSPDarknet(
            depth_mult=depth_mult, width_mult=width_mult,
            depthwise=depthwise, out_indices=(1, 2, 3, 4),
            dtype=self.dtype, axis_name=self.axis_name, name="backbone",
        )(images, train=train)
        f0, f1, f2, f3 = feats  # strides 4, 8, 16, 32

        def csp(c, name):
            return CSPLayer(c, num_blocks=n, shortcut=False,
                            depthwise=depthwise, name=name, **common)

        # top-down (yolox_ffa.py:196-233)
        p5 = ConvNormAct(chans[3], 1, 1, name="lat0", **common)(
            f3, train=train)
        x = jnp.concatenate([upsample2x(p5), f2], axis=-1)
        p5_up = csp(chans[3], "c3_p4")(x, train=train)

        p4 = ConvNormAct(chans[2], 1, 1, name="reduce1", **common)(
            p5_up, train=train)
        x = jnp.concatenate([upsample2x(p4), f1], axis=-1)
        p3_out = csp(chans[2], "c3_p3")(x, train=train)

        # bottom-up
        x = ConvNormAct(chans[2], 3, 2, name="bu2", **common)(
            p3_out, train=train)
        x = jnp.concatenate([x, p4], axis=-1)
        p4_out = csp(chans[3], "c3_n3")(x, train=train)

        x = ConvNormAct(chans[3], 3, 2, name="bu1", **common)(
            p4_out, train=train)
        x = jnp.concatenate([x, p5], axis=-1)
        p5_out = csp(chans[4], "c3_n4")(x, train=train)

        # P2 branch with FFA fusion (yolox_ffa.py:66-73): deep semantics
        # (p3_out) super-resolved into the stride-4 feature
        p2_lat = ConvNormAct(chans[1], 1, 1, name="p2_lat", **common)(
            f0, train=train)
        fused = FFA(chans[1], dtype=self.dtype, axis_name=self.axis_name,
                    name="ftt")(
            p2_lat, p3_out, train=train)
        x = jnp.concatenate([p2_lat, fused], axis=-1)
        p2_out = csp(chans[1], "p2_csp")(x, train=train)

        return YOLOXHead(
            num_classes=self.num_classes, feat_channels=chans[2],
            num_levels=4, depthwise=depthwise, dtype=self.dtype,
            axis_name=self.axis_name, name="head",
        )((p2_out, p3_out, p4_out, p5_out), train=train)
