"""CSPDarknet backbone (YOLOX), TPU-native flax implementation.

Behavioral reference: ``yolox-ufp/mmdet/models/backbones/csp_darknet.py``
(Focus stem :14, SPPBottleneck :67, CSPDarknet :124) and the equivalent
``yolox-drone/models/base/darknet.py:115``.  Width/depth multipliers follow
the YOLOX phi table (yolox-drone/models/base/yolox.py:240-242):

    nano  0.33/0.25 (depthwise)   tiny 0.33/0.375   s 0.33/0.50
    m     0.67/0.75               l    1.0/1.0      x 1.33/1.25

Stages (base widths, depth = round(3 * depth_mult) except stage1):
    stem  Focus  -> 64w
    dark2 conv/2 -> 128w, CSP(n)
    dark3 conv/2 -> 256w, CSP(3n)   -> out P3 (stride 8)
    dark4 conv/2 -> 512w, CSP(3n)   -> out P4 (stride 16)
    dark5 conv/2 -> 1024w, SPP, CSP(n, no shortcut) -> out P5 (stride 32)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.layers import (
    ConvNormAct,
    CSPLayer,
    DWConvBlock,
    Focus,
    SPPBottleneck,
)

# phi -> (depth_mult, width_mult, depthwise)
PHI_TABLE = {
    "nano": (0.33, 0.25, True),
    "tiny": (0.33, 0.375, False),
    "s": (0.33, 0.50, False),
    "m": (0.67, 0.75, False),
    "l": (1.0, 1.0, False),
    "x": (1.33, 1.25, False),
}

BASE_CHANNELS = (64, 128, 256, 512, 1024)
BASE_DEPTHS = (3, 9, 9, 3)


def scaled_channels(width_mult: float) -> Tuple[int, ...]:
    return tuple(int(c * width_mult) for c in BASE_CHANNELS)


def scaled_depths(depth_mult: float) -> Tuple[int, ...]:
    return tuple(max(round(d * depth_mult), 1) for d in BASE_DEPTHS)


class CSPDarknet(nn.Module):
    """YOLOX backbone. Returns features for ``out_indices`` stages.

    out_indices over (stem=0, dark2=1, dark3=2, dark4=3, dark5=4);
    default (2, 3, 4) = strides (8, 16, 32).
    """

    depth_mult: float = 0.33
    width_mult: float = 0.50
    depthwise: bool = False
    out_indices: Sequence[int] = (2, 3, 4)
    act: str = "silu"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @classmethod
    def from_phi(cls, phi: str, **kw) -> "CSPDarknet":
        d, w, dw = PHI_TABLE[phi]
        return cls(depth_mult=d, width_mult=w, depthwise=dw, **kw)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        chans = scaled_channels(self.width_mult)
        depths = scaled_depths(self.depth_mult)
        common = dict(act=self.act, dtype=self.dtype, axis_name=self.axis_name)
        down = (
            (lambda c, name: DWConvBlock(c, 3, 2, name=name, **common))
            if self.depthwise
            else (lambda c, name: ConvNormAct(c, 3, 2, name=name, **common))
        )

        outs = []
        x = Focus(chans[0], 3, name="stem", **common)(x, train=train)
        if 0 in self.out_indices:
            outs.append(x)

        for i, (c, n) in enumerate(zip(chans[1:], depths)):
            stage = i + 1  # dark2..dark5
            last = stage == 4
            x = down(c, f"dark{stage + 1}_down")(x, train=train)
            if last:
                x = SPPBottleneck(c, name="spp", **common)(x, train=train)
            x = CSPLayer(
                c,
                num_blocks=n if not last else depths[0],
                shortcut=not last,
                depthwise=self.depthwise,
                name=f"dark{stage + 1}_csp",
                **common,
            )(x, train=train)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)
