"""FPN neck, flax/NHWC.

Behavioral reference: ``yolox-ufp/mmdet/models/necks/fpn.py:12`` with the
GFL/ATSS detection config: in C2..C5, out 5 levels x 256ch,
``start_level=1``, ``add_extra_convs='on_output'`` (P6, P7 via stride-2
convs on outputs) -> strides (8, 16, 32, 64, 128).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.layers import upsample2x


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, *, train: bool = False):
        feats = list(feats)[self.start_level:]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down accumulation
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + upsample2x(laterals[i])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=f"fpn_conv{i}")(lat)
            for i, lat in enumerate(laterals)
        ]
        # extra levels from the last output (add_extra_convs='on_output')
        x = outs[-1]
        for i in range(self.num_outs - len(outs)):
            x = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"extra_conv{i}")(
                jax.nn.relu(x) if i > 0 else x)
            outs.append(x)
        return tuple(outs)
