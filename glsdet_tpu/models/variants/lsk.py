"""LSK — large selective kernel spatial attention.

Behavioral reference: ``yolox-drone/models/lsk/LSK.py:27`` (LSKblock:
5x5 DW conv + 7x7 dilated-3 DW conv branches, avg/max channel-pooled
gate via a 7x7 conv over the 2-channel stats, gated mix -> 1x1 out,
multiplied into the input) and :54 (Attention: 1x1 -> GELU -> LSK ->
1x1 + residual).  Inserted after every CSPDarknet stage
(darknet_lsk.py:174-203).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class LSKBlock(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        a1 = nn.Conv(c, (5, 5), padding=[(2, 2), (2, 2)],
                     feature_group_count=c, dtype=self.dtype,
                     name="conv0")(x)
        a2 = nn.Conv(c, (7, 7), padding=[(9, 9), (9, 9)],
                     kernel_dilation=(3, 3), feature_group_count=c,
                     dtype=self.dtype, name="conv_spatial")(a1)
        a1 = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="conv1")(a1)
        a2 = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name="conv2")(a2)
        attn = jnp.concatenate([a1, a2], axis=-1)  # (B, H, W, C)
        avg = jnp.mean(attn, axis=-1, keepdims=True)
        mx = jnp.max(attn, axis=-1, keepdims=True)
        agg = jnp.concatenate([avg, mx], axis=-1)  # (B, H, W, 2)
        sig = jax.nn.sigmoid(
            nn.Conv(2, (7, 7), padding=[(3, 3), (3, 3)], dtype=self.dtype,
                    name="conv_squeeze")(agg))
        mixed = a1 * sig[..., 0:1] + a2 * sig[..., 1:2]
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv")(mixed)
        return x * out


class LSKAttention(nn.Module):
    """proj -> GELU -> LSK gate -> proj + residual (LSK.py:54)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj1")(x)
        y = jax.nn.gelu(y)
        y = LSKBlock(dtype=self.dtype, name="lsk")(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj2")(y)
        return x + y
