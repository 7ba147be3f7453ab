"""BatchFormer — batch-dimension transformer decorator.

Behavioral reference: ``yolox-drone/models/batchformer/batchformer.py:3``
(TransformerDecorator): during training, pooled per-sample features pass
through a transformer encoder attending *across the batch*; the stream is
duplicated (original + transformed) so a shared head sees both — the
"shared-head trick".  Inference bypasses it entirely.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchFormer(nn.Module):
    """Transformer encoder layer over the batch axis (train only).

    __call__(feature (B, D), train) -> (2B, D) when train else (B, D).
    """

    dim: int
    num_heads: int = 4
    dropout: float = 0.5

    @nn.compact
    def __call__(self, feature, *, train: bool = False):
        if not train:
            return feature
        # sequence = the batch: (1, B, D) tokens
        x = feature[None]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout,
            deterministic=not train, name="attn")(x, x)
        x = nn.LayerNorm(name="ln1")(x + attn)
        y = nn.Dense(self.dim, name="fc1")(x)
        y = jax.nn.relu(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        x = nn.LayerNorm(name="ln2")(x + y)[0]
        return jnp.concatenate([feature, x], axis=0)


class BatchFormerV2(nn.Module):
    """Spatial-feature variant (batchformerv2.py:4 TransformerDecorator):
    global-average-pool a (B, H, W, C) map, project, run the same
    batch-axis encoder, and concatenate the pre/post streams so a shared
    head sees both.  Inference returns the pooled projection unchanged.
    """

    dim: int
    num_heads: int = 4
    dropout: float = 0.5

    @nn.compact
    def __call__(self, feature, *, train: bool = False):
        pooled = feature.mean(axis=(1, 2))          # (B, C) GAP
        pooled = nn.Dense(self.dim, name="pool_proj")(pooled)
        if not train:
            return pooled
        out = BatchFormer(self.dim, self.num_heads, self.dropout,
                          name="bf")(pooled, train=True)
        return out                                   # (2B, dim)
