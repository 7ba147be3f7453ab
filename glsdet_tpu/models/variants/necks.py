"""Experimental neck variants.

- FeatureGroupFPN (yolox-drone/models/neck/FeatureGroupFPN.py:8,28,85):
  split each level's channels into groups, 3x3-conv each group with its
  own weights, concat — a grouped re-mixing of FPN outputs; the cascade
  variant stacks two rounds.
- CrossScaleClsTower (models/lsk/yolox6_lsk.py:43-53 "yolox6"): the cls
  branch of a decoupled head concatenates [current level, downsampled
  finer level, upsampled coarser level] before its convs; reg/obj stay
  single-scale.  This file provides the fusion op used by the head.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.layers import ConvNormAct, upsample2x


class FeatureGroup(nn.Module):
    """Per-group 3x3 convs over channel splits of one level."""

    groups: int = 4
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        gs = c // self.groups
        outs = []
        for g in range(self.groups):
            part = x[..., g * gs:(g + 1) * gs]
            outs.append(ConvNormAct(
                gs, 3, 1, act="silu", dtype=self.dtype,
                axis_name=self.axis_name, name=f"g{g}")(part, train=train))
        return jnp.concatenate(outs, axis=-1)


class FeatureGroupFPN(nn.Module):
    groups: int = 4
    cascade: bool = False
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], *, train: bool = False):
        rounds = 2 if self.cascade else 1
        feats = list(feats)
        for r in range(rounds):
            feats = [
                FeatureGroup(self.groups, dtype=self.dtype,
                             axis_name=self.axis_name,
                             name=f"r{r}_l{i}")(f, train=train)
                for i, f in enumerate(feats)
            ]
        return tuple(feats)


def cross_scale_concat(feats: Sequence[jnp.ndarray],
                       lvl: int) -> jnp.ndarray:
    """[current, downsampled finer, upsampled coarser] channel concat
    (yolox6_lsk.py:90-96).  Missing neighbors are skipped at the ends."""
    parts: List[jnp.ndarray] = [feats[lvl]]
    if lvl > 0:
        finer = feats[lvl - 1]
        parts.append(jax.lax.reduce_window(
            finer, -jnp.inf, jax.lax.max,
            (1, 2, 2, 1), (1, 2, 2, 1), "VALID"))
    if lvl < len(feats) - 1:
        parts.append(upsample2x(feats[lvl + 1]))
    return jnp.concatenate(parts, axis=-1)
