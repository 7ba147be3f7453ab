"""DyHead — dynamic head with scale/spatial/task attention.

Behavioral reference: ``yolox-drone/models/new/dyhead.py`` (DyConv :105,
DyHead :169) and ``dyrelu.py`` (DYReLU :39), following the DyHead paper:
per level, fuse {finer, current, coarser} features through a
(modulated-deformable) 3x3 conv with a sigmoid level gate, then a DyReLU
task activation.

TPU-native deform conv: torchvision's ``deform_conv2d`` (im2col + CUDA
gather) becomes an explicit bilinear ``map_coordinates``-style gather in
XLA — 9 offset taps per output position, each a vectorized 4-corner
gather; the following 1x1 contraction is MXU work.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.layers import upsample2x


def bilinear_gather(img: jnp.ndarray, ys: jnp.ndarray,
                    xs: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C); ys/xs (...,) float coords -> (..., C).

    Out-of-bounds sample as zero (torchvision deform_conv semantics).
    """
    h, w, c = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    def tap(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        v = img[yc, xc]
        return v * inside[..., None].astype(img.dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    wy = wy[..., None].astype(img.dtype)
    wx = wx[..., None].astype(img.dtype)
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)


class DeformConv3x3(nn.Module):
    """Modulated deformable 3x3 conv via bilinear gathers.

    offsets/masks are predicted by a plain 3x3 conv (dyhead.py:118-121).
    """

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        om = nn.Conv(27, (3, 3), padding=[(1, 1), (1, 1)],
                     kernel_init=nn.initializers.zeros,
                     dtype=self.dtype, name="offset_mask")(x)
        offsets = om[..., :18].astype(jnp.float32)   # (B, H, W, 18)
        masks = jax.nn.sigmoid(om[..., 18:])          # (B, H, W, 9)

        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32),
                              indexing="ij")
        taps = []
        k = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                oy = offsets[..., 2 * k]
                ox = offsets[..., 2 * k + 1]
                sy = ys[None] + dy + oy
                sx = xs[None] + dx + ox
                v = jax.vmap(bilinear_gather)(x, sy, sx)  # (B, H, W, C)
                taps.append(v * masks[..., k:k + 1].astype(x.dtype))
                k += 1
        stacked = jnp.concatenate(taps, axis=-1)  # (B, H, W, 9C)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       dtype=self.dtype, name="weight")(stacked)


class DyReLU(nn.Module):
    """Dynamic ReLU-B (dyrelu.py:39): pooled context -> per-channel
    (a1, a2, b1, b2); out = max(a1*x + b1, a2*x + b2)."""

    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = jax.nn.relu(nn.Dense(max(c // self.reduction, 1),
                                 dtype=self.dtype, name="fc1")(y))
        y = nn.Dense(4 * c, dtype=self.dtype, name="fc2")(y)
        y = (jax.nn.sigmoid(y) - 0.5)  # in [-0.5, 0.5]
        a1, a2, b1, b2 = jnp.split(y, 4, axis=-1)
        a1 = 1.0 + 2.0 * a1   # around 1
        a2 = 2.0 * a2         # around 0
        b1 = 0.5 * b1
        b2 = 0.5 * b2
        x1 = a1[:, None, None, :] * x + b1[:, None, None, :]
        x2 = a2[:, None, None, :] * x + b2[:, None, None, :]
        return jnp.maximum(x1, x2)


class DyConv(nn.Module):
    """One DyHead stage (dyhead.py:105): deform conv on {low, mid, high},
    sigmoid scale gates from a shared attention conv, mean-fused, DyReLU."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        dconv = DeformConv3x3(self.channels, dtype=self.dtype, name="dconv")
        gate = nn.Conv(1, (1, 1), dtype=self.dtype, name="scale_attn")
        relu = DyReLU(dtype=self.dtype, name="dyrelu")

        outs = []
        for lvl, f in enumerate(feats):
            terms = [dconv(f)]
            if lvl > 0:  # finer neighbor, downsample 2x
                finer = jax.lax.reduce_window(
                    dconv(feats[lvl - 1]), 0.0, jax.lax.add,
                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0
                terms.append(finer)
            if lvl < len(feats) - 1:  # coarser neighbor, upsample 2x
                terms.append(upsample2x(dconv(feats[lvl + 1])))
            gated = [t * jax.nn.sigmoid(gate(t)) for t in terms]
            fused = sum(gated) / len(gated)
            outs.append(relu(fused))
        return outs


class DyHead(nn.Module):
    """Stack of DyConv stages (dyhead.py:169, default 6 in the paper,
    reference uses 2)."""

    channels: int
    num_stages: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        for i in range(self.num_stages):
            feats = DyConv(self.channels, dtype=self.dtype,
                           name=f"stage{i}")(feats)
        return feats
