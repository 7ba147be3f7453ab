"""DyHead — dynamic head over the feature pyramid.

Behavioral reference: ``yolox-drone/models/new/dyhead.py`` (DyConv :105,
DyHead :169, Conv3x3Norm :78) and ``dyrelu.py`` (DYReLU :39, h_sigmoid
:29).  Per level, the reference computes ONE 27-channel offset/mask map
from the current level, applies three separately-weighted modulated-
deformable 3x3 convs (+GroupNorm 16) to {current, finer@stride2,
coarser->bilinear-up}, gates each term by a GAP->1x1->ReLU->h_sigmoid
scalar, mean-fuses and SiLUs.  DYReLU is the standalone dynamic
activation from the same zoo (used by its old_modify experiments).

TPU-native deform conv: torchvision/mmcv ``modulated_deform_conv2d``
(im2col + CUDA gather) becomes an explicit bilinear gather in XLA — 9
offset taps per output position, each a vectorized 4-corner gather; the
following 1x1 contraction is MXU work.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def h_sigmoid(x: jnp.ndarray, h_max: float = 1.0) -> jnp.ndarray:
    """relu6(x + 3) * h_max / 6 (dyrelu.py:29)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) * (h_max / 6.0)


def bilinear_gather(img: jnp.ndarray, ys: jnp.ndarray,
                    xs: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C); ys/xs (...,) float coords -> (..., C).

    Out-of-bounds sample as zero (modulated_deform_conv2d semantics).
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
    """Modulated deformable 3x3 conv + GroupNorm(16) (Conv3x3Norm :78).

    offsets (B, Ho, Wo, 18) / masks (B, Ho, Wo, 9) are computed by the
    CALLER (the reference predicts them once per level and shares them
    across the three neighbor convs, dyhead.py:146-150); their spatial
    dims must equal this conv's OUTPUT dims (= input/stride).
    """

    out_channels: int
    stride: int = 1
    groups: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offsets, masks):
        b, h, w, c = x.shape
        ho, wo = h // self.stride, w // self.stride
        ys, xs = jnp.meshgrid(
            jnp.arange(ho, dtype=jnp.float32) * self.stride,
            jnp.arange(wo, dtype=jnp.float32) * self.stride,
            indexing="ij")
        offsets = offsets.astype(jnp.float32)
        taps = []
        k = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                oy = offsets[..., 2 * k]
                ox = offsets[..., 2 * k + 1]
                sy = ys[None] + dy + oy
                sx = xs[None] + dx + ox
                v = jax.vmap(bilinear_gather)(x, sy, sx)  # (B,Ho,Wo,C)
                taps.append(v * masks[..., k:k + 1].astype(x.dtype))
                k += 1
        stacked = jnp.concatenate(taps, axis=-1)  # (B, Ho, Wo, 9C)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, name="weight")(stacked)
        return nn.GroupNorm(num_groups=self.groups, dtype=self.dtype,
                            name="gn")(y)


class DyReLU(nn.Module):
    """Dynamic ReLU (dyrelu.py:39, defaults K2+bias -> exp=4):
    pooled context -> h_sigmoid(fc) -> split (a1, b1, a2, b2);
    a = (y-0.5)*lambda_a*2 + init_a, b = y-0.5 + init_b;
    out = max(a1*x + b1, a2*x + b2)."""

    reduction: int = 4
    lambda_a: float = 1.0
    init_a: tuple = (1.0, 0.0)
    init_b: tuple = (0.0, 0.0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = jax.nn.relu(nn.Dense(max(c // self.reduction, 1),
                                 dtype=self.dtype, name="fc1")(y))
        y = nn.Dense(4 * c, dtype=self.dtype, name="fc2")(y)
        y = h_sigmoid(y)
        a1, b1, a2, b2 = jnp.split(y, 4, axis=-1)  # reference order
        la = 2.0 * self.lambda_a
        a1 = (a1 - 0.5) * la + self.init_a[0]
        a2 = (a2 - 0.5) * la + self.init_a[1]
        b1 = (b1 - 0.5) + self.init_b[0]
        b2 = (b2 - 0.5) + self.init_b[1]
        x1 = a1[:, None, None, :] * x + b1[:, None, None, :]
        x2 = a2[:, None, None, :] * x + b2[:, None, None, :]
        return jnp.maximum(x1, x2)


def _upsample_bilinear(x: jnp.ndarray, hw) -> jnp.ndarray:
    """F.upsample_bilinear analog (align_corners=True)."""
    b, h, w, c = x.shape
    ho, wo = hw
    ys = (jnp.arange(ho) * ((h - 1) / max(ho - 1, 1))).astype(jnp.float32)
    xs = (jnp.arange(wo) * ((w - 1) / max(wo - 1, 1))).astype(jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jax.vmap(bilinear_gather, in_axes=(0, None, None))(x, gy, gx)


class DyConv(nn.Module):
    """One DyHead stage (dyhead.py:105).

    Per level: one shared 3x3 offset/mask conv on the CURRENT level;
    three separately-weighted deform convs for {current (stride 1),
    finer (stride 2), coarser (stride 1, bilinear-upsampled)}; each
    term gated by h_sigmoid(relu(1x1(GAP))); mean fuse; SiLU.
    """

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        offset_conv = nn.Conv(27, (3, 3), padding=[(1, 1), (1, 1)],
                              dtype=self.dtype, name="offset")
        cur_conv = DeformConv3x3(self.channels, 1, dtype=self.dtype,
                                 name="dconv_cur")
        fine_conv = DeformConv3x3(self.channels, 2, dtype=self.dtype,
                                  name="dconv_fine")
        coarse_conv = DeformConv3x3(self.channels, 1, dtype=self.dtype,
                                    name="dconv_coarse")
        attn = nn.Conv(1, (1, 1), dtype=self.dtype, name="attn")

        def gate(t):
            pooled = jnp.mean(t, axis=(1, 2), keepdims=True)
            return h_sigmoid(jax.nn.relu(attn(pooled)))

        outs = []
        for lvl, f in enumerate(feats):
            om = offset_conv(f)
            offsets = om[..., :18]
            masks = jax.nn.sigmoid(om[..., 18:])
            terms = [cur_conv(f, offsets, masks)]
            if lvl > 0:  # finer neighbor via stride-2 deform conv
                terms.append(fine_conv(feats[lvl - 1], offsets, masks))
            if lvl < len(feats) - 1:  # coarser neighbor, upsampled
                up = coarse_conv(feats[lvl + 1],
                                 offsets[:, ::2, ::2], masks[:, ::2, ::2])
                terms.append(_upsample_bilinear(up, f.shape[1:3]))
            gated = [t * gate(t) for t in terms]
            fused = sum(gated) / len(gated)
            outs.append(jax.nn.silu(fused))
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
