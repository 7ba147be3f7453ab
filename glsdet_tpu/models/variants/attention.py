"""Attention blocks from the yolox-drone experimental zoo, flax/NHWC.

Behavioral references (yolox-drone/):
- SE (models/ffa/ffa.py:5): avg-pool -> fc/reduce -> relu -> fc -> sigmoid gate.
- SEBlock (models/block/SEBlock.py:5): avg+max pooled squeeze, shared MLP.
- SEBlockFPN (models/block/SEBlock.py:36): concat per-level pooled stats,
  one MLP gates every level's channels jointly.
- MS_CAM (models/block/mscam.py:5): local (per-pixel) + global (pooled)
  1x1-conv branches with BN, summed then sigmoid gate.
- ConAugModule (models/block/CAM.py:5): parallel dilated 3x3 convs
  (d=1,2,3) concatenated.
- SEAttention (models/block/SEBlock.py:74): spatial-position SE over the
  flattened H*W axis (only well-formed when H*W == the configured
  channel count — an experimental quirk reproduced faithfully).
- Non_local_Block (models/new/Non_local_family.py:6): dot-product
  non-local (matmul / HW, no softmax — the forward's actual path);
  Patch_Conv_NonLocal (:50) is the quadrant downsampling module
  (4 strided convs -> per-quadrant non-local -> half recombinations ->
  1x1 channel fuse).  PatchNonLocal here is a TPU-friendly generic
  patchified variant kept as an extension.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.layers import BN_MOMENTUM, ConvNormAct


class SE(nn.Module):
    """Squeeze-excitation gate (ffa.py:5). reduction 16."""

    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = nn.Dense(max(c // self.reduction, 1), use_bias=False,
                     dtype=self.dtype, name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class SEBlock(nn.Module):
    """avg+max squeeze variant (SEBlock.py:5). reduction 4."""

    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fc1 = nn.Dense(max(c // self.reduction, 1), use_bias=False,
                       dtype=self.dtype, name="fc1")
        avg = jax.nn.relu(fc1(jnp.mean(x, axis=(1, 2))))
        mx = jax.nn.relu(fc1(jnp.max(x, axis=(1, 2))))
        y = nn.Dense(c, use_bias=False, dtype=self.dtype,
                     name="fc2")(avg + mx)
        return x * jax.nn.sigmoid(y)[:, None, None, :]


class SEBlockFPN(nn.Module):
    """Joint cross-level SE gate (SEBlock.py:36). reduction 8."""

    reduction: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        pooled = jnp.concatenate(
            [jnp.mean(f, axis=(1, 2)) for f in feats], axis=-1)
        c = pooled.shape[-1]
        y = nn.Dense(max(c // self.reduction, 1), use_bias=False,
                     dtype=self.dtype, name="fc1")(pooled)
        y = jax.nn.relu(y)
        y = jax.nn.sigmoid(
            nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y))
        outs, cur = [], 0
        for f in feats:
            ci = f.shape[-1]
            outs.append(f * y[:, None, None, cur:cur + ci])
            cur += ci
        return outs


class SEAttention(nn.Module):
    """Spatial SE over flattened positions (SEBlock.py:74).

    Pools each position's channel vector to a scalar, gates the H*W
    positions with the shared MLP.  The reference's Linear layers are
    sized by its ``channels`` ctor arg, so the module is only
    well-formed when H*W == channels — reproduced as-is.
    """

    channels: int
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h * w != self.channels:
            raise ValueError(
                f"SEAttention: H*W ({h * w}) must equal channels "
                f"({self.channels}) — SEBlock.py:74 semantics")
        n = jnp.mean(x, axis=-1).reshape(b, h * w)   # (B, HW)
        n = jax.nn.relu(nn.Dense(
            max(self.channels // self.reduction, 1), use_bias=False,
            dtype=self.dtype, name="fc1")(n))
        n = jax.nn.sigmoid(nn.Dense(
            self.channels, use_bias=False, dtype=self.dtype,
            name="fc2")(n))
        return x * n.reshape(b, h, w, 1)


class MSCAM(nn.Module):
    """Multi-scale channel attention (mscam.py:5). r=4.

    BN eps follows mscam.py's torch-default 1e-5 (NOT the yolox 1e-3)
    so transplanted reference stats normalize identically.
    """

    reduction: int = 4
    eps: float = 1e-5
    dtype: Any = jnp.float32
    axis_name: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        inter = max(c // self.reduction, 1)

        def branch(inp, prefix):
            y = nn.Conv(inter, (1, 1), dtype=self.dtype,
                        name=f"{prefix}_conv1")(inp)
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=self.eps,
                             dtype=self.dtype,
                             axis_name=self.axis_name if train else None,
                             name=f"{prefix}_bn1")(y)
            y = jax.nn.relu(y)
            y = nn.Conv(c, (1, 1), dtype=self.dtype,
                        name=f"{prefix}_conv2")(y)
            return nn.BatchNorm(use_running_average=not train,
                                momentum=BN_MOMENTUM, epsilon=self.eps,
                                dtype=self.dtype,
                                axis_name=self.axis_name if train else None,
                                name=f"{prefix}_bn2")(y)

        local = branch(x, "local")
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        glob = branch(pooled, "global")
        return x * jax.nn.sigmoid(local + glob)


class ConAugModule(nn.Module):
    """Parallel dilated 3x3 convs concatenated (CAM.py:5)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for d in (1, 2, 3):
            outs.append(nn.Conv(
                self.out_channels, (3, 3), kernel_dilation=(d, d),
                padding=[(d, d), (d, d)], dtype=self.dtype,
                name=f"conv_d{d}")(x))
        return jnp.concatenate(outs, axis=-1)


class NonLocalBlock(nn.Module):
    """Non-local attention (Non_local_family.py:6).

    theta/phi/g at inter channels (C/2 default), 1x1 out + residual;
    one (HW, HW) attention — the matmuls map straight onto the MXU.

    mode="dot" is the REFERENCE behavior: its ``forward`` (:43) routes
    through ``dot_product`` — theta phi^T divided by HW, NO softmax
    (the embedded_gaussian method exists but would crash on an
    undefined ``use_scale`` and is never called).  mode="gaussian" is
    the classic softmax variant, kept as an opt-in extension.
    """

    mode: str = "dot"
    inter_channels: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = self.inter_channels or max(c // 2, 1)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype, name="theta")(x)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype, name="phi")(x)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype, name="g")(x)
        q = theta.reshape(b, h * w, inter)
        k = phi.reshape(b, h * w, inter)
        v = g.reshape(b, h * w, inter)
        logits = jnp.einsum("bnc,bmc->bnm", q, k)
        if self.mode == "dot":
            attn = logits / (h * w)
        else:
            attn = jax.nn.softmax(
                logits / jnp.sqrt(jnp.asarray(inter, q.dtype)), axis=-1)
        y = jnp.einsum("bnm,bmc->bnc", attn, v).reshape(b, h, w, inter)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="out")(y)
        return x + y


class PatchNonLocal(nn.Module):
    """Non-local over non-overlapping patches (Non_local_family.py:50):
    bounds cost to O(P * (HW/P)^2) on large drone feature maps."""

    patch: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        p = self.patch
        assert h % p == 0 and w % p == 0, "patch must divide feature map"
        nh, nw = h // p, w // p
        # (B, nh, p, nw, p, C) -> (B*nh*nw, p, p, C)
        xp = x.reshape(b, nh, p, nw, p, c).transpose(0, 1, 3, 2, 4, 5)
        xp = xp.reshape(b * nh * nw, p, p, c)
        y = NonLocalBlock(dtype=self.dtype, name="nl")(xp)
        y = y.reshape(b, nh, nw, p, p, c).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, h, w, c)


class PatchConvNonLocal(nn.Module):
    """Quadrant non-local downsampler (Non_local_family.py:50
    Patch_Conv_NonLocal): split the map into 4 quadrants, stride-2
    3x3 conv each (separate weights), per-quadrant dot-product
    non-local at FULL inter channels, then re-assemble along both
    half-axes (left/right halves conv'd, top/bottom halves conv'd),
    concat the two reassemblies channel-wise and 1x1-fuse.  Output is
    (H/2, W/2, out_channels).
    """

    out_channels: int
    channel_scale: float = 0.5
    channel_cat: str = "linear"  # 'linear' = plain 1x1; else conv+BN+act
    act: str = "silu"
    dtype: Any = jnp.float32
    axis_name: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, c = x.shape
        mid = int(self.channel_scale * c)
        common = dict(act=self.act, dtype=self.dtype,
                      axis_name=self.axis_name)
        hh, hw_ = h // 2, w // 2
        quads = {"lt": x[:, :hh, :hw_], "lb": x[:, hh:, :hw_],
                 "rt": x[:, :hh, hw_:], "rb": x[:, hh:, hw_:]}
        for k in quads:
            q = ConvNormAct(mid, 3, 2, name=f"conv_{k}", **common)(
                quads[k], train=train)
            quads[k] = NonLocalBlock(
                inter_channels=mid, dtype=self.dtype, name=f"nl_{k}")(q)
        left = jnp.concatenate([quads["lt"], quads["lb"]], axis=1)
        right = jnp.concatenate([quads["rt"], quads["rb"]], axis=1)
        top = jnp.concatenate([quads["lt"], quads["rt"]], axis=2)
        bot = jnp.concatenate([quads["lb"], quads["rb"]], axis=2)
        left = ConvNormAct(mid, 3, 1, name="conv_l", **common)(
            left, train=train)
        right = ConvNormAct(mid, 3, 1, name="conv_r", **common)(
            right, train=train)
        top = ConvNormAct(mid, 3, 1, name="conv_t", **common)(
            top, train=train)
        bot = ConvNormAct(mid, 3, 1, name="conv_b", **common)(
            bot, train=train)
        lr = jnp.concatenate([left, right], axis=2)   # full W
        tb = jnp.concatenate([top, bot], axis=1)      # full H
        fused = jnp.concatenate([lr, tb], axis=-1)    # 2*mid channels
        if self.channel_cat == "linear":
            return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           name="channel_conv")(fused)
        return ConvNormAct(self.out_channels, 1, 1, name="channel_conv",
                           **common)(fused, train=train)
