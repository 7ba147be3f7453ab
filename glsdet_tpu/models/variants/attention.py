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
- Non_local_Block (models/new/Non_local_family.py:6): classic embedded-
  gaussian non-local; Patch_Conv_NonLocal (:50) runs it on non-overlapping
  patches to bound the attention cost on large maps.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.layers import BN_EPS, BN_MOMENTUM


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


class MSCAM(nn.Module):
    """Multi-scale channel attention (mscam.py:5). r=4."""

    reduction: int = 4
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
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype,
                             axis_name=self.axis_name if train else None,
                             name=f"{prefix}_bn1")(y)
            y = jax.nn.relu(y)
            y = nn.Conv(c, (1, 1), dtype=self.dtype,
                        name=f"{prefix}_conv2")(y)
            return nn.BatchNorm(use_running_average=not train,
                                momentum=BN_MOMENTUM, epsilon=BN_EPS,
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
    """Embedded-gaussian non-local attention (Non_local_family.py:6).

    theta/phi/g at C/2, softmax(theta phi^T) g, 1x1 out + residual.
    One (HW, HW) attention — the matmuls map straight onto the MXU.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = max(c // 2, 1)
        theta = nn.Conv(inter, (1, 1), dtype=self.dtype, name="theta")(x)
        phi = nn.Conv(inter, (1, 1), dtype=self.dtype, name="phi")(x)
        g = nn.Conv(inter, (1, 1), dtype=self.dtype, name="g")(x)
        q = theta.reshape(b, h * w, inter)
        k = phi.reshape(b, h * w, inter)
        v = g.reshape(b, h * w, inter)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k) /
            jnp.sqrt(jnp.asarray(inter, q.dtype)), axis=-1)
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
