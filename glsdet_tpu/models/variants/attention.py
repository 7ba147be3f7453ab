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
- Patch_Conv_NonLocal_new (:206): quadrant non-local WITHOUT the strided
  downsample; Attention (:252) wraps it VAN-style (1x1 -> GELU -> gating
  unit -> 1x1 -> residual); Patch_Conv_NonLocal_44 (:359) applies the
  downsampler per quadrant and recombines; SpatialAttention (:423) is
  the CBAM spatial gate; Patch_Conv_NonLocal_adapt{,_new} (:111,:272)
  split at the activation-mass centroid (see PatchConvNonLocalAdapt for
  the fixed-shape TPU re-design).
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


class SpatialAttention(nn.Module):
    """CBAM spatial gate (Non_local_family.py:423): channel max + mean,
    kxk conv to one channel, sigmoid.  Returns the (B, H, W, 1) map."""

    kernel_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        stats = jnp.concatenate(
            [jnp.max(x, axis=-1, keepdims=True),
             jnp.mean(x, axis=-1, keepdims=True)], axis=-1)
        p = self.kernel_size // 2
        g = nn.Conv(1, (self.kernel_size, self.kernel_size),
                    padding=[(p, p), (p, p)], dtype=self.dtype,
                    name="conv")(stats)
        return jax.nn.sigmoid(g)


class PatchNonLocalQuad(nn.Module):
    """Quadrant non-local, resolution-preserving
    (Non_local_family.py:206 Patch_Conv_NonLocal_new): split into 4
    fixed quadrants, per-quadrant dot-product non-local at
    ``channel_scale * C`` inter channels (separate weights), re-assemble
    and fuse with ``channel_conv``.

    Each quadrant's (HW/4, HW/4) attention costs 1/16 of the full-map
    matmul — four of them are 4x cheaper and still MXU-shaped.  The
    reference module is only well-formed for channel_scale == 1 (its
    channel_conv is declared at middle channels but fed in_channels);
    flax infers conv fan-in, so any scale works here.
    """

    out_channels: int
    channel_scale: float = 0.5
    channel_cat: str = "non_linear"  # 'linear' = plain 1x1; else 3x3+BN+act
    act: str = "silu"
    dtype: Any = jnp.float32
    axis_name: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, c = x.shape
        mid = max(int(self.channel_scale * c), 1)
        hh, hw_ = h // 2, w // 2
        quads = {"lt": x[:, :hh, :hw_], "lb": x[:, hh:, :hw_],
                 "rt": x[:, :hh, hw_:], "rb": x[:, hh:, hw_:]}
        for k in quads:
            quads[k] = NonLocalBlock(
                inter_channels=mid, dtype=self.dtype,
                name=f"nl_{k}")(quads[k])
        top = jnp.concatenate([quads["lt"], quads["rt"]], axis=2)
        bot = jnp.concatenate([quads["lb"], quads["rb"]], axis=2)
        fused = jnp.concatenate([top, bot], axis=1)
        if self.channel_cat == "linear":
            return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           name="channel_conv")(fused)
        return ConvNormAct(self.out_channels, 3, 1, act=self.act,
                           dtype=self.dtype, axis_name=self.axis_name,
                           name="channel_conv")(fused, train=train)


class VANAttention(nn.Module):
    """VAN-style attention wrapper (Non_local_family.py:252 Attention):
    1x1 proj -> exact GELU -> quadrant non-local gating unit
    (Patch_Conv_NonLocal_new at channel_scale=1) -> 1x1 proj ->
    residual."""

    act: str = "silu"
    dtype: Any = jnp.float32
    axis_name: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_1")(x)
        y = jax.nn.gelu(y, approximate=False)  # torch nn.GELU default
        y = PatchNonLocalQuad(
            out_channels=c, channel_scale=1.0, act=self.act,
            dtype=self.dtype, axis_name=self.axis_name,
            name="sgu")(y, train=train)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_2")(y)
        return x + y


class PatchConvNonLocal44(nn.Module):
    """4x4-grid non-local downsampler (Non_local_family.py:359
    Patch_Conv_NonLocal_44): run the quadrant downsampler
    (PatchConvNonLocal) on each quadrant — 16 patches see non-local in
    total — then recombine the four (H/4, W/4) outputs along both half
    axes, 1x1-reduce each recombination to ``mid`` channels, concat the
    left|right and top|bottom assemblies channel-wise and 1x1-fuse.
    Output is (H/2, W/2, out_channels).  (The reference wiring is only
    shape-consistent when out_channels == 4*mid; flax conv fan-in
    inference lifts that restriction.)
    """

    out_channels: int
    channel_scale: float = 0.5
    channel_cat: str = "linear"
    act: str = "silu"
    dtype: Any = jnp.float32
    axis_name: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, c = x.shape
        mid = max(int(self.channel_scale * c), 1)
        common = dict(act=self.act, dtype=self.dtype,
                      axis_name=self.axis_name)
        hh, hw_ = h // 2, w // 2
        quads = {"lt": x[:, :hh, :hw_], "lb": x[:, hh:, :hw_],
                 "rt": x[:, :hh, hw_:], "rb": x[:, hh:, hw_:]}
        for k in quads:
            quads[k] = PatchConvNonLocal(
                out_channels=self.out_channels,
                channel_scale=self.channel_scale, act=self.act,
                dtype=self.dtype, axis_name=self.axis_name,
                name=f"patch_{k}")(quads[k], train=train)
        left = jnp.concatenate([quads["lt"], quads["lb"]], axis=1)
        right = jnp.concatenate([quads["rt"], quads["rb"]], axis=1)
        top = jnp.concatenate([quads["lt"], quads["rt"]], axis=2)
        bot = jnp.concatenate([quads["lb"], quads["rb"]], axis=2)
        left = ConvNormAct(mid, 1, 1, name="conv_l", **common)(
            left, train=train)
        right = ConvNormAct(mid, 1, 1, name="conv_r", **common)(
            right, train=train)
        top = ConvNormAct(mid, 1, 1, name="conv_t", **common)(
            top, train=train)
        bot = ConvNormAct(mid, 1, 1, name="conv_b", **common)(
            bot, train=train)
        lr = jnp.concatenate([left, right], axis=2)
        tb = jnp.concatenate([top, bot], axis=1)
        fused = jnp.concatenate([lr, tb], axis=-1)
        if self.channel_cat == "linear":
            return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           name="channel_conv")(fused)
        return ConvNormAct(self.out_channels, 1, 1, name="channel_conv",
                           **common)(fused, train=train)


def _mass_centroid(mass: jnp.ndarray, size: int) -> jnp.ndarray:
    """First index where the cumulative mass crosses half the total
    (Non_local_family.py:142-166 get_centroid), floored to even and
    clamped to [4, size-4].  Fixed-shape: cumsum + argmax instead of the
    reference's python walk; mass is summed over batch like the
    reference's ``d.sum()``."""
    csum = jnp.cumsum(mass)
    idx = jnp.argmax(csum > 0.5 * csum[-1])
    idx = (idx // 2) * 2
    return jnp.clip(idx, 4, size - 4)


class PatchConvNonLocalAdapt(nn.Module):
    """Centroid-adaptive quadrant non-local, TPU re-design
    (Non_local_family.py:272 Patch_Conv_NonLocal_adapt_new; the strided
    sibling at :111 is the same idea over PatchConvNonLocal).

    The reference crops VARIABLE-size quadrants at the activation-mass
    centroid — data-dependent shapes that cannot compile under XLA.
    Re-design: keep the centroid semantics but ROLL the map so the
    centroid lands on the fixed half boundary (rows first, then each
    half's columns independently), process fixed (H/2, W/2) quadrants,
    unroll, and gate with the CBAM spatial map exactly like the
    reference.  Divergence vs the reference: quadrants wrap around the
    image border instead of stopping at it (documented, test-pinned
    shape behavior only).
    """

    out_channels: int
    channel_scale: float = 0.5
    channel_cat: str = "non_linear"
    act: str = "silu"
    dtype: Any = jnp.float32
    axis_name: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, c = x.shape
        mid = max(int(self.channel_scale * c), 1)
        attn = SpatialAttention(dtype=self.dtype, name="attention_map")(x)
        thr = (jnp.min(attn)
               + 0.75 * (jnp.max(attn) - jnp.min(attn)))  # global, as ref
        tmap = jnp.where(attn < thr, 0.0, attn)[..., 0]   # (B, H, W)

        cx = _mass_centroid(tmap.sum(axis=(0, 2)), h)     # row split
        x_r = jnp.roll(x, h // 2 - cx, axis=1)
        t_r = jnp.roll(tmap, h // 2 - cx, axis=1)
        top_x, bot_x = x_r[:, :h // 2], x_r[:, h // 2:]
        cy_t = _mass_centroid(t_r[:, :h // 2].sum(axis=(0, 1)), w)
        cy_b = _mass_centroid(t_r[:, h // 2:].sum(axis=(0, 1)), w)
        self.sow("intermediates", "centroids",
                 jnp.stack([cx, cy_t, cy_b]))
        top_x = jnp.roll(top_x, w // 2 - cy_t, axis=2)
        bot_x = jnp.roll(bot_x, w // 2 - cy_b, axis=2)

        hw_ = w // 2
        quads = {"lt": top_x[:, :, :hw_], "rt": top_x[:, :, hw_:],
                 "lb": bot_x[:, :, :hw_], "rb": bot_x[:, :, hw_:]}
        for k in quads:
            quads[k] = NonLocalBlock(
                inter_channels=mid, dtype=self.dtype,
                name=f"nl_{k}")(quads[k])
        common = dict(act=self.act, dtype=self.dtype,
                      axis_name=self.axis_name)
        top = jnp.concatenate([quads["lt"], quads["rt"]], axis=2)
        bot = jnp.concatenate([quads["lb"], quads["rb"]], axis=2)
        top = ConvNormAct(mid, 3, 1, name="conv_t", **common)(
            top, train=train)
        bot = ConvNormAct(mid, 3, 1, name="conv_b", **common)(
            bot, train=train)
        # unroll each half's columns, then the rows
        top = jnp.roll(top, cy_t - w // 2, axis=2)
        bot = jnp.roll(bot, cy_b - w // 2, axis=2)
        y = jnp.roll(jnp.concatenate([top, bot], axis=1),
                     cx - h // 2, axis=1)
        if self.channel_cat == "linear":
            y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="channel_conv")(y)
        else:
            y = ConvNormAct(self.out_channels, 3, 1, name="channel_conv",
                            **common)(y, train=train)
        return attn * y  # gate with the (unthresholded) map, as ref
