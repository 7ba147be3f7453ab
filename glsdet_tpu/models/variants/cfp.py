"""CFP / EVC — centralized feature pyramid blocks.

Behavioral reference: ``yolox-drone/models/cfp/`` (LVCBlock :214,
LightMLPBlock :244, EVCBlock :281 per SURVEY.md §2.3), following the CFP
paper (arXiv:2210.02093): an Explicit Visual Center block combining

- LVC: a learnable visual-center codebook — soft-assign each pixel
  feature to K codewords with learnable per-codeword smoothing, aggregate
  residuals, fuse into a channel gate (codebook matmuls = MXU work);
- a lightweight MLP (depthwise conv + channel MLP with layer scale)
  capturing long-range context;
- outputs concatenated and fused 1x1.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.layers import ConvNormAct


class LVCBlock(nn.Module):
    """Learnable visual center with codebook soft-assignment."""

    num_codes: int = 64
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, c = x.shape
        f = ConvNormAct(c, 1, 1, act="relu", dtype=self.dtype,
                        axis_name=self.axis_name, name="proj")(
            x, train=train)
        feats = f.reshape(b, h * w, c).astype(jnp.float32)
        codebook = self.param("codebook", nn.initializers.normal(0.02),
                              (self.num_codes, c))
        smooth = self.param("smooth", nn.initializers.ones,
                            (self.num_codes,))
        # residuals r_{ik} = x_i - c_k; soft assign by -s_k ||r||^2
        x2 = jnp.sum(feats * feats, -1, keepdims=True)        # (B, N, 1)
        c2 = jnp.sum(codebook * codebook, -1)                 # (K,)
        xc = feats @ codebook.T                               # (B, N, K)
        dist2 = x2 - 2 * xc + c2[None, None, :]
        logits = -jax.nn.softplus(smooth)[None, None, :] * dist2
        assign = jax.nn.softmax(logits, axis=-1)              # (B, N, K)
        # aggregated residual per codeword, summed over codewords
        agg_x = jnp.einsum("bnk,bnc->bkc", assign, feats)
        agg_c = assign.sum(1)[..., None] * codebook[None]
        e = jax.nn.relu(agg_x - agg_c).sum(1)                 # (B, C)
        gate = jax.nn.sigmoid(
            nn.Dense(c, dtype=self.dtype, name="fc")(e.astype(self.dtype)))
        return x + x * gate[:, None, None, :]


class LightMLPBlock(nn.Module):
    """DW conv token mixer + channel MLP, layer-scaled residuals."""

    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        ls1 = self.param("ls1", nn.initializers.constant(1e-2), (c,))
        ls2 = self.param("ls2", nn.initializers.constant(1e-2), (c,))
        y = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="norm1")(x)
        y = nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=c, dtype=self.dtype, name="dw")(y)
        x = x + ls1.astype(x.dtype) * y
        y = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="norm2")(x)
        y = nn.Conv(int(c * self.mlp_ratio), (1, 1), dtype=self.dtype,
                    name="fc1")(y)
        y = jax.nn.gelu(y)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(y)
        return x + ls2.astype(x.dtype) * y


class EVCBlock(nn.Module):
    """Explicit visual center: LVC branch + LightMLP branch, fused."""

    num_codes: int = 64
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        stem = ConvNormAct(c, 3, 1, act="silu", dtype=self.dtype,
                           axis_name=self.axis_name, name="stem")(
            x, train=train)
        lvc = LVCBlock(self.num_codes, dtype=self.dtype,
                       axis_name=self.axis_name, name="lvc")(
            stem, train=train)
        mlp = LightMLPBlock(dtype=self.dtype, name="mlp")(stem)
        y = jnp.concatenate([lvc, mlp], axis=-1)
        return nn.Conv(c, (1, 1), dtype=self.dtype, name="fuse")(y)
