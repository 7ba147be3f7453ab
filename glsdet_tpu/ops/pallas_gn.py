"""Pallas TPU kernel: fused GroupNorm -> ReLU -> int8 requant.

The static-int8 head towers (ops/quant_static.py `_int8_head_forward`)
interleave int8 convs with GroupNorm.  XLA lowers each GN as two full
passes over the dequantized activation — a reduce pass for the group
statistics and a normalize pass (which it fuses with relu+requant) —
so per tower layer the activation is written once (bf16, the conv
epilogue) and READ TWICE.  Round-2 profiling
(scripts/profile_mpdet_split.py) named exactly these materialization
passes as the stage-2 residual.

This kernel keeps one image's whole (H, W, C) level resident in VMEM
per grid step, so the activation is read from HBM ONCE: a row-chunk
loop accumulates per-channel f32 sums/sumsqs, group statistics come
from two tiny (1,C)x(C,G) matmuls against a 0/1 membership matrix (no
lane-dim interleave reshapes — Mosaic layout rule), and a second
row-chunk loop applies scale/bias + relu + requant and stores int8.
Per-layer HBM traffic for the GN+requant stage drops from
2R(bf16)+1W(int8) = 5 bytes/elem to 2+1 = 3.

Numerics: the statistics accumulate in f32 like the XLA path but with a
different reduction association, so int8 codes can differ by 1 ulp at
quantization boundaries (tests pin ±1 code agreement and exact-match
fraction); the int8 accuracy gate (big_synthetic_check.sh) bounds the
AP effect with everything else.

Eligibility (`gn_eligible`): H % 8 == 0, W % 8 == 0, C % 128 == 0 and
the bf16 block + int8 output fit the ~16MB scoped VMEM — true for every
mosaic-bucket level except the 1152-bucket stride-8 (144x144, 15.9MB)
and the sub-8px tails; ineligible shapes fall back to the XLA path.

Enabled by default on TPU (GLSDET_PALLAS_GN=0 disables; trace-time knob
like GLSDET_PALLAS_NMS — set before the first compile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8                       # row-chunk per VMEM loop step
_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under the 16MB scope


def gn_eligible(shape, groups: int = 32) -> bool:
    """Whether (B, H, W, C) can run the fused kernel."""
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    if h % _ROWS or w % 8 or c % 128 or c % groups:
        return False
    block_bytes = h * w * c * 2 + h * w * c  # bf16 in + int8 out
    return block_bytes <= _VMEM_BUDGET


def gn_enabled() -> bool:
    """Trace-time knob: fused GN on TPU unless GLSDET_PALLAS_GN=0."""
    import os

    v = os.environ.get("GLSDET_PALLAS_GN", "").strip()
    if v == "0":
        return False
    if v == "1":
        return True
    return jax.default_backend() == "tpu"


def _kernel(y_ref, gnp_ref, m_ref, mt_ref, s_ref, q_ref, *,
            h: int, w: int, c: int, groups: int, eps: float):
    n_chunks = h // _ROWS
    cpg = c // groups
    n_per_group = float(h * w * cpg)

    def acc_body(i, carry):
        s, ss = carry
        rows = y_ref[0, pl.ds(i * _ROWS, _ROWS)].astype(jnp.float32)
        s = s + jnp.sum(rows, axis=(0, 1))
        ss = ss + jnp.sum(rows * rows, axis=(0, 1))
        return s, ss

    zero = jnp.zeros((c,), jnp.float32)
    ch_sum, ch_sq = jax.lax.fori_loop(0, n_chunks, acc_body, (zero, zero))

    # group statistics via membership matmuls (C,)->(G,)->(C,)
    g_sum = jnp.dot(ch_sum[None, :], m_ref[...],
                    preferred_element_type=jnp.float32)
    g_sq = jnp.dot(ch_sq[None, :], m_ref[...],
                   preferred_element_type=jnp.float32)
    mean_g = g_sum / n_per_group
    var_g = g_sq / n_per_group - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, mt_ref[...],
                     preferred_element_type=jnp.float32)[0]
    rstd_c = jnp.dot(rstd_g, mt_ref[...],
                     preferred_element_type=jnp.float32)[0]

    gn_scale = gnp_ref[0]
    gn_bias = gnp_ref[1]
    # same affine folding as quant_static._gn_relu: scale = rstd*gamma,
    # bias = beta - mean*scale, both applied in the storage dtype
    scale_c = (rstd_c * gn_scale).astype(jnp.bfloat16)
    bias_c = (gn_bias - mean_c * rstd_c * gn_scale).astype(jnp.bfloat16)
    inv_ignored = s_ref[0, 0]  # keep SMEM operand live for clarity

    def norm_body(i, _):
        rows = y_ref[0, pl.ds(i * _ROWS, _ROWS)]
        v = rows * scale_c[None, None, :] + bias_c[None, None, :]
        v = jnp.maximum(v, jnp.bfloat16(0))
        q = jnp.round(v.astype(jnp.float32) / inv_ignored)
        q = jnp.clip(q, -127.0, 127.0)
        q_ref[0, pl.ds(i * _ROWS, _ROWS)] = q.astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, n_chunks, norm_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("groups", "eps", "interpret"))
def gn_relu_quant(y: jnp.ndarray, gn_scale: jnp.ndarray,
                  gn_bias: jnp.ndarray, s_out: jnp.ndarray,
                  groups: int = 32, eps: float = 1e-6,
                  interpret: bool = False) -> jnp.ndarray:
    """Fused GroupNorm+relu+requant: (B,H,W,C) bf16 -> int8 codes.

    Semantics match ``quant_static._gn_relu`` followed by
    ``clip(round(x / s_out), -127, 127).astype(int8)`` (bf16 storage
    dtype), up to f32 reduction association in the statistics.
    """
    b, h, w, c = y.shape
    g = min(groups, c)
    assert gn_eligible(y.shape, g), y.shape
    member = np.zeros((c, g), np.float32)
    member[np.arange(c), np.arange(c) // (c // g)] = 1.0
    gnp = jnp.stack([gn_scale.astype(jnp.float32),
                     gn_bias.astype(jnp.float32)])
    s_arr = jnp.asarray(s_out, jnp.float32).reshape(1, 1)

    return pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, c=c, groups=g, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((2, c), lambda i: (0, 0)),
            pl.BlockSpec((c, g), lambda i: (0, 0)),
            pl.BlockSpec((g, c), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.int8),
        interpret=interpret,
    )(y.astype(jnp.bfloat16), gnp, jnp.asarray(member),
      jnp.asarray(member.T), s_arr)
