"""Pallas TPU kernel: fused GroupNorm -> ReLU -> int8 requant.

**Measured-closed experiment — OFF by default** (like the conv-level
fusion in ops/pallas_bottleneck.py; ARCHITECTURE §9).  The premise was
that XLA lowers each head-tower GN as two full HBM passes over the
dequantized activation (stats reduce + normalize), so a VMEM-resident
kernel reading the level ONCE would cut the GN+requant stage from
2R(bf16)+1W(int8) = 5 bytes/elem to 3.  Measured on v5e, the premise
fails twice:

- standalone, the op is VPU-bound, not HBM-bound: the XLA path runs at
  ~38.5 us/img/GN-layer at 128x128x256 — only ~109 GB/s effective HBM
  traffic against the 819 GB/s bound — so removing one read cannot pay;
  this kernel measures ~75 us/img/GN-layer (0.51x XLA), the f32
  upcasts + serialized chunk DMAs costing more than the saved read
  (in-jit lax.scan timing, RPC floor amortized; /tmp-era microbench
  preserved in tests' comments).
- in situ, XLA fuses the stats reduce into the int8 conv's dequant
  epilogue anyway (one write, one read, not two reads), and calling
  this kernel forces the bf16 input to MATERIALIZE first: the int8
  head measures 1.63 ms/img with the kernel vs 0.93 ms/img pure-XLA
  (scripts/profile_mpdet_split.py, B=16 @1024).

The kernel stays as tested opt-in code (GLSDET_PALLAS_GN=1, a
trace-time knob like GLSDET_PALLAS_NMS — set before the first compile)
and as the record of why the int8 towers do NOT hand-fuse GN: the
remaining head residual is VPU elementwise throughput, which XLA's
own fusion already handles better.

Kernel design (for the record): one image's whole (H, W, C) level is
DMA'd into VMEM and stays resident for both loops — a row-chunk loop
accumulates per-channel f32 sums/sumsqs, group statistics come from
two tiny (1,C)x(C,G) matmuls against a 0/1 membership matrix (no
lane-dim interleave reshapes — Mosaic layout rule), and a second
row-chunk loop applies scale/bias + relu + requant in f32 (a bf16
multiply-add shifts int8 codes by 2 on real hardware; f32 matches the
XLA path to ±1 code, tests pin this) and stores int8 via chunked
DMA-out.

Eligibility (`gn_eligible`): H % 8 == 0, W % 8 == 0, C % 128 == 0 and
the resident bf16 level + the int8 out chunk fit the ~16MB scoped VMEM
(the level is DMA'd in explicitly and output leaves in row chunks, so
there is no cross-grid-step double buffering) — true for every
1024-bucket level and the 1152-bucket strides 8/16; the 1152 sub-8px
tails (36/18/9 rows) fall back to the XLA path.
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
    # resident bf16 level + int8 out chunk (manual-DMA layout)
    block_bytes = h * w * c * 2 + _ROWS * w * c
    return block_bytes <= _VMEM_BUDGET


def gn_enabled() -> bool:
    """Trace-time knob: fused GN only when GLSDET_PALLAS_GN=1.

    Off by default — measured slower than XLA's own fusion both
    standalone (0.51x) and in situ (1.63 vs 0.93 ms/img int8 head);
    see the module docstring.
    """
    import os

    return os.environ.get("GLSDET_PALLAS_GN", "").strip() == "1"


def _kernel(y_hbm, gnp_ref, m_ref, mt_ref, s_ref, q_hbm,
            img_vmem, out_vmem, in_sem, out_sem, *,
            h: int, w: int, c: int, groups: int, eps: float):
    b = pl.program_id(0)
    n_chunks = h // _ROWS
    cpg = c // groups
    n_per_group = float(h * w * cpg)

    # one explicit HBM->VMEM copy of the whole (H, W, C) level; the
    # block stays resident for both the stats and normalize loops (a
    # plain VMEM BlockSpec would double-buffer across grid steps and
    # blow the 16MB scope at 128x128x256)
    cp_in = pltpu.make_async_copy(y_hbm.at[b], img_vmem, in_sem)
    cp_in.start()
    cp_in.wait()

    def acc_body(i, carry):
        s, ss = carry
        rows = img_vmem[pl.ds(i * _ROWS, _ROWS)].astype(jnp.float32)
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
    # bias = beta - mean*scale.  The normalize runs in f32 and rounds
    # to bf16 BEFORE the requant divide, exactly like the XLA path
    # (f32 _gn_relu -> bf16 storage -> requant); a bf16 multiply-add
    # here was measured to shift int8 codes by 2 on real TPU hardware
    scale_c = rstd_c * gn_scale
    bias_c = gn_bias - mean_c * rstd_c * gn_scale
    s_out = s_ref[0, 0]

    def norm_body(i, _):
        rows = img_vmem[pl.ds(i * _ROWS, _ROWS)].astype(jnp.float32)
        v = rows * scale_c[None, None, :] + bias_c[None, None, :]
        v = jnp.maximum(v, 0.0).astype(jnp.bfloat16)
        q = jnp.round(v.astype(jnp.float32) / s_out)
        q = jnp.clip(q, -127.0, 127.0)
        out_vmem[...] = q.astype(jnp.int8)
        cp = pltpu.make_async_copy(
            out_vmem, q_hbm.at[b, pl.ds(i * _ROWS, _ROWS)], out_sem)
        cp.start()
        cp.wait()
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
            pl.BlockSpec(memory_space=pl.ANY),      # y stays in HBM
            pl.BlockSpec((2, c), lambda i: (0, 0)),
            pl.BlockSpec((c, g), lambda i: (0, 0)),
            pl.BlockSpec((g, c), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((h, w, c), jnp.bfloat16),    # resident level
            pltpu.VMEM((_ROWS, w, c), jnp.int8),    # out chunk
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(y.astype(jnp.bfloat16), gnp, jnp.asarray(member),
      jnp.asarray(member.T), s_arr)
