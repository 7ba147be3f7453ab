"""Pallas TPU kernel: fused ResNet bottleneck (inference hot path).

The MP-Det forward is bound by the ResNet-50 backbone (docs/
ARCHITECTURE.md roofline).  XLA runs each bottleneck as three
convolutions with the intermediates round-tripping through HBM; for the
*identity* bottleneck (stride 1, in == out == 4C — 12 of ResNet-50's 16
blocks) the whole

    y1 = relu(x @ W1 + b1)          # 1x1 reduce   (4C -> C)
    y2 = relu(conv3x3(y1, W2) + b2) #              (C  -> C)
    y  = relu(y2 @ W3 + b3 + x)     # 1x1 expand   (C  -> 4C)

chain touches HBM only for x (with a 2-row halo) and y when the
intermediates stay VMEM-resident: ~8.5 C-units of traffic instead of
XLA's ~16 (C-unit = one H*W*C activation pass).

Where it wins (v5e measurements, scripts/bench_bottleneck.py): the
identity block does the SAME 14.3 GFLOP/img at every stage, but XLA's
MXU utilization collapses at the early stages (C=64/128 lanes +
bandwidth bound): stage2 runs 4.3x slower than stage4 per image.  Those
early stages are exactly where fusion pays; stage4/5 are already ~83%
MXU-bound under XLA and a fused kernel cannot beat them.  The
serving-time interceptor (ops/fused_infer.py) therefore applies this
kernel only where measured faster (channels <= mid_channels cap).

Kernel structure (grid = (B, H/th) row bands):

- x stays in HBM (``memory_space=ANY``); each step manually DMAs its
  band plus a one-row halo into one of two VMEM slots, and *prefetches
  the next band's slot* before computing — double buffering, since the
  automatic pallas pipeline cannot express overlapping (halo'd) blocks.
- conv1 runs on the halo'd band (2/th redundant rows); halo rows that
  lie outside the image are zeroed AFTER conv1 (zero-padding semantics:
  conv1's bias must not leak into the pad).
- conv2 is ONE im2col matmul: the 9 shifted (th*W, C) views concatenate
  into (th*W, 9C) so the MXU sees K=9C even when C=64 — 9 separate
  K=C matmuls measured ~4x slower at stage2 widths.  Column shifts are
  static-slice + zero-column concats (Mosaic has no bf16 rotate).
- conv3 + bias + residual + relu finish in registers; the output block
  is pipelined out by pallas.
- all matmuls run bf16 x bf16 -> f32 on the MXU.

Weights are passed folded (conv+BN -> kernel', bias') — see
``ops/fused_infer.py``.  Reference analog: none (the reference leaves
this scheduling to cuDNN); TPU-native answer to
``yolox-ufp/mmdet/models/backbones/resnet.py`` Bottleneck inference.

Numerics: bf16 inputs with f32 accumulation — parity with the XLA chain
within bf16 rounding (tests/test_pallas_bottleneck.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_band(h: int, cap: int = 8) -> int:
    """Largest divisor of ``h`` that is <= cap (band height th)."""
    for th in range(min(cap, h), 0, -1):
        if h % th == 0:
            return th
    return 1


def _band_copy(x_hbm, xh_ref, sem, slot, b, i, *, th: int, n_bands: int):
    """Async-copy descriptor(s) for band ``i`` of image ``b`` into
    ``xh_ref[slot]``: rows [i*th-1, i*th+th+1) clipped to the image.
    Returns a list of (pl.when-condition | None, copy) pairs whose
    start()/wait() the caller runs under the same branch structure."""
    if n_bands == 1:
        return [(None, pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(0, th)],
            xh_ref.at[slot, pl.ds(1, th)], sem.at[slot]))]
    first = i == 0
    last = i == n_bands - 1
    out = [
        (first, pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(0, th + 1)],
            xh_ref.at[slot, pl.ds(1, th + 1)], sem.at[slot])),
        (last, pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * th - 1, th + 1)],
            xh_ref.at[slot, pl.ds(0, th + 1)], sem.at[slot])),
    ]
    if n_bands > 2:
        out.append((jnp.logical_and(jnp.logical_not(first),
                                    jnp.logical_not(last)),
                    pltpu.make_async_copy(
                        x_hbm.at[b, pl.ds(i * th - 1, th + 2)],
                        xh_ref.at[slot], sem.at[slot])))
    return out


def _start_band(x_hbm, xh_ref, sem, slot, b, i, *, th, n_bands):
    for cond, cp in _band_copy(x_hbm, xh_ref, sem, slot, b, i,
                               th=th, n_bands=n_bands):
        if cond is None:
            cp.start()
        else:
            pl.when(cond)(cp.start)


def _wait_band(x_hbm, xh_ref, sem, slot, b, i, *, th, n_bands):
    for cond, cp in _band_copy(x_hbm, xh_ref, sem, slot, b, i,
                               th=th, n_bands=n_bands):
        if cond is None:
            cp.wait()
        else:
            pl.when(cond)(cp.wait)


def _kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            out_ref, xh_ref, patches_ref, sem, *, th: int, B: int,
            H: int, W: int, cin: int, cmid: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_bands = H // th
    lin = b * n_bands + i
    slot = jax.lax.rem(lin, 2)
    nxt = jax.lax.rem(lin + 1, 2)

    # ---- double-buffered halo DMA ------------------------------------
    @pl.when(lin == 0)
    def _():
        _start_band(x_hbm, xh_ref, sem, 0, b, i, th=th, n_bands=n_bands)

    @pl.when(lin < B * n_bands - 1)
    def _():
        nb = jnp.where(i == n_bands - 1, b + 1, b)
        ni = jnp.where(i == n_bands - 1, 0, i + 1)
        _start_band(x_hbm, xh_ref, sem, nxt, nb, ni,
                    th=th, n_bands=n_bands)

    _wait_band(x_hbm, xh_ref, sem, slot, b, i, th=th, n_bands=n_bands)
    xh = xh_ref[slot]                                    # (th+2, W, cin)

    # ---- conv1 (1x1 reduce) on the halo'd band ------------------------
    y1 = jnp.dot(xh.reshape((th + 2) * W, cin), w1_ref[:],
                 preferred_element_type=jnp.float32)
    y1 = jax.nn.relu(y1 + b1_ref[:]).reshape(th + 2, W, cmid)
    # zero-padding semantics: halo rows outside the image must enter
    # conv2 as ZEROS, not relu(b1) (the DMA never fills them, so they
    # hold stale slot data anyway).
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    zero_top = jnp.where(i == 0, 0, -1)
    zero_bot = jnp.where(i == n_bands - 1, th + 1, -1)
    y1 = jnp.where(jnp.logical_or(row == zero_top, row == zero_bot),
                   0.0, y1).astype(jnp.bfloat16)

    # ---- conv2 (3x3 SAME) as one im2col matmul ------------------------
    # The 9 shifted views are written straight into a VMEM scratch (one
    # VPU pass) instead of a value-level concat (two passes).
    zcol = jnp.zeros((th, 1, cmid), jnp.bfloat16)
    for dh in range(3):
        rows = y1[dh:dh + th]                            # (th, W, cmid)
        for dw in (-1, 0, 1):
            if dw == 0:
                shifted = rows
            elif dw == 1:   # shifted[w] = rows[w + 1]
                shifted = jnp.concatenate([rows[:, 1:], zcol], axis=1)
            else:           # shifted[w] = rows[w - 1]
                shifted = jnp.concatenate([zcol, rows[:, :-1]], axis=1)
            k = (dh * 3 + dw + 1) * cmid
            patches_ref[:, k:k + cmid] = shifted.reshape(th * W, cmid)
    y2 = jnp.dot(patches_ref[:], w2_ref[:],
                 preferred_element_type=jnp.float32)
    y2 = jax.nn.relu(y2 + b2_ref[:]).astype(jnp.bfloat16)

    # ---- conv3 (1x1 expand) + residual + relu -------------------------
    y3 = jnp.dot(y2, w3_ref[:], preferred_element_type=jnp.float32)
    xc = xh[1:th + 1].reshape(th * W, cin).astype(jnp.float32)
    y = jax.nn.relu(y3 + b3_ref[:] + xc)
    out_ref[0] = y.astype(out_ref.dtype).reshape(th, W, cin)


@functools.partial(jax.jit, static_argnames=("band_cap", "interpret"))
def fused_bottleneck(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                     w2: jnp.ndarray, b2: jnp.ndarray, w3: jnp.ndarray,
                     b3: jnp.ndarray, *, band_cap: int = 8,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused identity-bottleneck forward.

    Args:
        x: (B, H, W, 4C) input, any float dtype (computed in bf16).
        w1: (4C, C) folded conv1 kernel;   b1: (C,) folded bias.
        w2: (3, 3, C, C) folded conv2;     b2: (C,).
        w3: (C, 4C) folded conv3;          b3: (4C,).
    Returns:
        (B, H, W, 4C) in x.dtype — relu(conv3(relu(conv2(relu(conv1(x)))))
        + x) with SAME zero padding on the 3x3.
    """
    B, H, W, cin = x.shape
    cmid = w1.shape[1]
    th = _pick_band(H, band_cap)

    xb = x.astype(jnp.bfloat16)
    w1b = w1.astype(jnp.bfloat16)
    # (3, 3, C, C) -> (9C, C) in the kernel's tap order (dh major, dw
    # minor — matches the im2col concat order)
    w2b = w2.astype(jnp.bfloat16).reshape(9 * cmid, cmid)
    w3b = w3.astype(jnp.bfloat16)
    b1f = b1.astype(jnp.float32).reshape(1, cmid)
    b2f = b2.astype(jnp.float32).reshape(1, cmid)
    b3f = b3.astype(jnp.float32).reshape(1, cin)

    kern = functools.partial(_kernel, th=th, B=B, H=H, W=W,
                             cin=cin, cmid=cmid)
    return pl.pallas_call(
        kern,
        grid=(B, H // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),              # x (HBM)
            pl.BlockSpec((cin, cmid), lambda b, i: (0, 0)),    # w1
            pl.BlockSpec((1, cmid), lambda b, i: (0, 0)),      # b1
            pl.BlockSpec((9 * cmid, cmid), lambda b, i: (0, 0)),  # w2
            pl.BlockSpec((1, cmid), lambda b, i: (0, 0)),      # b2
            pl.BlockSpec((cmid, cin), lambda b, i: (0, 0)),    # w3
            pl.BlockSpec((1, cin), lambda b, i: (0, 0)),       # b3
        ],
        out_specs=pl.BlockSpec((1, th, W, cin),
                               lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cin), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, W, cin), jnp.bfloat16),
            pltpu.VMEM((th * W, 9 * cmid), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xb, w1b, b1f, w2b, b2f, w3b, b3f)
