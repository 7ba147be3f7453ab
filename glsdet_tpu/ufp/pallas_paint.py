"""Pallas TPU kernel for batched mosaic assembly (the painter hot op).

The XLA painter (``assembly.assemble_mosaic_tiled_batch``) walks every
paint row of the batch in ONE sequential ``lax.scan`` of dynamic-window
read-modify-writes against an HBM-resident canvas — each step is a
latency-bound ~1MB HBM round trip, ~2k steps at b32 (≈1.2 ms/img of the
two-stage pipeline).  This kernel restructures the work the TPU way:

- grid = (B, out_h/t, out_w/t): each step OWNS one aligned (t, t) canvas
  tile, zero-inits it in VMEM and writes it out exactly once — no HBM
  RMW, no cross-step hazards (regions are disjoint in canvas space by
  packing; a region straddling tiles is painted independently by each
  tile it intersects, masked to the intersection).
- per intersecting region: one async DMA pulls a tile-aligned source
  crop HBM→VMEM (Mosaic requires (8, 128)-aligned starts/shapes; the
  sub-tile residues are removed with ``pltpu.roll`` dynamic rotates),
  the x{1,2,4} cv2 INTER_LINEAR upscale runs on the VPU from VMEM, and
  the masked blend hits the resident tile.
- the host pre-bins regions into per-tile tables (``build_tile_tables``)
  delivered as per-step SMEM blocks, so the kernel's inner loop is a
  fixed ``cap``-bounded scan over SMEM scalars (empty entries are
  ``pl.when``-predicated to ~nothing).

Numerics: interiors are bit-identical to the gather oracle
(``assembly.assemble_mosaic``, float32 taps, cast to the canvas dtype at
the blend); the outer f-wide ring of each chip may bleed a neighboring
source pixel where cv2's crop clamps — the same deviation class the XLA
painters document.  Property-tested in tests/test_pallas_paint.py.

Layout note: pixels are processed planar (B, 3, H, W) so the lane
dimension is image width (a multiple of 128 at every bucket) instead of
C=3; the NHWC<->planar transposes around the kernel are two cheap
contiguous XLA copies (~0.02 ms/img at b32), not part of the kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_tile_tables(rows: np.ndarray, out_h: int, out_w: int,
                      tile: int, cap: int) -> Tuple[np.ndarray, bool]:
    """Bin region rows into per-canvas-tile entry tables.

    Args:
        rows: (R, 7) float rows ``[x1, y1, w, h, nx, ny, f]`` (integer
            valued, f == 0 padding).  UNSPLIT rows — unlike the XLA
            painter there is no ``split_rows_for_tile`` pass; a region
            spanning several tiles gets one entry per tile.
        out_h, out_w: canvas size; tile divides both.
        cap: max entries per tile; returns ``overflow=True`` when any
            tile exceeds it (caller falls back to the XLA painter).

    Returns ((out_h/t, out_w/t, cap, 8) int32 table with entries
    ``[x1, y1, w, h, nx, ny, f, 1]``, overflow flag).

    Delegates to the C++ twin (native/packing.cpp: ufp_tile_tables) when
    the library is available — this runs per frame on the serving host's
    hot path; ``build_tile_tables_py`` is the python reference.
    """
    from glsdet_tpu.native import build_tile_tables_native

    nat = build_tile_tables_native(
        np.asarray(rows, np.float32)[..., :7], out_h, out_w, tile, cap)
    if nat is not None:
        return nat
    return build_tile_tables_py(rows, out_h, out_w, tile, cap)


def build_tile_tables_py(rows: np.ndarray, out_h: int, out_w: int,
                         tile: int, cap: int) -> Tuple[np.ndarray, bool]:
    """Pure-python ``build_tile_tables`` (fallback + parity oracle)."""
    nty, ntx = out_h // tile, out_w // tile
    table = np.zeros((nty, ntx, cap, 8), np.int32)
    counts = np.zeros((nty, ntx), np.int32)
    overflow = False
    for r in np.asarray(rows, np.float64):
        x1, y1, w, h, nx, ny, f = (int(v) for v in r[:7])
        if f <= 0 or w <= 0 or h <= 0:
            continue
        j0, i0 = max(nx // tile, 0), max(ny // tile, 0)
        j1 = min((nx + w * f - 1) // tile, ntx - 1)
        i1 = min((ny + h * f - 1) // tile, nty - 1)
        for i in range(i0, i1 + 1):
            for j in range(j0, j1 + 1):
                c = counts[i, j]
                if c >= cap:
                    overflow = True
                    continue
                table[i, j, c] = (x1, y1, w, h, nx, ny, f, 1)
                counts[i, j] = c + 1
    return table, overflow


def build_tile_tables_jax(rows: jnp.ndarray, out_h: int, out_w: int,
                          tile: int, cap: int) -> jnp.ndarray:
    """jnp twin of ``build_tile_tables_py`` for DEVICE-side binning.

    The serving pipeline already uploads the packed region rows for
    unmapping; building the painter tables from them *inside* the
    stage-2 program removes both the host-side binning work and the
    (b, NT, NT, cap, 8) host->device transfer from the hot path (on a
    remote-tunnel TPU that transfer alone is ~0.3 ms/img at b128).

    Args:
        rows: (R, >=7) float/int rows ``[x1, y1, w, h, nx, ny, f]``
            (integer-valued, f == 0 padding), UNSPLIT.
        out_h, out_w, tile, cap: as ``build_tile_tables``.

    Returns the (out_h/t, out_w/t, cap, 8) int32 table; entries keep
    row order per tile and rows beyond ``cap`` are dropped exactly like
    the python/native builders (the host checks the cap via
    ``tile_max_count`` and falls back to the XLA painter BEFORE
    choosing this path, so the drop never fires in practice).
    """
    nty, ntx = out_h // tile, out_w // tile
    r = rows[..., :7].astype(jnp.int32)                      # (R, 7)
    w, h, nx, ny, f = (r[:, k] for k in range(2, 7))
    valid = (f > 0) & (w > 0) & (h > 0)
    # canvas coords are non-negative, so // matches the C/python trunc
    i0 = jnp.maximum(ny // tile, 0)
    j0 = jnp.maximum(nx // tile, 0)
    i1 = jnp.minimum((ny + h * f - 1) // tile, nty - 1)
    j1 = jnp.minimum((nx + w * f - 1) // tile, ntx - 1)
    ti = jnp.arange(nty)[None, :]
    tj = jnp.arange(ntx)[None, :]
    mi = (ti >= i0[:, None]) & (ti <= i1[:, None])           # (R, nty)
    mj = (tj >= j0[:, None]) & (tj <= j1[:, None])           # (R, ntx)
    member = valid[:, None, None] & mi[:, :, None] & mj[:, None, :]
    member = member.reshape(r.shape[0], nty * ntx)           # (R, T)
    slot = jnp.cumsum(member.astype(jnp.int32), axis=0) - 1  # (R, T)
    onehot = ((member & (slot < cap))[..., None]
              & (slot[..., None] == jnp.arange(cap)[None, None, :]))
    vals = jnp.concatenate(
        [r, jnp.ones((r.shape[0], 1), jnp.int32)], axis=1)   # (R, 8)
    # (T*cap, R) @ (R, 8): one small matmul scatters every entry into
    # its (tile, slot) cell; dropped/padding rows contribute zeros
    table = jnp.einsum("rtc,rk->tck", onehot.astype(jnp.int32), vals)
    return table.reshape(nty, ntx, cap, 8)


def tile_max_count(rows: np.ndarray, out_h: int, out_w: int,
                   tile: int) -> int:
    """Max per-tile entry count of ``rows`` (vectorized host check).

    The device-side table build (``build_tile_tables_jax``) silently
    drops entries beyond ``cap``; the dispatcher calls this O(R + NT^2)
    numpy check first and falls back to the XLA painter when a packing
    is dense enough to overflow — same contract as the ``overflow``
    flag of ``build_tile_tables``.  Uses the 2-D difference-array
    trick: +/-1 at the four range corners, then two cumsums.
    """
    nty, ntx = out_h // tile, out_w // tile
    r = np.asarray(rows, np.float64)[:, :7].astype(np.int64)
    v = (r[:, 6] > 0) & (r[:, 2] > 0) & (r[:, 3] > 0)
    r = r[v]
    if not len(r):
        return 0
    i0 = np.maximum(r[:, 5] // tile, 0)
    j0 = np.maximum(r[:, 4] // tile, 0)
    i1 = np.minimum((r[:, 5] + r[:, 3] * r[:, 6] - 1) // tile, nty - 1)
    j1 = np.minimum((r[:, 4] + r[:, 2] * r[:, 6] - 1) // tile, ntx - 1)
    ok = (i1 >= i0) & (j1 >= j0)
    i0, j0, i1, j1 = i0[ok], j0[ok], i1[ok], j1[ok]
    d = np.zeros((nty + 1, ntx + 1), np.int64)
    np.add.at(d, (i0, j0), 1)
    np.add.at(d, (i0, j1 + 1), -1)
    np.add.at(d, (i1 + 1, j0), -1)
    np.add.at(d, (i1 + 1, j1 + 1), 1)
    return int(d.cumsum(axis=0).cumsum(axis=1)[:nty, :ntx].max())


def _axis_up(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """cv2 INTER_LINEAR upscale along one axis, static shapes.

    ``x`` carries a ONE-ELEMENT HALO on each side of ``axis`` (n + 2
    entries -> f*n outputs): the prev/next taps read real neighboring
    source pixels, so tile-aligned crops are seamless across tile
    boundaries (an edge-clamped formulation would put cv2's crop-edge
    clamp at the tile edge and leave visible seams inside chips).
    Same taps as ``assembly._upscale2`` / ``_upscale4``
    (src = (dst + 0.5) / f - 0.5), written with repeat + parity select
    instead of stack/reshape so the lane-dim interleave lowers on
    Mosaic.
    """
    axis = 1  # sublane axis of (3, S, L); lane interleaves don't lower
    n = x.shape[axis] - 2
    prev = jax.lax.slice_in_dim(x, 0, n, axis=axis)
    cur = jax.lax.slice_in_dim(x, 1, n + 1, axis=axis)
    nxt = jax.lax.slice_in_dim(x, 2, n + 2, axis=axis)
    if factor == 2:
        phases = [0.25 * prev + 0.75 * cur, 0.75 * cur + 0.25 * nxt]
    else:
        phases = [0.375 * prev + 0.625 * cur, 0.125 * prev + 0.875 * cur,
                  0.875 * cur + 0.125 * nxt, 0.625 * cur + 0.375 * nxt]
    # interleave phases along sublanes: (3, n, f, L) -> (3, f*n, L) —
    # the lane dimension stays intact so the reshape lowers on Mosaic
    stacked = jnp.stack(phases, axis=2)
    return stacked.reshape(3, factor * n, x.shape[2])


def _upscale(crop: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(3, m, m) haloed crop -> (3, f*(m-2), f*(m-2)).

    Both axes upscale along the SUBLANE dimension (with a lane/sublane
    transpose in between): Mosaic has no lane-dim interleave, but
    sublane interleave is a plain reshape and ``swapaxes`` is a native
    tpu transpose.
    """
    if factor == 1:
        return crop[:, 1:-1, 1:-1]
    a = _axis_up(crop, factor)             # (3, f*(m-2), m)
    a = jnp.swapaxes(a, 1, 2)              # (3, m, f*(m-2))
    a = _axis_up(a, factor)                # (3, f*(m-2), f*(m-2))
    return jnp.swapaxes(a, 1, 2)


def _ubs(t: int) -> int:
    """Upscale-buffer sublane size: max f*(n+8) over f, 8-aligned."""
    return -(-(t + 36) // 8) * 8


def _ubl(t: int) -> int:
    """Upscale-buffer lane size: max f*(n+1) over f, 128-aligned."""
    return -(-(t + 8) // 128) * 128


def _paint_kernel(table_ref, src_ref, out_ref, crop, upbuf, sem, *,
                  tile: int, cap: int, out_dtype):
    """One grid step = one (3, t, t) canvas tile of one image."""
    t = tile
    b = pl.program_id(0)
    ty = pl.program_id(1) * t
    tx = pl.program_id(2) * t

    out_ref[...] = jnp.zeros((1, 3, t, t), out_dtype)

    yy = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0) + ty
    xx = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1) + tx

    def body(k, carry):
        f = table_ref[0, 0, 0, k, 6]

        @pl.when(table_ref[0, 0, 0, k, 7] > 0)
        def _():
            x1 = table_ref[0, 0, 0, k, 0]
            y1 = table_ref[0, 0, 0, k, 1]
            w = table_ref[0, 0, 0, k, 2]
            h = table_ref[0, 0, 0, k, 3]
            nx = table_ref[0, 0, 0, k, 4]
            ny = table_ref[0, 0, 0, k, 5]
            # crop origin: qy source rows before y1 cover the tile top
            # when the chip starts above it (nyw >= 0) or the tile cuts
            # into the chip (nyw < 0); floor division handles both.
            nyw = ny - ty
            nxw = nx - tx
            qy = jax.lax.div(
                nyw - (f - 1) * (nyw < 0).astype(jnp.int32), f)  # floor
            qx = jax.lax.div(
                nxw - (f - 1) * (nxw < 0).astype(jnp.int32), f)
            ry = nyw - qy * f
            rx = nxw - qx * f
            # src is padded by t+2 on top/left.  The wanted crop starts
            # one source pixel before the window origin plus a 1px tap
            # halo (chips starting in an earlier tile need pre-origin
            # outputs; halo taps read real neighbors so tile splits are
            # seamless — see _axis_up).  Mosaic DMAs on tiled HBM
            # memrefs need (8, 128)-ALIGNED starts and shapes, so the
            # copy starts at the aligned floor and the sub-tile
            # residues (ey, ex) are folded into the post-upscale
            # rotation below.
            sy = y1 - qy + t + 2 - 2          # wanted start (incl halo)
            sx = x1 - qx + t + 2 - 2
            sy0 = jax.lax.div(sy, 8) * 8
            sx0 = jax.lax.div(sx, 128) * 128
            ey = sy - sy0                     # [0, 8)
            ex = sx - sx0                     # [0, 128)
            dma = pltpu.make_async_copy(
                src_ref.at[b, :, pl.ds(sy0, t + 16),
                           pl.ds(sx0, t + 256)],
                crop, sem)
            dma.start()
            dma.wait()

            # the lane residue ex (up to 127) is removed by ONE pre-
            # rotation of the crop, so the upscale only has to cover
            # the small per-axis slack (<= 8f sublanes / f lanes) and
            # the scratch stays ~1.4MB (folding ex into the post-
            # upscale rotation instead needs a t+516-lane buffer and
            # blows the 16MB VMEM budget)
            cl = t + 256
            cfull = crop[...].astype(jnp.int32).astype(jnp.float32)
            cfull = pltpu.roll(cfull, cl - ex, axis=2)

            for factor in (1, 2, 4):
                @pl.when(f == factor)
                def _(factor=factor):
                    n = t // factor + 1
                    up = _upscale(cfull[:, :n + 10, :n + 3], factor)
                    upbuf[:, :factor * (n + 8), :factor * (n + 1)] = up

            # aligned full read + dynamic rotate: Mosaic requires
            # sublane-aligned dynamic slices, so instead of reading at
            # (s_y, s_x) we left-rotate the buffer by that amount and
            # take the leading (t, t) statically.  The rotation's
            # wrapped tail lands beyond index t and is never read.
            s_y = f * (1 + ey) - ry
            s_x = f - rx
            full = upbuf[...]
            full = pltpu.roll(full, _ubs(t) - s_y, axis=1)
            full = pltpu.roll(full, _ubl(t) - s_x, axis=2)
            val = full[:, :t, :t]

            inside = ((xx >= nx) & (xx < nx + w * f)
                      & (yy >= ny) & (yy < ny + h * f))
            cur = out_ref[0]
            out_ref[0] = jnp.where(inside[None], val.astype(out_dtype),
                                   cur)

        return carry

    jax.lax.fori_loop(0, cap, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("out_h", "out_w", "tile", "dtype",
                                    "interpret"))
def assemble_mosaic_pallas_batch(images: jnp.ndarray,
                                 tables: jnp.ndarray,
                                 out_h: int, out_w: int,
                                 tile: int = 256,
                                 dtype=jnp.bfloat16,
                                 interpret: bool = False) -> jnp.ndarray:
    """Pallas twin of ``assembly.assemble_mosaic_tiled_batch``.

    Args:
        images: (B, H, W, 3) uint8 source batch (NHWC).
        tables: (B, out_h/t, out_w/t, cap, 8) int32 per-tile entries
            from ``build_tile_tables`` (stacked over the batch).
        dtype: canvas dtype (bfloat16 keeps the whole tile set well
            inside VMEM; float32 also fits at t=256).

    Returns (B, out_h, out_w, 3) ``dtype`` canvas (NHWC).
    """
    t = int(tile)
    assert out_h % t == 0 and out_w % t == 0
    bsz = int(images.shape[0])
    nty, ntx = out_h // t, out_w // t
    cap = int(tables.shape[3])

    # planar + halo pad: lane dim becomes W (multiples of 128 at every
    # bucket), and crops never read out of bounds
    planar = jnp.transpose(images, (0, 3, 1, 2))
    # top/left halo t+2; bottom/right sized so the aligned-start DMA
    # shapes (t+16 rows, t+256 lanes) never read out of bounds
    padded = jnp.pad(planar,
                     ((0, 0), (0, 0), (t + 2, t + 16), (t + 2, t + 256)))

    kernel = functools.partial(_paint_kernel, tile=t, cap=cap,
                               out_dtype=dtype)
    canvas = pl.pallas_call(
        kernel,
        grid=(bsz, nty, ntx),
        in_specs=[
            pl.BlockSpec((1, 1, 1, cap, 8),
                         lambda b, i, j: (b, i, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 3, t, t),
                               lambda b, i, j: (b, 0, i, j)),
        out_shape=jax.ShapeDtypeStruct((bsz, 3, out_h, out_w), dtype),
        scratch_shapes=[
            pltpu.VMEM((3, t + 16, t + 256), jnp.uint8),
            pltpu.VMEM((3, _ubs(t), _ubl(t)), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(tables, padded)
    return jnp.transpose(canvas, (0, 2, 3, 1))
