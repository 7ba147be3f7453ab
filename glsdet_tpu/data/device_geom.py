"""Device-side geometric stage: fused mosaic + random-affine gather-warp.

Behavioral reference: the host pipeline ``mosaic4`` + ``random_affine``
(data/augment.py; reference transforms.py:1947/:2480).  The host path
paints a 2x canvas (4x cv2.resize + memcpy) then cv2.warpAffine's it
down — ~19 ms/sample of host CPU.  Here the host samples the SAME
parameters (``mosaic4_params`` / ``random_affine_params`` — identical
rng stream) and does the exact box geometry, while the pixels are
produced on device by ONE fused gather: each output pixel maps through
the inverse affine into the virtual 2x canvas, picks its mosaic
quadrant, and bilinear-samples the corresponding RAW source image.

Measured ~2.2 ms/img on-chip at b8 640^2 from 4x960x1280 sources
(scripts/bench_device_geom.py).  OFF by default
(``TrainPipeline(device_geom=True)`` opts in): every batch ships the
raw sources (~4.9 MB/sample uint8 vs 1.2 MB for the final image), which
pays off on a PCIe host (+4 ms/batch upload vs ~10-19 ms/sample host
saving) but LOSES on a ~35 MB/s tunnel — the A/B lives in
scripts/bench_device_geom.py --wired.

Numerics vs the host path: box geometry is BIT-EXACT (same numpy code);
pixels differ where the fused single bilinear replaces the host's
resize-then-warp DOUBLE resample — exact on locally-linear content
(bilinear reproduces affine images), enveloped elsewhere
(tests/test_device_geom.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PAD_VAL = 114.0

# quads row layout (per mosaic quadrant, float32):
#   0:x1 1:y1 2:x2 3:y2   placement rect on the 2x canvas
#   4:sx1 5:sy1           crop offset into the resized image
#   6:rxr 7:ryr           resized->source ratios (w0/nw, h0/nh)
#   8:w0 9:h0             valid source size inside the padded array
QUAD_COLS = 10


def quads_to_array(quads: Sequence[Tuple], shapes: Sequence[Tuple[int, int]]
                   ) -> np.ndarray:
    """mosaic4_params quads + source shapes -> the (4, 10) device rows."""
    out = np.zeros((4, QUAD_COLS), np.float32)
    for i, ((x1, y1, x2, y2, sx1, sy1, _scale, nw, nh),
            (h0, w0)) in enumerate(zip(quads, shapes)):
        out[i] = (x1, y1, x2, y2, sx1, sy1,
                  w0 / max(nw, 1), h0 / max(nh, 1), w0, h0)
    return out


def flip_affine(mat: np.ndarray, out_w: int) -> np.ndarray:
    """Fold a horizontal flip of the OUTPUT into the affine (3x3,
    canvas -> out): flipped(x, y) = original(W - 1 - x, y)."""
    f = np.array([[-1.0, 0.0, out_w - 1.0],
                  [0.0, 1.0, 0.0],
                  [0.0, 0.0, 1.0]], np.float64)
    return f @ mat


def inverse_affine_2x3(mat: np.ndarray) -> np.ndarray:
    """(3, 3) canvas->out affine -> (2, 3) out->canvas inverse rows."""
    return np.linalg.inv(mat)[:2].astype(np.float32)


def geom_warp(sources: jnp.ndarray, quads: jnp.ndarray, mats: jnp.ndarray,
              out_hw: Tuple[int, int], pad_val: float = PAD_VAL
              ) -> jnp.ndarray:
    """The fused device mosaic+affine warp.

    sources: (B, 4, HS, WS, 3) uint8 padded raw images
    quads:   (B, 4, 10) float32 (see QUAD_COLS layout)
    mats:    (B, 2, 3) float32 INVERSE affine (output pixel -> canvas)
    Returns (B, HO, WO, 3) float32 uint8-codes.
    """
    ho, wo = out_hw
    _, _, hs, ws, _ = sources.shape

    def one(srcs, quad, mat):
        ys, xs = jnp.meshgrid(
            jnp.arange(ho, dtype=jnp.float32),
            jnp.arange(wo, dtype=jnp.float32), indexing="ij")
        u = mat[0, 0] * xs + mat[0, 1] * ys + mat[0, 2]
        v = mat[1, 0] * xs + mat[1, 1] * ys + mat[1, 2]

        flat = srcs.reshape(4 * hs * ws, 3)
        out = jnp.full((ho, wo, 3), pad_val, jnp.float32)
        for q in range(4):
            x1, y1, x2, y2, sx1, sy1, rxr, ryr, w0, h0 = (
                quad[q, i] for i in range(QUAD_COLS))
            in_q = (u >= x1) & (u < x2) & (v >= y1) & (v < y2)
            # continuous canvas -> resized-image -> source coords
            # (cv2.resize INTER_LINEAR pixel-center mapping)
            sx = (u - x1 + sx1 + 0.5) * rxr - 0.5
            sy = (v - y1 + sy1 + 0.5) * ryr - 0.5
            x0 = jnp.floor(sx)
            y0 = jnp.floor(sy)
            wx = (sx - x0)[..., None]
            wy = (sy - y0)[..., None]

            def tap(yi, xi):
                # cv2.resize clamps taps at the source border
                yc = jnp.clip(yi, 0.0, h0 - 1.0).astype(jnp.int32)
                xc = jnp.clip(xi, 0.0, w0 - 1.0).astype(jnp.int32)
                lin = q * (hs * ws) + yc * ws + xc
                return jnp.take(flat, lin, axis=0).astype(jnp.float32)

            val = ((tap(y0, x0) * (1 - wx) + tap(y0, x0 + 1) * wx)
                   * (1 - wy)
                   + (tap(y0 + 1, x0) * (1 - wx)
                      + tap(y0 + 1, x0 + 1) * wx) * wy)
            out = jnp.where(in_q[..., None], val, out)
        return out

    return jax.vmap(one)(sources, quads, mats)
