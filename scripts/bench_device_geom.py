"""Feasibility microbench: the DEVICE geometric stage (fused
mosaic+affine bilinear gather-warp) for the train input path.

Question: after the device color stage (data/device_color.py) moved the
elementwise host work on chip, the remaining host cost is the geometric
stage (mosaic paint + affine warp, ~19 ms/sample on a 1-CPU host).
Could it move on device too?  The fused formulation: each output pixel
maps through the inverse global affine into the 2x mosaic canvas, picks
its quadrant, and bilinear-samples the corresponding raw source image —
one 4-tap gather per pixel from the stacked sources.

MEASURED (this script, axon tunnel TPU, in-jit scan + scalar readback):
  b8 640x640 out of 4x960x1280 uint8 sources: ~17 ms/batch
  (~2.2 ms/img) — the gather itself is device-viable.

DECISION (recorded in ARCHITECTURE §9): NOT wired.  Every device-geom
variant must upload either raw sources or the 2x canvas — ~4.9 MB/sample
uint8 vs the 1.2 MB final image — and on this harness's ~35 MB/s tunnel
the +30 MB/batch swamps the ~10-19 ms/sample host saving (the color
stage won precisely because it SHRANK upload).  On a PCIe host
(~10 GB/s, +4 ms/batch) the trade flips and this becomes the natural
next step; re-run this script there before wiring.

Run: python scripts/bench_device_geom.py   (TPU via repo-root entry, or
     JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/... )
"""

import time
from functools import partial

import numpy as np

B, HS, WS = 8, 960, 1280     # batch, per-quadrant raw source size
HO, WO = 640, 640            # output canvas


def main():
    import jax
    import jax.numpy as jnp

    def warp_one(srcs, mat, sel):
        """srcs (4, HS, WS, 3) uint8; mat (2,3) inverse affine
        out->canvas; sel (2,) mosaic center.  Representative of the
        real fused map (quadrant pick + per-quadrant scale)."""
        ys, xs = jnp.meshgrid(
            jnp.arange(HO, dtype=jnp.float32),
            jnp.arange(WO, dtype=jnp.float32), indexing="ij")
        u = mat[0, 0] * xs + mat[0, 1] * ys + mat[0, 2]
        v = mat[1, 0] * xs + mat[1, 1] * ys + mat[1, 2]
        cx, cy = sel[0], sel[1]
        qi = (jnp.where(u >= cx, 1, 0) + jnp.where(v >= cy, 2, 0))
        sx = (u - jnp.where(u >= cx, cx, 0.0)) * 1.5
        sy = (v - jnp.where(v >= cy, cy, 0.0)) * 1.5
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        wy = (sy - y0)[..., None]
        wx = (sx - x0)[..., None]
        flat = srcs.reshape(4 * HS * WS, 3)

        def tap(yi, xi):
            inside = (yi >= 0) & (yi < HS) & (xi >= 0) & (xi < WS)
            yc = jnp.clip(yi, 0, HS - 1).astype(jnp.int32)
            xc = jnp.clip(xi, 0, WS - 1).astype(jnp.int32)
            lin = qi * (HS * WS) + yc * WS + xc
            vv = jnp.take(flat, lin, axis=0).astype(jnp.float32)
            return jnp.where(inside[..., None], vv, 114.0)

        v00 = tap(y0, x0)
        v01 = tap(y0, x0 + 1)
        v10 = tap(y0 + 1, x0)
        v11 = tap(y0 + 1, x0 + 1)
        return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
                + (v10 * (1 - wx) + v11 * wx) * wy)

    @partial(jax.jit, static_argnums=3)
    def bench_scan(srcs_b, mats, sels, n):
        def body(c, _):
            o = jax.vmap(warp_one)(srcs_b, mats, sels)
            return c + o.mean(), None
        s, _ = jax.lax.scan(body, 0.0, None, length=n)
        return s

    rs = np.random.RandomState(0)
    srcs_b = jnp.asarray(
        rs.randint(0, 256, (B, 4, HS, WS, 3), np.uint8))
    mats = jnp.asarray(
        rs.uniform(0.4, 0.9, (B, 2, 3)).astype(np.float32))
    sels = jnp.asarray(
        rs.uniform(300, 900, (B, 2)).astype(np.float32))
    N = 10
    # scalar readback forces completion (tunnel block_until_ready is
    # advisory — CLAUDE.md timing rules)
    print("warmup:", float(bench_scan(srcs_b, mats, sels, 1)),
          flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(bench_scan(srcs_b, mats, sels, N))
        best = min(best, time.perf_counter() - t0)
    per_batch_ms = best / N * 1000
    print(f"gather warp b{B} {HO}x{WO} from 4x{HS}x{WS}: "
          f"{per_batch_ms:.1f} ms/batch ({per_batch_ms / B:.2f} ms/img)")




def wired_ab():
    """A/B the two WIRED pipelines (host geometry vs device_geom) on a
    synthetic dataset: host sample-production rate and per-sample
    host->device payload bytes.  The on-chip warp cost is main()'s
    microbench; the full train-step A/B is
    ``python bench.py --train --with-data`` with GLSDET_DEVICE_GEOM=1.
    """
    import json
    import os
    import tempfile

    import cv2

    from glsdet_tpu.data.coco import CocoDataset
    from glsdet_tpu.data.loader import TrainPipeline

    rs = np.random.RandomState(0)
    tmp = tempfile.mkdtemp()
    imgs, anns = [], []
    aid = 0
    for i in range(16):
        h, w = 765, 1360
        img = rs.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(os.path.join(tmp, f"{i}.jpg"), img)
        imgs.append({"id": i, "file_name": f"{i}.jpg",
                     "width": w, "height": h})
        for _ in range(20):
            x, y = rs.uniform(0, w - 60), rs.uniform(0, h - 60)
            anns.append({"id": aid, "image_id": i,
                         "bbox": [x, y, 30, 30], "category_id": 1,
                         "iscrowd": 0, "area": 900})
            aid += 1
    ann_path = os.path.join(tmp, "ann.json")
    with open(ann_path, "w") as f:
        json.dump({"images": imgs, "annotations": anns,
                   "categories": [{"id": 1, "name": "x"}]}, f)
    ds = CocoDataset(ann_path, tmp, cache_images=True)

    for name, kw in [("host-geom", {}),
                     ("device-geom", dict(device_geom=True,
                                          geom_src_hw=(1088, 1440)))]:
        pipe = TrainPipeline(ds, (640, 640), max_gt=300, raw_uint8=True,
                             device_color=True, **kw)
        rng = np.random.RandomState(0)
        pipe(0, rng)  # warm the decode cache
        t0 = time.perf_counter()
        n = 24
        payload = 0
        for i in range(n):
            s = pipe(i % len(ds), rng)
            payload += sum(v.nbytes for v in s.values()
                           if hasattr(v, "nbytes"))
        dt = time.perf_counter() - t0
        print(f"{name}: {1000 * dt / n:.1f} ms/sample host, "
              f"{payload / n / 1e6:.2f} MB/sample payload")


if __name__ == "__main__":
    import sys

    if "--wired" in sys.argv:
        wired_ab()
    else:
        main()
