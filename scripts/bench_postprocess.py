"""gfl_postprocess cost breakdown at serving shape (TPU).

The two-stage profiler shows the mosaic program spends ~0.7 ms/img in
decode+NMS (vs 2.3 ms/img of MP-Det forward) — this sweeps variants to
localize it: full postprocess, nms_pre filter alone, integral decode
alone, and multiclass NMS alone, all on random logits shaped like the
MP-Det head outputs at a given bucket.

Usage: python scripts/bench_postprocess.py [B] [HW] [ITERS]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glsdet_tpu  # noqa: F401
import jax

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from glsdet_tpu.eval.postprocess import gfl_postprocess  # noqa: E402
from glsdet_tpu.ops.integral import integral_decode  # noqa: E402
from glsdet_tpu.ops.nms import multiclass_nms  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
HW = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
RPC_FLOOR_S = 0.030
STRIDES = (8, 16, 32, 64, 128)
C, REG = 10, 16


def log(msg):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr,
          flush=True)


def bench(fn, args, tag):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*jax.tree.map(
                lambda x: x + c if jnp.issubdtype(x.dtype, jnp.floating)
                else x, a))
            acc = jnp.float32(0)
            for t in jax.tree.leaves(out):
                acc += jnp.sum(t.astype(jnp.float32))
            return c + jnp.bfloat16(1e-3), acc
        _, accs = jax.lax.scan(body, jnp.bfloat16(0), None, length=ITERS)
        return jnp.sum(accs)

    t0 = time.time()
    float(run(*args))
    log(f"{tag}: compiled {time.time() - t0:.0f}s")
    best = np.inf
    for _ in range(4):
        t0 = time.time()
        float(run(*args))
        best = min(best, time.time() - t0)
    ms = (best - RPC_FLOOR_S) * 1e3 / ITERS / B
    log(f"{tag}: {ms:.4f} ms/img")
    return ms


def main():
    rs = np.random.RandomState(0)
    cls_maps, reg_maps = [], []
    for s in STRIDES:
        n = HW // s
        cls_maps.append(jnp.asarray(
            rs.randn(B, n, n, C) * 2 - 4, jnp.bfloat16))
        reg_maps.append(jnp.asarray(
            rs.randn(B, n, n, 4 * (REG + 1)), jnp.bfloat16))
    jax.block_until_ready((cls_maps, reg_maps))
    log(f"inputs ready: B={B} HW={HW}")

    bench(lambda *a: gfl_postprocess(
        a[:5], a[5:], (HW, HW), score_thr=0.025, max_dets=100),
        tuple(cls_maps) + tuple(reg_maps), "full postprocess")

    # per-level nms_pre top_k alone (the candidate filter)
    def filt(*maps):
        outs = []
        for m in maps:
            b, h, w, c = m.shape
            flat = m.reshape(b, h * w, c)
            lead = jnp.max(flat.astype(jnp.float32), -1)
            k = min(1000, h * w)
            _, idx = jax.lax.top_k(lead, k)
            outs.append(jnp.take_along_axis(flat, idx[..., None], 1))
        return outs

    bench(filt, tuple(cls_maps), "nms_pre top_k only")

    # integral decode alone on the filtered row count
    k_total = sum(min(1000, (HW // s) ** 2) for s in STRIDES)
    rows = jnp.asarray(rs.randn(B, k_total, 4 * (REG + 1)), jnp.float32)
    bench(lambda r: integral_decode(r, REG), (rows,), "integral decode")

    # multiclass NMS alone
    boxes = jnp.asarray(rs.rand(B, k_total, 4) * HW, jnp.float32)
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + boxes[..., 2:] % 64)
    scores = jnp.asarray(rs.rand(B, k_total, C) * 0.2, jnp.float32)

    def nms_only(bx, sc):
        return jax.vmap(lambda b_, s_: multiclass_nms(
            b_, s_, 0.025, 0.6, 100))(bx, sc)

    bench(nms_only, (boxes, scores), "multiclass NMS only")


if __name__ == "__main__":
    main()
