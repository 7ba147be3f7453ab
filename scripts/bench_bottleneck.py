"""Microbench: pallas fused identity-bottleneck vs the XLA 3-conv chain.

Runs each ResNet-50 identity-bottleneck stage shape (1280-pixel mosaic
bucket) on the TPU tunnel.  Tunnel rules (CLAUDE.md): one TPU process at
a time; time via scalar readback; amortize with an in-jit lax.scan of
ITERS chained applications (the op is identity-shaped, so the output
feeds the next iteration); best-of-N.

Usage: python scripts/bench_bottleneck.py [B] [ITERS]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glsdet_tpu  # noqa: F401  (re-honors JAX_PLATFORMS)
import jax
import jax.numpy as jnp

from glsdet_tpu.ops.pallas_bottleneck import fused_bottleneck

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

# (H, W, 4C, C): ResNet-50 stages 2..5 at a 1280^2 input
SHAPES = [
    ("stage2", 320, 320, 256, 64),
    ("stage3", 160, 160, 512, 128),
    ("stage4", 80, 80, 1024, 256),
    ("stage5", 40, 40, 2048, 512),
]


def xla_chain(x, w1, b1, w2, b2, w3, b3):
    xb = x.astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        xb, w1.astype(jnp.bfloat16)[None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b1
    y = jax.nn.relu(y).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        y, w2.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b2
    y = jax.nn.relu(y).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        y, w3.astype(jnp.bfloat16)[None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b3
    return jax.nn.relu(y + xb.astype(jnp.float32)).astype(x.dtype)


def bench(fn, x, ws, tag):
    @jax.jit
    def run(x, ws):
        def body(h, _):
            return fn(h, *ws), None
        h, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.sum(h.astype(jnp.float32))

    t0 = time.time()
    float(run(x, ws))
    compile_s = time.time() - t0
    best = np.inf
    for _ in range(4):
        t0 = time.time()
        float(run(x, ws))
        best = min(best, time.time() - t0)
    per_op_ms = (best - 0.030) * 1e3 / ITERS  # ~30ms tunnel RPC floor
    print(f"  {tag:8s} compile {compile_s:6.1f}s  best {best*1e3:8.2f}ms"
          f"  -> {per_op_ms:7.3f} ms/op  ({per_op_ms/B*1e3:6.1f} us/img)")
    return per_op_ms


def main():
    print("device:", jax.devices()[0])
    rs = np.random.RandomState(0)
    for name, H, W, cin, cmid in SHAPES:
        x = jnp.asarray(rs.randn(B, H, W, cin), jnp.bfloat16)
        ws = (
            jnp.asarray(rs.randn(cin, cmid) * 0.05, jnp.float32),
            jnp.asarray(rs.randn(cmid) * 0.05, jnp.float32),
            jnp.asarray(rs.randn(3, 3, cmid, cmid) * 0.05, jnp.float32),
            jnp.asarray(rs.randn(cmid) * 0.05, jnp.float32),
            jnp.asarray(rs.randn(cmid, cin) * 0.05, jnp.float32),
            jnp.asarray(rs.randn(cin) * 0.05, jnp.float32),
        )
        print(f"{name}: x={tuple(x.shape)} cmid={cmid}")
        t_xla = bench(xla_chain, x, ws, "xla")
        band_cap = 4 if cin >= 2048 else 8
        t_pal = bench(
            lambda h, *w: fused_bottleneck(h, *w, band_cap=band_cap),
            x, ws, "pallas")
        print(f"  speedup {t_xla / t_pal:5.2f}x")


if __name__ == "__main__":
    main()
