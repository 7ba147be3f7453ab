"""Microbench: does static-scale int8 with fake-quant block boundaries
beat bf16 on the ResNet identity-bottleneck chain?

Hypothesis: with STATIC activation scales (calibrated, not dynamic)
expressed as quantize -> int8 -> dequantize at block boundaries, XLA
fuses the quantize into the producer's epilogue and the dequantize into
each consumer's prologue, so the tensor MATERIALIZED in HBM is int8 —
halving the bandwidth-bound backbone traffic — while the convs run
s8xs8->s32 at 2x MXU peak.  (The dynamic-quant mode, ops/quant.py,
cannot do this: its scale is a data-dependent reduction that costs an
extra HBM pass, measured a net loss on 1x1s.)

Times ITERS chained identity bottlenecks per variant (scan), scalar
readback, best-of-N, ~30ms tunnel floor subtracted.

Usage: python scripts/bench_int8_chain.py [B] [ITERS]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glsdet_tpu  # noqa: F401
import jax
import jax.numpy as jnp

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

SHAPES = [
    ("stage2", 320, 320, 256, 64),
    ("stage3", 160, 160, 512, 128),
    ("stage4", 80, 80, 1024, 256),
    ("stage5", 40, 40, 2048, 512),
]


def conv(h, w, pad="SAME", pet=jnp.float32):
    return jax.lax.conv_general_dilated(
        h, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet)


def bf16_block(x, ws):
    w1, b1, w2, b2, w3, b3 = ws
    xb = x.astype(jnp.bfloat16)
    y = jax.nn.relu(conv(xb, w1.astype(jnp.bfloat16)[None, None]) + b1)
    y = jax.nn.relu(conv(y.astype(jnp.bfloat16), w2.astype(jnp.bfloat16),
                         [(1, 1), (1, 1)]) + b2)
    y = conv(y.astype(jnp.bfloat16), w3.astype(jnp.bfloat16)[None, None]) + b3
    return jax.nn.relu(y + xb.astype(jnp.float32)).astype(x.dtype)


def qw(w):
    """Per-output-channel int8 weights + f32 scale row."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))),
                    1e-8) / 127.0
    return jnp.round(w / s).astype(jnp.int8), s


def int8_block(x_q, s_x, ws, s_y1, s_y2, s_out):
    """x_q int8 in, int8 out: conv int8 chains with static requant."""
    w1, b1, w2, b2, w3, b3 = ws
    q1, sw1 = qw(w1[None, None])
    q2, sw2 = qw(w2)
    q3, sw3 = qw(w3[None, None])

    y = conv(x_q, q1, pet=jnp.int32).astype(jnp.float32) * (s_x * sw1) + b1
    y = jax.nn.relu(y)
    y = jnp.clip(jnp.round(y / s_y1), -127, 127).astype(jnp.int8)

    y = conv(y, q2, [(1, 1), (1, 1)], pet=jnp.int32).astype(jnp.float32) \
        * (s_y1 * sw2) + b2
    y = jax.nn.relu(y)
    y = jnp.clip(jnp.round(y / s_y2), -127, 127).astype(jnp.int8)

    y = conv(y, q3, pet=jnp.int32).astype(jnp.float32) * (s_y2 * sw3) + b3
    y = jax.nn.relu(y + x_q.astype(jnp.float32) * s_x)
    return jnp.clip(jnp.round(y / s_out), -127, 127).astype(jnp.int8)


def bench(run, args, tag):
    t0 = time.time()
    float(run(*args))
    compile_s = time.time() - t0
    best = np.inf
    for _ in range(4):
        t0 = time.time()
        float(run(*args))
        best = min(best, time.time() - t0)
    per_op_ms = (best - 0.030) * 1e3 / ITERS
    print(f"  {tag:6s} compile {compile_s:6.1f}s  best {best*1e3:8.2f}ms"
          f"  -> {per_op_ms:7.3f} ms/op  ({per_op_ms/B*1e3:6.1f} us/img)")
    return per_op_ms


def main():
    print("device:", jax.devices()[0])
    rs = np.random.RandomState(0)
    for name, H, W, cin, cmid in SHAPES:
        x = jnp.asarray(rs.randn(B, H, W, cin), jnp.bfloat16)
        ws = tuple(jnp.asarray(a, jnp.float32) for a in (
            rs.randn(cin, cmid) * 0.05, rs.randn(cmid) * 0.05,
            rs.randn(3, 3, cmid, cmid) * 0.05, rs.randn(cmid) * 0.05,
            rs.randn(cmid, cin) * 0.05, rs.randn(cin) * 0.05))
        print(f"{name}: x={tuple(x.shape)} cmid={cmid}")

        @jax.jit
        def run_bf16(x, ws):
            def body(h, _):
                return bf16_block(h, ws), None
            h, _ = jax.lax.scan(body, x, None, length=ITERS)
            return jnp.sum(h.astype(jnp.float32))

        t_bf16 = bench(run_bf16, (x, ws), "bf16")

        # static scales from the data (what calibration would find)
        s_x = jnp.float32(3.0 / 127.0)
        x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                       -127, 127).astype(jnp.int8)

        @jax.jit
        def run_int8(x_q, ws):
            def body(h, _):
                return int8_block(h, s_x, ws, s_x, s_x, s_x), None
            h, _ = jax.lax.scan(body, x_q, None, length=ITERS)
            return jnp.sum(h.astype(jnp.float32))

        t_int8 = bench(run_int8, (x_q, ws), "int8")
        print(f"  speedup {t_bf16 / t_int8:5.2f}x")


if __name__ == "__main__":
    main()
