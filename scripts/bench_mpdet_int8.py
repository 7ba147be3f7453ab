"""MP-Det forward: bf16 vs static-int8 (ops/quant_static.py) on TPU.

The two-stage pipeline is MP-Det-forward-bound (~5 ms/img of the
8.5 ms/img steady state, ARCHITECTURE §9); this measures the end-to-end
model-forward gain of the static-W8A8 path at serving shapes.

Usage: python scripts/bench_mpdet_int8.py [B] [HW] [ITERS]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glsdet_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from glsdet_tpu.models import MPDet
from glsdet_tpu.ops.quant import wrap_apply_quant8
from glsdet_tpu.ops.quant_static import (calibrate_scales,
                                         wrap_apply_quant8_static)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
HW = int(sys.argv[2]) if len(sys.argv) > 2 else 1280
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def bench(apply_fn, variables, x, tag):
    @jax.jit
    def run(variables, x):
        def body(c, _):
            cls, reg = apply_fn(variables, x + c)
            acc = sum(jnp.sum(t.astype(jnp.float32)) for t in cls)
            return c + 1e-6, acc
        _, accs = jax.lax.scan(body, jnp.bfloat16(0), None, length=ITERS)
        return jnp.sum(accs)

    t0 = time.time()
    float(run(variables, x))
    compile_s = time.time() - t0
    best = np.inf
    for _ in range(4):
        t0 = time.time()
        float(run(variables, x))
        best = min(best, time.time() - t0)
    per_fwd_ms = (best - 0.030) * 1e3 / ITERS
    print(f"  {tag:8s} compile {compile_s:6.1f}s  best {best*1e3:8.2f}ms"
          f"  -> {per_fwd_ms:8.2f} ms/fwd  ({per_fwd_ms/B:6.2f} ms/img)")
    return per_fwd_ms


def main():
    print("device:", jax.devices()[0], f"B={B} HW={HW} ITERS={ITERS}")
    mp = MPDet(num_classes=10, depth=50, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    small = jnp.zeros((1, 128, 128, 3), jnp.float32)
    t0 = time.time()
    variables = jax.jit(lambda r, a: mp.init(r, a, train=False))(
        jax.random.PRNGKey(0), small)
    print(f"init {time.time()-t0:.1f}s")
    x = jnp.asarray(rs.randn(B, HW, HW, 3).astype(np.float32),
                    jnp.bfloat16)

    apply_fn = lambda v, im: mp.apply(v, im, train=False)
    t_bf16 = bench(apply_fn, variables, x, "bf16")

    t0 = time.time()
    scales = calibrate_scales(apply_fn, variables,
                              [x[:2].astype(jnp.float32)])
    print(f"  calibration: {len(scales)} scales in {time.time()-t0:.1f}s")
    t_static = bench(wrap_apply_quant8_static(apply_fn, scales),
                     variables, x, "int8-s")
    print(f"  static speedup {t_bf16 / t_static:5.2f}x")

    # part isolation: the rewrite only fires where a scale exists
    parts = {
        "backbone": lambda k: k.startswith("backbone"),
        "neck": lambda k: k.startswith("neck"),
        "head": lambda k: k.startswith("head"),
        "nohead": lambda k: not k.startswith("head"),
    }
    for part, pred in parts.items():
        sub = {k: v for k, v in scales.items() if pred(k)}
        t = bench(wrap_apply_quant8_static(apply_fn, sub),
                  variables, x, f"i8:{part}")
        print(f"  {part}-only speedup {t_bf16 / t:5.2f}x ({len(sub)})")

    t_dyn = bench(wrap_apply_quant8(apply_fn), variables, x, "int8-d")
    print(f"  dynamic speedup {t_bf16 / t_dyn:5.2f}x")


if __name__ == "__main__":
    main()
