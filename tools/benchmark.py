#!/usr/bin/env python
"""Inference speed benchmark CLI.

Behavioral reference: ``tools/analysis_tools/benchmark.py:58``
(measure_inference_speed: warmup then fps over the val loop) and
``yolox-drone/yolo.py:199`` (get_FPS).  Measures a single model's
forward+NMS images/sec and optionally a jax profiler trace.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", nargs="?", default="coarse_det")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--trace-dir", help="write a jax.profiler trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from glsdet_tpu.config import get_config
    from glsdet_tpu.eval.postprocess import gfl_postprocess, yolox_postprocess
    from glsdet_tpu.train.loop import build_model

    cfg = get_config(args.config)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((args.batch_size, *cfg.data.img_hw, 3), jnp.float32)
    variables = model.init(rng, x, train=False)

    if cfg.model.family == "yolox":
        @jax.jit
        def _fwd(v, images):
            cls, reg, obj = model.apply(v, images, train=False)
            return yolox_postprocess(cls, reg, obj, cfg.data.img_hw,
                                     max_dets=cfg.eval.max_dets)
    else:
        @jax.jit
        def _fwd(v, images):
            cls, reg = model.apply(v, images, train=False)
            return gfl_postprocess(cls, reg, cfg.data.img_hw,
                                   max_dets=cfg.eval.max_dets)

    def forward(images):
        return _fwd(variables, images)

    for _ in range(args.warmup):
        jax.block_until_ready(forward(x))

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
    t0 = time.time()
    for _ in range(args.iters):
        out = forward(x)
    jax.block_until_ready(out)
    elapsed = time.time() - t0
    if args.trace_dir:
        jax.profiler.stop_trace()

    n = args.iters * args.batch_size
    print(f"{cfg.name}: {n / elapsed:.2f} images/sec "
          f"({1000 * elapsed / n:.2f} ms/img) on {jax.devices()[0]}")


if __name__ == "__main__":
    main()
