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
    ap.add_argument("--train", action="store_true",
                    help="benchmark the training step instead of inference")
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
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(rng, x)

    if args.train:
        import numpy as np

        from glsdet_tpu.models import VISDRONE_PROXIES
        from glsdet_tpu.train import (TrainState, init_boiw,
                                      make_gfl_train_step,
                                      make_mpdet_train_step,
                                      make_yolox_train_step, yolox_sgd,
                                      yolox_warm_cos)
        from glsdet_tpu.train.loop import build_optimizer, family_strides

        tx = build_optimizer(cfg, 1000)
        boiw = None
        if cfg.model.family == "mpdet":
            boiw = init_boiw(rng, cfg.model.num_classes,
                             cfg.model.num_words, cfg.model.feat_channels,
                             cfg.model.proxies_list)
        state = TrainState.create(variables, tx, rng, boiw=boiw)
        G = 50
        batch = {
            "images": x,
            "gt_boxes": jnp.tile(
                jnp.asarray([[32.0, 32, 96, 96]]),
                (args.batch_size, G, 1)),
            "gt_labels": jnp.zeros((args.batch_size, G), jnp.int32),
            "gt_valid": jnp.zeros((args.batch_size, G), bool
                                  ).at[:, :8].set(True),
        }
        if cfg.model.family == "mpdet":
            step = jax.jit(make_mpdet_train_step(
                model, tx, cfg.data.img_hw, cfg.model.num_classes,
                cfg.model.proxies_list))
        elif cfg.model.family == "gfl":
            step = jax.jit(make_gfl_train_step(
                model, tx, cfg.data.img_hw, cfg.model.num_classes))
        else:
            step = jax.jit(make_yolox_train_step(
                model, tx, cfg.data.img_hw,
                strides=family_strides(cfg.model.family)))
        for _ in range(args.warmup):
            state, m = step(state, batch)
        float(m["loss"])  # real host fetch: the tunnel's
        # block_until_ready can return before remote execution finishes
        t0 = time.time()
        for _ in range(args.iters):
            state, m = step(state, batch)
        float(m["loss"])
        dt = time.time() - t0
        n = args.iters * args.batch_size
        print(f"{cfg.name} TRAIN: {n / dt:.2f} images/sec "
              f"({1000 * dt / args.iters:.1f} ms/step, batch "
              f"{args.batch_size}) on {jax.devices()[0]}")
        return

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
        out = forward(x)
    float(out["scores"][0, 0])  # real host fetch (tunnel-safe sync)

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
    t0 = time.time()
    for _ in range(args.iters):
        out = forward(x)
    float(out["scores"][0, 0])
    elapsed = time.time() - t0
    if args.trace_dir:
        jax.profiler.stop_trace()

    n = args.iters * args.batch_size
    print(f"{cfg.name}: {n / elapsed:.2f} images/sec "
          f"({1000 * elapsed / n:.2f} ms/img) on {jax.devices()[0]}")


if __name__ == "__main__":
    main()
