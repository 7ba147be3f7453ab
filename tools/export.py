#!/usr/bin/env python
"""Model export CLI — the deployment-path analog of the reference's
``tools/deployment/pytorch2onnx.py`` / ``onnx2tensorrt.py``.

TPU-native deployment serializes the jitted forward (model + decode +
NMS) as StableHLO via ``jax.export`` — a portable, versioned artifact
loadable from C++ (PJRT) or python without the flax module tree, the
role ONNX plays for the reference.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("out_path", help="output .stablehlo file")
    ap.add_argument("--ckpt")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--with-nms", action="store_true",
                    help="export forward+decode+NMS (end-to-end)")
    ap.add_argument("--check", action="store_true",
                    help="round-trip: deserialize and re-run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from glsdet_tpu.config import get_config
    from glsdet_tpu.eval.postprocess import gfl_postprocess, yolox_postprocess
    from glsdet_tpu.train.loop import build_model, build_optimizer, restore_checkpoint
    from glsdet_tpu.train.state import TrainState

    cfg = get_config(args.config)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((args.batch_size, *cfg.data.img_hw, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(rng, x)
    if args.ckpt:
        tx = build_optimizer(cfg, 1000)
        state = TrainState.create(variables, tx, rng)
        state = restore_checkpoint(args.ckpt, state)
        variables = {"params": state.ema_params,
                     "batch_stats": state.batch_stats}

    if args.with_nms:
        if cfg.model.family == "yolox":
            def fn(images):
                cls, reg, obj = model.apply(variables, images, train=False)
                return yolox_postprocess(cls, reg, obj, cfg.data.img_hw,
                                         max_dets=cfg.eval.max_dets)
        else:
            def fn(images):
                cls, reg = model.apply(variables, images, train=False)
                return gfl_postprocess(cls, reg, cfg.data.img_hw,
                                       max_dets=cfg.eval.max_dets)
    else:
        def fn(images):
            return model.apply(variables, images, train=False)

    exported = jexport.export(jax.jit(fn))(x)
    blob = exported.serialize()
    with open(args.out_path, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob)} bytes to {args.out_path} "
          f"(platforms={exported.platforms})")

    if args.check:
        again = jexport.deserialize(blob)
        out = again.call(x)
        print("round-trip ok:",
              jax.tree.map(lambda a: tuple(a.shape), out))


if __name__ == "__main__":
    main()
