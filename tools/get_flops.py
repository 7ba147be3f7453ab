#!/usr/bin/env python
"""Model FLOPs/params CLI.

Behavioral reference: ``yolox-ufp/tools/analysis_tools/get_flops.py`` —
report parameter count and per-forward FLOPs.  TPU-native: XLA's own
cost analysis of the lowered program (exact for the compiled graph,
rather than a per-module estimate).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", nargs="?", default="coarse_det")
    ap.add_argument("--shape", type=int, nargs=2, default=None,
                    help="input H W (default: config img_hw)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from glsdet_tpu.config import get_config
    from glsdet_tpu.train.loop import build_model

    cfg = get_config(args.config)
    hw = tuple(args.shape) if args.shape else cfg.data.img_hw
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False), rng, x)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))

    lowered = jax.jit(
        lambda v, x: model.apply(v, x, train=False)).lower(variables, x)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan")) if cost else float("nan")
    print(f"config: {cfg.name}  input: 1x{hw[0]}x{hw[1]}x3")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"flops:  {flops / 1e9:.2f} GFLOPs/image")


import numpy as np  # noqa: E402

if __name__ == "__main__":
    main()
