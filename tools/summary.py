#!/usr/bin/env python
"""Network structure summary CLI.

Behavioral reference: ``yolox-drone/tools/summary.py`` — print the
model's layer table (torchsummary).  TPU-native: flax ``nn.tabulate``
over the abstract init (no device work), plus total param/byte counts.
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
    ap.add_argument("--depth", type=int, default=2,
                    help="module nesting depth to show")
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from glsdet_tpu.config import get_config
    from glsdet_tpu.train.loop import build_model

    cfg = get_config(args.config)
    model = build_model(cfg)
    hw = tuple(args.shape) if args.shape else tuple(cfg.data.img_hw)
    x = jnp.zeros((1, *hw, 3), jnp.float32)

    print(model.tabulate(jax.random.PRNGKey(0), x, train=False,
                         depth=args.depth,
                         console_kwargs={"width": 120}))

    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    leaves = jax.tree_util.tree_leaves(variables.get("params", variables))
    n_params = sum(int(l.size) for l in leaves)
    n_bytes = sum(int(l.size) * l.dtype.itemsize for l in leaves)
    print(f"config: {args.config}  input: {hw[0]}x{hw[1]}")
    print(f"total params: {n_params / 1e6:.2f}M "
          f"({n_bytes / 1e6:.1f} MB at param dtype)")


if __name__ == "__main__":
    main()
