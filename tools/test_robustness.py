#!/usr/bin/env python
"""Corruption-robustness benchmark (COCO-C style).

Behavioral reference: ``yolox-ufp/tools/analysis_tools/test_robustness.py``
(evaluate under every corruption x severity) + ``robustness_eval.py``
(aggregate to mPC / rPC).  Uses the self-contained corruption set in
``glsdet_tpu/data/corruptions.py``; reports, per corruption, AP at each
severity, then:

- ``clean AP``: severity-0 baseline
- ``mPC``: mean AP over all (corruption, severity>=1) cells
- ``rPC``: mPC / clean AP

    python tools/test_robustness.py coarse_det --ckpt ... \
        --ann val.json --img-root images --severities 1 3 5
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--ckpt", required=False)
    ap.add_argument("--ann", required=True)
    ap.add_argument("--img-root", required=True)
    ap.add_argument("--corruptions", nargs="*", default=None,
                    help="subset to run (default: full benchmark set)")
    ap.add_argument("--severities", type=int, nargs="*",
                    default=[1, 2, 3, 4, 5])
    ap.add_argument("--max-images", type=int)
    ap.add_argument("--use-ema", action="store_true")
    ap.add_argument("--out", default=None, help="write the result grid "
                                                "as json")
    ap.add_argument("--cfg-options", nargs="*", metavar="KEY=VAL")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from glsdet_tpu.config import (apply_overrides, get_config,
                                   parse_cfg_options)
    from glsdet_tpu.data.coco import CocoDataset
    from glsdet_tpu.data.corruptions import (BENCHMARK_CORRUPTIONS,
                                             CorruptedDataset)
    from glsdet_tpu.eval.runner import run_eval
    from glsdet_tpu.train.loop import build_model, build_optimizer

    cfg = get_config(args.config)
    apply_overrides(cfg, parse_cfg_options(args.cfg_options))
    dataset = CocoDataset(args.ann, args.img_root)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    init_hw = (min(cfg.data.img_hw[0], 256), min(cfg.data.img_hw[1], 256))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        rng, jnp.zeros((1, *init_hw, 3), jnp.float32))
    if args.ckpt:
        from glsdet_tpu.train.loop import load_weights, make_state_template

        tx = build_optimizer(cfg, 1000)
        state = make_state_template(cfg, variables, tx, rng)
        state, n_loaded, _ = load_weights(args.ckpt, state)
        assert n_loaded > 0, f"no matching weights in {args.ckpt}"
        params = state.ema_params if args.use_ema else state.params
        variables = {"params": params, "batch_stats": state.batch_stats}

    family = "yolox" if cfg.model.family == "yolox" else "gfl"
    apply_fn = lambda v, images: model.apply(v, images, train=False)

    def ap_for(ds):
        result, _ = run_eval(
            ds, apply_fn, family, cfg.data.img_hw, cfg.model.num_classes,
            batch_size=cfg.data.batch_size, score_thr=cfg.eval.score_thr,
            nms_iou=cfg.eval.nms_iou, max_dets=cfg.eval.max_dets,
            max_images=args.max_images, variables=variables,
            verbose=False)
        return result.ap

    names = args.corruptions or list(BENCHMARK_CORRUPTIONS)
    grid = {}
    clean = ap_for(dataset)
    print(f"clean AP@[.5:.95] = {clean:.4f}")
    for name in names:
        row = []
        for sev in args.severities:
            ap_cs = ap_for(CorruptedDataset(dataset, name, sev))
            row.append(ap_cs)
            print(f"  {name:18s} sev {sev}: AP = {ap_cs:.4f}", flush=True)
        grid[name] = row
    cells = [v for row in grid.values() for v in row]
    mpc = float(np.mean(cells)) if cells else float("nan")
    rpc = mpc / clean if clean > 0 else float("nan")
    print(f"mPC = {mpc:.4f}   rPC = {rpc:.4f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"clean_ap": clean, "severities": args.severities,
                       "grid": grid, "mPC": mpc, "rPC": rpc}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
