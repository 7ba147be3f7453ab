#!/usr/bin/env python
"""Training CLI.

Behavioral reference: ``yolox-ufp/tools/train.py`` — config + work-dir +
seed + resume + --cfg-options overrides.  Usage:

    python tools/train.py coarse_det --ann data/train.json --img-root data/images
    python tools/train.py mp_det_res50 --cfg-options train.base_lr=0.02
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import ast
import logging


def parse_cfg_options(pairs):
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="named config (coarse_det, mp_det_res50, ...)")
    ap.add_argument("--ann", help="train annotation json")
    ap.add_argument("--img-root", help="train image root")
    ap.add_argument("--work-dir")
    ap.add_argument("--resume", default="")
    ap.add_argument("--seed", type=int)
    ap.add_argument("--max-steps", type=int, help="truncate (smoke tests)")
    ap.add_argument("--cfg-options", nargs="*", metavar="KEY=VAL")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    from glsdet_tpu.config import apply_overrides, get_config

    cfg = get_config(args.config)
    if args.ann:
        cfg.data.ann_file = args.ann
    if args.img_root:
        cfg.data.img_root = args.img_root
    if args.work_dir:
        cfg.train.work_dir = args.work_dir
    if args.resume:
        cfg.train.resume = args.resume
    if args.seed is not None:
        cfg.train.seed = args.seed
    apply_overrides(cfg, parse_cfg_options(args.cfg_options))

    from glsdet_tpu.train.loop import train

    train(cfg, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
