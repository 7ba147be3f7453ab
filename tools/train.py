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
import logging


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="named config (coarse_det, mp_det_res50, ...)")
    ap.add_argument("--ann", help="train annotation json")
    ap.add_argument("--img-root", help="train image root")
    ap.add_argument("--work-dir")
    ap.add_argument("--resume", default="")
    ap.add_argument("--load-from", default="",
                    help="weights-only init checkpoint (shape-matched "
                         "partial load; --resume restores full state)")
    ap.add_argument("--val-ann", help="validation annotation json")
    ap.add_argument("--val-img-root")
    ap.add_argument("--seed", type=int)
    ap.add_argument("--max-steps", type=int, help="truncate (smoke tests)")
    ap.add_argument("--cfg-options", nargs="*", metavar="KEY=VAL")
    ap.add_argument("--dist-coordinator", default=None,
                    metavar="HOST:PORT",
                    help="multi-host coordinator address "
                         "(tools/dist_train.sh --launcher analog; "
                         "defaults from GLSDET_COORDINATOR / SLURM env)")
    ap.add_argument("--dist-num-processes", type=int, default=None)
    ap.add_argument("--dist-process-id", type=int, default=None)
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    from glsdet_tpu.parallel.mesh import maybe_init_distributed

    dist = maybe_init_distributed(args.dist_coordinator,
                                  args.dist_num_processes,
                                  args.dist_process_id)

    from glsdet_tpu.config import (apply_overrides, get_config,
                                   parse_cfg_options)

    cfg = get_config(args.config)
    if args.ann:
        cfg.data.ann_file = args.ann
    if args.img_root:
        cfg.data.img_root = args.img_root
    if args.work_dir:
        cfg.train.work_dir = args.work_dir
    if args.resume:
        cfg.train.resume = args.resume
    if args.load_from:
        cfg.train.load_from = args.load_from
    if args.seed is not None:
        cfg.train.seed = args.seed
    apply_overrides(cfg, parse_cfg_options(args.cfg_options))

    from glsdet_tpu.train.loop import build_model, family_strides, train

    eval_fn = None
    if args.val_ann:
        cfg.data.val_ann_file = args.val_ann
        cfg.data.val_img_root = args.val_img_root or args.img_root

        from glsdet_tpu.data.coco import CocoDataset
        from glsdet_tpu.eval.runner import run_eval

        val_ds = CocoDataset(cfg.data.val_ann_file, cfg.data.val_img_root)
        model = build_model(cfg)
        fam = "yolox" if cfg.model.family in ("yolox", "ffa") else "gfl"

        def eval_fn(state, epoch):
            variables = {"params": state.ema_params,
                         "batch_stats": state.batch_stats}
            res, stats = run_eval(
                val_ds,
                lambda v, images: model.apply(v, images, train=False),
                cfg.model.family if fam == "yolox" else "gfl",
                cfg.data.img_hw, cfg.model.num_classes,
                batch_size=cfg.data.batch_size,
                score_thr=cfg.eval.score_thr, nms_iou=cfg.eval.nms_iou,
                max_dets=cfg.eval.max_dets, variables=variables)
            print(f"epoch {epoch}: AP={res.ap:.4f} AP50={res.ap50:.4f}")

    train(cfg, max_steps=args.max_steps, eval_fn=eval_fn)

    if dist:
        # barrier before exit: without it the coordinator (process 0)
        # can vanish while other ranks still poll job state (GRPC noise)
        import jax

        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
