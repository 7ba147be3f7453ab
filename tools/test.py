#!/usr/bin/env python
"""Single-model eval CLI (mmdet tools/test.py analog).

    python tools/test.py coarse_det --ckpt work_dirs/coarse_det/epoch_12 \
        --ann data/val.json --img-root data/images
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--ckpt", required=False, help="orbax checkpoint dir")
    ap.add_argument("--ann", required=True)
    ap.add_argument("--img-root", required=True)
    ap.add_argument("--max-images", type=int)
    ap.add_argument("--use-ema", action="store_true",
                    help="evaluate EMA weights (reference eval default)")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 dynamic-quantized forward (ops/quant.py)")
    ap.add_argument("--int8-static", action="store_true",
                    help="calibrated static-W8A8 forward with an explicit "
                         "int8 backbone (ops/quant_static.py; calibrates "
                         "on the first eval batches)")
    ap.add_argument("--int8-scales", default=None, metavar="PATH",
                    help="saved-scales json: load it instead of "
                         "calibrating when it exists, else calibrate and "
                         "save there (implies --int8-static)")
    ap.add_argument("--fuse-conv-bn", action="store_true",
                    help="fold BN into conv weights before inference "
                         "(reference tools/test.py flag)")
    ap.add_argument("--out", default=None,
                    help="dump COCO-format detection json")
    ap.add_argument("--show-dir", default=None,
                    help="write annotated prediction images here "
                         "(mmdet tools/test.py --show-dir)")
    ap.add_argument("--show-score-thr", type=float, default=0.3)
    ap.add_argument("--tta-scales", type=float, nargs="+", default=None,
                    metavar="S",
                    help="test-time augmentation scales (MultiScaleFlip"
                         "Aug, test_time_aug.py:11) — e.g. 0.75 1.0 1.25;"
                         " enables the TTA eval path")
    ap.add_argument("--tta-flip", action="store_true",
                    help="add horizontal-flip variants per TTA scale "
                         "(implies --tta-scales 1.0 when none given)")
    ap.add_argument("--cfg-options", nargs="*", metavar="KEY=VAL")
    ap.add_argument("--format-only", action="store_true",
                    help="write --out without evaluating")
    ap.add_argument("--dist-coordinator", default=None,
                    metavar="HOST:PORT",
                    help="multi-host coordinator (dist_test.sh analog; "
                         "defaults from GLSDET_COORDINATOR / SLURM env)")
    ap.add_argument("--dist-num-processes", type=int, default=None)
    ap.add_argument("--dist-process-id", type=int, default=None)
    args = ap.parse_args()
    if args.format_only and not args.out:
        ap.error("--format-only requires --out")

    from glsdet_tpu.parallel.mesh import maybe_init_distributed

    dist = maybe_init_distributed(args.dist_coordinator,
                                  args.dist_num_processes,
                                  args.dist_process_id)

    import jax
    import jax.numpy as jnp

    from glsdet_tpu.config import (apply_overrides, get_config,
                                   parse_cfg_options)
    from glsdet_tpu.data.coco import CocoDataset
    from glsdet_tpu.eval.runner import run_eval
    from glsdet_tpu.train.loop import build_model, build_optimizer
    from glsdet_tpu.train.state import TrainState

    cfg = get_config(args.config)
    apply_overrides(cfg, parse_cfg_options(args.cfg_options))
    dataset = CocoDataset(args.ann, args.img_root)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    init_hw = (min(cfg.data.img_hw[0], 256), min(cfg.data.img_hw[1], 256))
    sample = jnp.zeros((1, *init_hw, 3), jnp.float32)
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False))(rng, sample)

    if args.ckpt:
        from glsdet_tpu.train.loop import load_weights, make_state_template

        tx = build_optimizer(cfg, 1000)
        state = make_state_template(cfg, variables, tx, rng)
        # shape-matched weights load: accepts full training checkpoints
        # and stripped (weights-only) serving artifacts alike
        state, n_loaded, _ = load_weights(args.ckpt, state)
        assert n_loaded > 0, f"no matching weights in {args.ckpt}"
        params = state.ema_params if args.use_ema else state.params
        variables = {"params": params, "batch_stats": state.batch_stats}

    if args.fuse_conv_bn:
        from glsdet_tpu.models.fuse import fuse_conv_bn

        variables, n_fused = fuse_conv_bn(variables)
        print(f"fused {n_fused} conv+bn pairs")

    apply_fn = lambda v, images: model.apply(v, images, train=False)
    if args.int8_static or args.int8_scales:
        from glsdet_tpu.ops.quant_static import (load_scales, save_scales,
                                                 wrap_apply_quant8_static)

        if args.int8_scales and os.path.exists(args.int8_scales):
            print(f"loading int8 scales from {args.int8_scales}")
            scales = load_scales(args.int8_scales)
        else:
            import jax.numpy as jnp

            from glsdet_tpu.data.loader import EvalPipeline, eval_loader
            from glsdet_tpu.ops.quant_static import calibrate_scales

            batches = []
            for batch in eval_loader(
                    EvalPipeline(dataset, cfg.data.img_hw),
                    cfg.data.batch_size):
                batches.append(jnp.asarray(batch["images"]))
                if len(batches) >= 2:
                    break
            print(f"calibrating int8 scales on {len(batches)} batches ...")
            scales = calibrate_scales(apply_fn, variables, batches)
            if args.int8_scales:
                save_scales(args.int8_scales, scales)
                print(f"saved int8 scales to {args.int8_scales}")
        apply_fn = wrap_apply_quant8_static(apply_fn, scales)
    elif args.int8:
        from glsdet_tpu.ops.quant import wrap_apply_quant8

        apply_fn = wrap_apply_quant8(apply_fn)

    family = "yolox" if cfg.model.family == "yolox" else "gfl"
    if args.tta_scales or args.tta_flip:
        from glsdet_tpu.eval.runner import run_eval_tta

        run_eval_tta(
            dataset,
            apply_fn,
            family, cfg.data.img_hw, cfg.model.num_classes,
            tta_scales=tuple(args.tta_scales or [1.0]),
            tta_flip=args.tta_flip,
            score_thr=cfg.eval.score_thr, nms_iou=cfg.eval.nms_iou,
            max_dets=cfg.eval.max_dets, max_images=args.max_images,
            variables=variables, out_json=args.out,
            format_only=args.format_only)
    else:
        run_eval(
            dataset,
            apply_fn,
            family, cfg.data.img_hw, cfg.model.num_classes,
            batch_size=cfg.data.batch_size,
            score_thr=cfg.eval.score_thr, nms_iou=cfg.eval.nms_iou,
            max_dets=cfg.eval.max_dets, max_images=args.max_images,
            variables=variables, out_json=args.out,
            format_only=args.format_only,
            show_dir=args.show_dir, show_score_thr=args.show_score_thr)

    if dist:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
