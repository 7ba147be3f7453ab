#!/usr/bin/env python
"""Two-stage UFPMP eval CLI.

Behavioral reference: ``yolox-ufp/ufpmp_det_eval.py:196-205`` — six
positional arguments (coarse config, coarse ckpt, mp config, mp ckpt,
dataset annotation json, image root); runs the end-to-end pipeline over
the val set and prints COCO metrics with maxDets=[10,100,500].
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("first_cfg")
    ap.add_argument("first_ckpt")
    ap.add_argument("second_cfg")
    ap.add_argument("second_ckpt")
    ap.add_argument("dataset_anno")
    ap.add_argument("img_root")
    ap.add_argument("--max-images", type=int)
    ap.add_argument("--out-json", help="write COCO-format detections")
    ap.add_argument("--first-options", nargs="*", metavar="KEY=VAL")
    ap.add_argument("--second-options", nargs="*", metavar="KEY=VAL")
    ap.add_argument("--fuse-global", action="store_true",
                    help="global-local fusion: merge the coarse full-image "
                         "detections with the UFP detections via class-wise "
                         "NMS (merge_results.py semantics)")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 dynamic-quantized forwards (int8 MXU path; "
                         "ops/quant.py)")
    ap.add_argument("--int8-static", action="store_true",
                    help="calibrated static-W8A8 forwards with an explicit "
                         "int8 backbone (ops/quant_static.py; fastest "
                         "serving mode — calibrates on the first frames)")
    ap.add_argument("--int8-scales", default=None, metavar="PATH",
                    help="saved-scales json: load it instead of "
                         "calibrating when it exists, else calibrate and "
                         "save there (implies --int8-static)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from glsdet_tpu.config import get_config
    from glsdet_tpu.data.coco import CocoDataset
    from glsdet_tpu.eval.coco_eval import CocoEvaluator, summarize
    from glsdet_tpu.eval.two_stage import TwoStagePipeline
    from glsdet_tpu.train.loop import build_model, build_optimizer, restore_checkpoint
    from glsdet_tpu.train.state import TrainState

    rng = jax.random.PRNGKey(0)

    import ast

    def parse_opts(pairs):
        out = {}
        for pair in pairs or []:
            k, _, v = pair.partition("=")
            try:
                out[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                out[k] = v
        return out

    def load(cfg_name, ckpt, opts=None):
        from glsdet_tpu.config import apply_overrides

        cfg = get_config(cfg_name)
        if opts:
            apply_overrides(cfg, opts)
        model = build_model(cfg)
        init_hw = (min(cfg.data.img_hw[0], 256),
                   min(cfg.data.img_hw[1], 256))
        sample = jnp.zeros((1, *init_hw, 3), jnp.float32)
        variables = jax.jit(
            lambda r, x: model.init(r, x, train=False))(rng, sample)
        if ckpt and ckpt != "none":
            from glsdet_tpu.train.loop import make_state_template

            tx = build_optimizer(cfg, 1000)
            state = make_state_template(cfg, variables, tx, rng)
            state = restore_checkpoint(ckpt, state)
            variables = {"params": state.ema_params,
                         "batch_stats": state.batch_stats}
        return cfg, model, variables

    c_cfg, c_model, c_vars = load(args.first_cfg, args.first_ckpt,
                                  parse_opts(args.first_options))
    m_cfg, m_model, m_vars = load(args.second_cfg, args.second_ckpt,
                                  parse_opts(args.second_options))

    def make_pipe(quant8, act_scales=None):
        return TwoStagePipeline(
            lambda v, im: c_model.apply(v, im, train=False),
            lambda v, im: m_model.apply(v, im, train=False),
            c_cfg.data.img_hw,
            coarse_vars=c_vars, mp_vars=m_vars,
            num_classes=c_cfg.model.num_classes,
            ufp_scale=c_cfg.eval.ufp_scale,
            mosaic_buckets=c_cfg.eval.mosaic_buckets,
            max_regions=c_cfg.eval.max_regions,
            bucket_policy=getattr(c_cfg.eval, "bucket_policy", "image"),
            pack_mode=getattr(c_cfg.eval, "pack_mode", "square"),
            coarse_score_thr=c_cfg.eval.coarse_score_thr,
            final_nms_thr=c_cfg.eval.chip_nms_iou,
            fuse_global=args.fuse_global,
            fusion_nms_thr=c_cfg.eval.fusion_nms_iou,
            quant8=quant8, act_scales=act_scales)

    int8_static = args.int8_static or args.int8_scales is not None
    pipe = make_pipe(False if int8_static else args.int8)

    dataset = CocoDataset(args.dataset_anno, args.img_root)

    if int8_static:
        from glsdet_tpu.ops.quant_static import load_scales, save_scales

        if args.int8_scales and os.path.exists(args.int8_scales):
            print(f"loading int8 scales from {args.int8_scales}")
            scales = load_scales(args.int8_scales)
        else:
            # calibrate on the first frames, rebuild with int8 applies
            calib = [dataset.load_image(r) for r in dataset.records[:4]]
            print("calibrating int8 activation scales on "
                  f"{len(calib)} frames ...")
            scales = pipe.calibrate_int8(calib)
            if args.int8_scales:
                save_scales(args.int8_scales, scales)
                print(f"saved int8 scales to {args.int8_scales}")
        pipe = make_pipe("static", scales)
    dets_by_img = {}
    coco_dets = []
    t0 = time.time()
    n = 0
    records = dataset.records
    if args.max_images:
        records = records[:args.max_images]
    # --fuse-global now runs INSIDE the pipeline programs (the coarse
    # detections from stage 1 fuse on-device in the mosaic-stage dispatch;
    # merge_results.py semantics, no second coarse forward).
    CHUNK = 8  # pipelined batches overlap host packing with device work
    for start in range(0, len(records), CHUNK):
        chunk = records[start:start + CHUNK]
        imgs = [dataset.load_image(r) for r in chunk]
        outs = pipe.run_batch(imgs)
        for rec, out in zip(chunk, outs):
            b = out["boxes"]
            xywh = np.concatenate(
                [b[:, :2], b[:, 2:] - b[:, :2]], axis=1) \
                if len(b) else np.zeros((0, 4))
            dets_by_img[rec.img_id] = (xywh, out["scores"], out["labels"])
            for box, s, l in zip(xywh, out["scores"], out["labels"]):
                coco_dets.append({
                    "image_id": rec.img_id,
                    "category_id": dataset.cat_ids[int(l)],
                    "bbox": [float(v) for v in box],
                    "score": float(s),
                })
            n += 1
    elapsed = time.time() - t0
    print(f"{n} images in {elapsed:.1f}s "
          f"({n / max(elapsed, 1e-9):.2f} img/s)")

    gts = {}
    for rec in dataset.records:
        if rec.img_id not in dets_by_img:
            continue
        b = rec.boxes
        gts[rec.img_id] = (
            np.concatenate([b[:, :2], b[:, 2:] - b[:, :2]], axis=1),
            rec.labels)
    res = CocoEvaluator(dataset_num_classes(dataset)).evaluate(
        gts, dets_by_img)
    print(summarize(res, dataset.class_names))

    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(coco_dets, f)


def dataset_num_classes(ds):
    return len(ds.cat_ids)


if __name__ == "__main__":
    main()
