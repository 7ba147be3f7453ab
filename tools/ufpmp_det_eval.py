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

    pipe = TwoStagePipeline(
        lambda v, im: c_model.apply(v, im, train=False),
        lambda v, im: m_model.apply(v, im, train=False),
        c_cfg.data.img_hw,
        coarse_vars=c_vars, mp_vars=m_vars,
        num_classes=c_cfg.model.num_classes,
        ufp_scale=c_cfg.eval.ufp_scale,
        mosaic_buckets=c_cfg.eval.mosaic_buckets,
        max_regions=c_cfg.eval.max_regions,
        coarse_score_thr=c_cfg.eval.coarse_score_thr,
        final_nms_thr=c_cfg.eval.chip_nms_iou)

    dataset = CocoDataset(args.dataset_anno, args.img_root)
    dets_by_img = {}
    coco_dets = []
    t0 = time.time()
    n = 0
    records = dataset.records
    if args.max_images:
        records = records[:args.max_images]
    if args.fuse_global:
        import jax.numpy as jnp

        from glsdet_tpu.eval.fusion import fuse_detections

        def to_padded(d, k=500):
            b = np.zeros((k, 4), np.float32)
            s_ = np.zeros((k,), np.float32)
            l = np.zeros((k,), np.int32)
            v = np.zeros((k,), bool)
            n_ = min(len(d["boxes"]), k)
            b[:n_], s_[:n_], l[:n_] = (d["boxes"][:n_], d["scores"][:n_],
                                       d["labels"][:n_])
            v[:n_] = True
            return {"boxes": jnp.asarray(b), "scores": jnp.asarray(s_),
                    "labels": jnp.asarray(l), "valid": jnp.asarray(v)}

    CHUNK = 8  # pipelined batches overlap host packing with device work
    for start in range(0, len(records), CHUNK):
        chunk = records[start:start + CHUNK]
        imgs = [dataset.load_image(r) for r in chunk]
        outs = pipe.run_batch(imgs)
        if args.fuse_global:
            # reference merge_results.py: concat global + local per image,
            # class-wise NMS @ fusion_nms_iou
            fused_outs = []
            for img, out in zip(imgs, outs):
                h0, w0 = img.shape[:2]
                ch, cw = c_cfg.data.img_hw
                g = pipe._coarse_full(jnp.asarray(img.astype(np.uint8)))
                gv = np.asarray(g["valid"][0])
                gb = np.asarray(g["boxes"][0])[gv]
                gb *= np.array([w0 / cw, h0 / ch] * 2, np.float32)
                gdet = {"boxes": gb,
                        "scores": np.asarray(g["scores"][0])[gv],
                        "labels": np.asarray(g["labels"][0])[gv]}
                f = fuse_detections(to_padded(gdet), to_padded(out),
                                    c_cfg.eval.fusion_nms_iou, 500)
                fv = np.asarray(f["valid"])
                fused_outs.append({
                    "boxes": np.asarray(f["boxes"])[fv],
                    "scores": np.asarray(f["scores"])[fv],
                    "labels": np.asarray(f["labels"])[fv],
                })
            outs = fused_outs
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
