#!/usr/bin/env python
"""UFP dataset builder CLI.

Behavioral reference: ``UFPMP-Det-Tools/build_dataset/UFP_VisDrone2COCO.py``
— run the trained coarse detector over the train split, UFP-pack each
image's detections (scale 1.5 eval / 2.0 dataset-build per myufp_eval.py:332),
blank VisDrone ignore regions, write packed mosaic images + re-projected
COCO annotations (keep GT with IoF > 0.9 against a region;
bbox -> [n_x + (x - x1) * s, n_y + (y - y1) * s, w * s, h * s]).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("coarse_cfg")
    ap.add_argument("coarse_ckpt")
    ap.add_argument("ann_file")
    ap.add_argument("img_root")
    ap.add_argument("out_dir")
    ap.add_argument("--scale", type=float, default=2.0)
    ap.add_argument("--iof-thr", type=float, default=0.9)
    ap.add_argument("--max-images", type=int)
    ap.add_argument("--cfg-options", nargs="*", metavar="KEY=VAL")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from glsdet_tpu.config import get_config
    from glsdet_tpu.data.coco import CocoDataset, normalize
    from glsdet_tpu.eval.postprocess import yolox_postprocess
    from glsdet_tpu.train.loop import build_model, build_optimizer, restore_checkpoint
    from glsdet_tpu.train.state import TrainState
    from glsdet_tpu.native import unified_foreground_packing_native as \
        unified_foreground_packing

    rng = jax.random.PRNGKey(0)
    cfg = get_config(args.coarse_cfg)
    from glsdet_tpu.config import apply_overrides, parse_cfg_options

    apply_overrides(cfg, parse_cfg_options(args.cfg_options))
    model = build_model(cfg)
    init_hw = (min(cfg.data.img_hw[0], 256), min(cfg.data.img_hw[1], 256))
    sample = jnp.zeros((1, *init_hw, 3), jnp.float32)
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False))(rng, sample)
    if args.coarse_ckpt and args.coarse_ckpt != "none":
        from glsdet_tpu.train.loop import make_state_template

        tx = build_optimizer(cfg, 1000)
        state = make_state_template(cfg, variables, tx, rng)
        state = restore_checkpoint(args.coarse_ckpt, state)
        variables = {"params": state.ema_params,
                     "batch_stats": state.batch_stats}

    @jax.jit
    def _fwd(v, images):
        cls, reg, obj = model.apply(v, images, train=False)
        return yolox_postprocess(cls, reg, obj, cfg.data.img_hw,
                                 score_thr=cfg.eval.coarse_score_thr,
                                 max_dets=200)

    def forward(images):
        return _fwd(variables, images)

    ds = CocoDataset(args.ann_file, args.img_root)
    img_dir = os.path.join(args.out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    ch, cw = cfg.data.img_hw

    images_out, annos_out = [], []
    ann_id = 1
    for n, rec in enumerate(ds.records):
        if args.max_images and n >= args.max_images:
            break
        img = ds.load_image(rec)
        h0, w0 = img.shape[:2]
        resized = cv2.resize(img, (cw, ch))
        out = forward(jnp.asarray(normalize(resized)[None]))
        valid = np.asarray(out["valid"][0])
        boxes = np.asarray(out["boxes"][0])[valid]
        boxes *= np.array([w0 / cw, h0 / ch] * 2, np.float32)

        # blank ignore regions before packing (UFP_VisDrone2COCO.py:84-92)
        masked = img.copy()
        for ig in ds.ignore_regions.get(rec.img_id, []):
            x1, y1, x2, y2 = (int(v) for v in ig)
            masked[max(y1, 0):max(y2, 0), max(x1, 0):max(x2, 0)] = 0

        regions, mw, mh = unified_foreground_packing(
            boxes.astype(np.float32), args.scale, (w0, h0))
        if not regions:
            continue
        mh_i, mw_i = int(mh), int(mw)
        mosaic = np.zeros((mh_i, mw_i, 3), np.uint8)
        for r in regions:
            x1, y1, w, h = int(r.x1), int(r.y1), int(r.w), int(r.h)
            nx, ny, f = int(r.new_x), int(r.new_y), int(r.scale_factor)
            crop = masked[max(y1, 0):y1 + h, max(x1, 0):x1 + w]
            if crop.size == 0 or w * f <= 0 or h * f <= 0:
                continue
            crop = cv2.resize(crop, (w * f, h * f))
            ph = min(h * f, mh_i - ny)
            pw = min(w * f, mw_i - nx)
            if ph <= 0 or pw <= 0:
                continue
            mosaic[ny:ny + ph, nx:nx + pw] = crop[:ph, :pw]

        fname = f"ufp_{rec.img_id:07d}.jpg"
        cv2.imwrite(os.path.join(img_dir, fname),
                    cv2.cvtColor(mosaic, cv2.COLOR_RGB2BGR))
        img_id_new = len(images_out) + 1
        images_out.append({"id": img_id_new, "file_name": fname,
                           "width": int(mw), "height": int(mh)})

        # re-project GT annotations into mosaic coords
        for gb, gl in zip(rec.boxes, rec.labels):
            gx1, gy1, gx2, gy2 = gb
            g_area = max((gx2 - gx1) * (gy2 - gy1), 1e-9)
            for r in regions:
                ix1 = max(gx1, r.x1)
                iy1 = max(gy1, r.y1)
                ix2 = min(gx2, r.x1 + r.w)
                iy2 = min(gy2, r.y1 + r.h)
                inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                # min-area IoF, exactly the reference builder's
                # compute_iof gate (UFP_VisDrone2COCO.py:21-35, :187)
                denom = max(min(g_area, r.w * r.h), 1e-9)
                if inter / denom <= args.iof_thr:
                    continue
                s = r.scale_factor
                nb = [r.new_x + (gx1 - r.x1) * s, r.new_y + (gy1 - r.y1) * s,
                      (gx2 - gx1) * s, (gy2 - gy1) * s]
                annos_out.append({
                    "id": ann_id, "image_id": img_id_new,
                    "category_id": ds.cat_ids[int(gl)],
                    "bbox": [float(v) for v in nb],
                    "area": float(nb[2] * nb[3]), "iscrowd": 0,
                })
                ann_id += 1
                break

    out_json = {
        "images": images_out,
        "annotations": annos_out,
        "categories": [
            {"id": cid, "name": n, "supercategory": "none"}
            for cid, n in zip(ds.cat_ids, ds.class_names)
        ],
    }
    with open(os.path.join(args.out_dir, "ufp_train.json"), "w") as f:
        json.dump(out_json, f)
    print(f"wrote {len(images_out)} packed images, "
          f"{len(annos_out)} annotations to {args.out_dir}")


if __name__ == "__main__":
    main()
