#!/usr/bin/env python
"""Two-stage eval from pre-computed detection-txt directories.

Behavioral reference: ``yolox-ufp/myufp_eval.py`` (:316-335) — the
cross-repo glue: stage-1 (full-image) and stage-2 (UFP) detections are
read from per-image txt dirs written by another trainer (yolox-drone's
``get_map_txt``) instead of running the models; the driver re-runs UFP
packing to unmap stage-2 detections, fuses, and scores.

    python tools/ufp_eval_from_txt.py ann.json global_txt/ ufp_txt/ \
        --classes visdrone
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ann_file")
    ap.add_argument("global_dir", help="full-image detection txts")
    ap.add_argument("local_dir", help="UFP/local detection txts "
                                      "(already in original coords)")
    ap.add_argument("--classes", default="visdrone")
    ap.add_argument("--iou-thr", type=float, default=0.65)
    ap.add_argument("--filter-ignore", action="store_true",
                    help="drop detections centered in ignore regions "
                         "(UAVDT protocol, uav_eval.py)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from glsdet_tpu.apis import load_det_txt
    from glsdet_tpu.data.coco import CocoDataset
    from glsdet_tpu.data.uavdt import UAVDT_CLASSES
    from glsdet_tpu.data.visdrone import VISDRONE_CLASSES
    from glsdet_tpu.eval.coco_eval import CocoEvaluator, summarize
    from glsdet_tpu.eval.fusion import fuse_detections
    from glsdet_tpu.eval.ignore import filter_ignore_regions

    names = (list(VISDRONE_CLASSES) if args.classes == "visdrone"
             else list(UAVDT_CLASSES) if args.classes == "uavdt"
             else args.classes.split(","))
    ds = CocoDataset(args.ann_file, img_root="")

    def to_padded(boxes, scores, labels, k=500):
        b = np.zeros((k, 4), np.float32)
        s = np.zeros((k,), np.float32)
        l = np.zeros((k,), np.int32)
        v = np.zeros((k,), bool)
        n = min(len(boxes), k)
        b[:n], s[:n], l[:n], v[:n] = boxes[:n], scores[:n], labels[:n], True
        return {"boxes": jnp.asarray(b), "scores": jnp.asarray(s),
                "labels": jnp.asarray(l), "valid": jnp.asarray(v)}

    gts, dets = {}, {}
    for rec in ds.records:
        stem = os.path.splitext(os.path.basename(rec.file_name))[0]
        ga = os.path.join(args.global_dir, stem + ".txt")
        lo = os.path.join(args.local_dir, stem + ".txt")
        gb = (load_det_txt(ga, names) if os.path.exists(ga)
              else (np.zeros((0, 4), np.float32), np.zeros(0, np.float32),
                    np.zeros(0, np.int64)))
        lb = (load_det_txt(lo, names) if os.path.exists(lo)
              else (np.zeros((0, 4), np.float32), np.zeros(0, np.float32),
                    np.zeros(0, np.int64)))
        fused = fuse_detections(to_padded(*gb), to_padded(*lb),
                                args.iou_thr, 500)
        v = np.asarray(fused["valid"])
        boxes = np.asarray(fused["boxes"])[v]
        scores = np.asarray(fused["scores"])[v]
        labels = np.asarray(fused["labels"])[v]
        if args.filter_ignore:
            boxes, scores, labels = filter_ignore_regions(
                boxes, scores, labels,
                ds.ignore_regions.get(rec.img_id))
        xywh = (np.concatenate([boxes[:, :2], boxes[:, 2:] - boxes[:, :2]],
                               axis=1) if len(boxes) else
                np.zeros((0, 4)))
        dets[rec.img_id] = (xywh, scores, labels)
        b = rec.boxes
        gts[rec.img_id] = (
            np.concatenate([b[:, :2], b[:, 2:] - b[:, :2]], axis=1),
            rec.labels)

    res = CocoEvaluator(len(names)).evaluate(gts, dets)
    print(summarize(res, names))


if __name__ == "__main__":
    main()
