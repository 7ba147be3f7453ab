#!/usr/bin/env python
"""COCO error analysis CLI.

Behavioral reference: ``yolox-ufp/tools/analysis_tools/coco_error_analysis.py``
— per-class precision-recall breakdown isolating error types: score at
strict IoU (0.75), loose IoU (0.5), localization-forgiven (0.1),
and with all false positives removed (upper bound).  Plots one PR panel
per class plus the overall panel.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
from collections import defaultdict

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ann_file")
    ap.add_argument("det_json")
    ap.add_argument("--out-dir", default="error_analysis")
    args = ap.parse_args()

    from glsdet_tpu.data.coco import CocoDataset
    from glsdet_tpu.eval.coco_eval import REC_THRS, CocoEvaluator

    ds = CocoDataset(args.ann_file, img_root="")
    gts = {}
    for rec in ds.records:
        b = rec.boxes
        gts[rec.img_id] = (
            np.concatenate([b[:, :2], b[:, 2:] - b[:, :2]], axis=1),
            rec.labels)
    with open(args.det_json) as f:
        raw = json.load(f)
    by_img = defaultdict(list)
    for d in raw:
        by_img[d["image_id"]].append(d)
    dets = {}
    for img_id, items in by_img.items():
        boxes = np.array([d["bbox"] for d in items], np.float64)
        scores = np.array([d["score"] for d in items])
        labels = np.array([ds.cat_to_contig[d["category_id"]]
                           for d in items], np.int64)
        dets[img_id] = (boxes, scores, labels)

    k = len(ds.class_names)
    # three evaluations: strict (.75), loose (.5), localization-forgiven (.1)
    res75 = CocoEvaluator(k, iou_thrs=np.array([0.75])).evaluate(gts, dets)
    res50 = CocoEvaluator(k, iou_thrs=np.array([0.5])).evaluate(gts, dets)
    res10 = CocoEvaluator(k, iou_thrs=np.array([0.1])).evaluate(gts, dets)

    os.makedirs(args.out_dir, exist_ok=True)
    aind = 0  # 'all' area, but precision tensor is (T,R,K,A,M)
    mind = 2  # largest maxDets
    rows = []
    for ki, name in enumerate(ds.class_names):
        p75 = res75.precision[0, :, ki, 0, mind]
        p50 = res50.precision[0, :, ki, 0, mind]
        p10 = res10.precision[0, :, ki, 0, mind]
        if (p50 < 0).all():
            continue
        c75 = float(np.mean(p75[p75 > -1])) if (p75 > -1).any() else 0.0
        c50 = float(np.mean(p50[p50 > -1])) if (p50 > -1).any() else 0.0
        c10 = float(np.mean(p10[p10 > -1])) if (p10 > -1).any() else 0.0
        rows.append((name, c75, c50, c10))
        print(f"{name:>18s}: AP75={c75:.3f}  AP50={c50:.3f}  "
              f"Loc-forgiven={c10:.3f}  "
              f"(loc error costs {c10 - c50:.3f}, "
              f"strictness costs {c50 - c75:.3f})")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for ki, name in enumerate(ds.class_names):
            p50 = res50.precision[0, :, ki, 0, mind]
            if (p50 < 0).all():
                continue
            plt.figure()
            for res, label in [(res75, "IoU .75"), (res50, "IoU .5"),
                               (res10, "IoU .1 (loc-forgiven)")]:
                p = res.precision[0, :, ki, 0, mind].copy()
                p[p < 0] = 0
                plt.plot(REC_THRS, p, label=label)
            plt.xlabel("recall")
            plt.ylabel("precision")
            plt.title(name)
            plt.legend()
            plt.grid(True)
            plt.savefig(os.path.join(args.out_dir, f"{name}.png"))
            plt.close("all")
        print(f"wrote PR panels to {args.out_dir}/")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
