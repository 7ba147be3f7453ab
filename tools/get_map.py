#!/usr/bin/env python
"""VOC-style mAP CLI from detection/ground-truth txt dirs.

Behavioral reference: ``yolox-drone/get_map.py`` + ``get_map_txt*.py`` —
scores ``detection-results/<id>.txt`` (lines ``<name> <conf> <x1> <y1>
<x2> <y2>``) against ``ground-truth/<id>.txt`` (lines ``<name> <x1> <y1>
<x2> <y2>``) at a chosen IoU; also reports COCO AP over the same dicts
(the get_coco_map analog).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def read_gt_txt(path, name_to_id):
    boxes, labels = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 5:
                continue
            boxes.append([float(v) for v in parts[-4:]])
            labels.append(name_to_id[" ".join(parts[:-4])])
    return (np.asarray(boxes, np.float64).reshape(-1, 4),
            np.asarray(labels, np.int64))


def read_det_txt(path, name_to_id):
    boxes, scores, labels = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 6:
                continue
            boxes.append([float(v) for v in parts[-4:]])
            scores.append(float(parts[-5]))
            labels.append(name_to_id[" ".join(parts[:-5])])
    return (np.asarray(boxes, np.float64).reshape(-1, 4),
            np.asarray(scores, np.float64),
            np.asarray(labels, np.int64))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("gt_dir")
    ap.add_argument("det_dir")
    ap.add_argument("--classes", default="visdrone",
                    help="'visdrone', 'uavdt', or comma-separated names")
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--coco", action="store_true",
                    help="also run COCO AP@[.5:.95]")
    args = ap.parse_args()

    from glsdet_tpu.data.uavdt import UAVDT_CLASSES
    from glsdet_tpu.data.visdrone import VISDRONE_CLASSES
    from glsdet_tpu.eval.voc_map import eval_voc_map

    if args.classes == "visdrone":
        names = list(VISDRONE_CLASSES)
    elif args.classes == "uavdt":
        names = list(UAVDT_CLASSES)
    else:
        names = args.classes.split(",")
    name_to_id = {n: i for i, n in enumerate(names)}

    gts, dets = {}, {}
    ids = sorted(os.path.splitext(f)[0]
                 for f in os.listdir(args.gt_dir) if f.endswith(".txt"))
    for i, img_id in enumerate(ids):
        gts[i] = read_gt_txt(
            os.path.join(args.gt_dir, img_id + ".txt"), name_to_id)
        det_path = os.path.join(args.det_dir, img_id + ".txt")
        if os.path.exists(det_path):
            dets[i] = read_det_txt(det_path, name_to_id)
        else:
            dets[i] = (np.zeros((0, 4)), np.zeros((0,)),
                       np.zeros((0,), np.int64))

    res = eval_voc_map(gts, dets, len(names), iou_thr=args.iou)
    print(f"mAP@{args.iou:.2f} = {res['map']:.4f}")
    for k, v in res["per_class"].items():
        print(f"  {names[k]:>18s}: AP={v['ap']:.4f} lamr={v['lamr']:.4f} "
              f"(gt {v['n_gt']}, det {v['n_det']})")

    if args.coco:
        from glsdet_tpu.eval.coco_eval import CocoEvaluator, summarize

        def to_xywh(b):
            return np.concatenate([b[:, :2], b[:, 2:] - b[:, :2]], axis=1)

        cgts = {k: (to_xywh(v[0]), v[1]) for k, v in gts.items()}
        cdets = {k: (to_xywh(v[0]), v[1], v[2]) for k, v in dets.items()}
        r = CocoEvaluator(len(names)).evaluate(cgts, cdets)
        print(summarize(r, names))


if __name__ == "__main__":
    main()
