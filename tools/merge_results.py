#!/usr/bin/env python
"""Global–local result fusion CLI.

Behavioral reference: ``yolox-drone/merge_results.py`` — merge two
detection-json files (full-image "global" pass and UFP "local" pass),
class-wise batched NMS at IoU 0.65 (or gaussian soft-NMS), write the
fused COCO-format detections.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
from collections import defaultdict

import numpy as np


def load_dets(path):
    with open(path) as f:
        dets = json.load(f)
    by_img = defaultdict(list)
    for d in dets:
        by_img[d["image_id"]].append(d)
    return by_img


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("global_json")
    ap.add_argument("local_json")
    ap.add_argument("out_json")
    ap.add_argument("--iou-thr", type=float, default=0.65)
    ap.add_argument("--soft", action="store_true", help="gaussian soft-NMS")
    ap.add_argument("--max-dets", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from glsdet_tpu.eval.fusion import fuse_detections

    ga = load_dets(args.global_json)
    lb = load_dets(args.local_json)
    img_ids = sorted(set(ga) | set(lb))

    def to_padded(dlist, k):
        boxes = np.zeros((k, 4), np.float32)
        scores = np.zeros((k,), np.float32)
        labels = np.zeros((k,), np.int32)
        valid = np.zeros((k,), bool)
        for i, d in enumerate(dlist[:k]):
            x, y, w, h = d["bbox"]
            boxes[i] = [x, y, x + w, y + h]
            scores[i] = d["score"]
            labels[i] = d["category_id"]
            valid[i] = True
        return {"boxes": jnp.asarray(boxes), "scores": jnp.asarray(scores),
                "labels": jnp.asarray(labels), "valid": jnp.asarray(valid)}

    k = args.max_dets
    fused_out = []
    for img_id in img_ids:
        da = to_padded(ga.get(img_id, []), k)
        db = to_padded(lb.get(img_id, []), k)
        f = fuse_detections(da, db, args.iou_thr, k, use_soft=args.soft)
        v = np.asarray(f["valid"])
        boxes = np.asarray(f["boxes"])[v]
        scores = np.asarray(f["scores"])[v]
        labels = np.asarray(f["labels"])[v]
        for b, s, l in zip(boxes, scores, labels):
            fused_out.append({
                "image_id": int(img_id),
                "category_id": int(l),
                "bbox": [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])],
                "score": float(s),
            })
    with open(args.out_json, "w") as f:
        json.dump(fused_out, f)
    print(f"fused {len(img_ids)} images -> {len(fused_out)} detections")


if __name__ == "__main__":
    main()
