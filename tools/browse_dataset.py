#!/usr/bin/env python
"""Dataset browser: dump annotated/augmented samples to disk.

Behavioral reference: ``yolox-ufp/tools/misc/browse_dataset.py`` — render
the training pipeline's output (post-augmentation) with GT boxes drawn,
for visual sanity checks of the data layer.
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
    ap.add_argument("img_root")
    ap.add_argument("out_dir")
    ap.add_argument("--num", type=int, default=10)
    ap.add_argument("--img-hw", type=int, nargs=2, default=[640, 640])
    ap.add_argument("--no-aug", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import cv2

    from glsdet_tpu.data.coco import CocoDataset, IMAGENET_MEAN, IMAGENET_STD
    from glsdet_tpu.data.loader import TrainPipeline
    from glsdet_tpu.utils.visualize import draw_detections

    ds = CocoDataset(args.ann_file, args.img_root)
    pipe = TrainPipeline(ds, tuple(args.img_hw),
                         mosaic=not args.no_aug,
                         enable_mixup=not args.no_aug,
                         hsv=not args.no_aug)
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    for i in range(min(args.num, len(ds))):
        sample = pipe(i, rng)
        img = (sample["images"] * IMAGENET_STD + IMAGENET_MEAN)
        img = np.clip(img, 0, 255).astype(np.uint8)
        valid = sample["gt_valid"]
        drawn = draw_detections(
            img, sample["gt_boxes"][valid],
            np.ones(int(valid.sum())), sample["gt_labels"][valid],
            ds.class_names, score_thr=0.0)
        cv2.imwrite(os.path.join(args.out_dir, f"sample_{i:04d}.jpg"),
                    cv2.cvtColor(drawn, cv2.COLOR_RGB2BGR))
    print(f"wrote {min(args.num, len(ds))} samples to {args.out_dir}")


if __name__ == "__main__":
    main()
