#!/usr/bin/env python
"""Offline re-evaluation of a saved detection-results json.

Behavioral reference: ``yolox-ufp/tools/analysis_tools/eval_metric.py``
— evaluate a dumped result file against a dataset without re-running
the model.  Input is the COCO-format detections json written by
``tools/test.py --out`` / ``--format-only`` (entries ``image_id``,
``category_id`` (1-based), ``bbox`` xywh, ``score``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def load_results(path, cat_to_contig=None):
    """dets json -> {image_id: (xywh (m,4), scores (m,), labels (m,))}

    ``cat_to_contig``: the dataset's category-id -> contiguous-label map
    (CocoDataset.cat_to_contig); identity-minus-nothing when None."""
    with open(path) as f:
        entries = json.load(f)
    by_img = {}
    for e in entries:
        cid = e["category_id"]
        label = cat_to_contig[cid] if cat_to_contig is not None else cid
        by_img.setdefault(int(e["image_id"]), []).append(
            (e["bbox"], e["score"], label))
    out = {}
    for img_id, rows in by_img.items():
        out[img_id] = (
            np.asarray([r[0] for r in rows], np.float64).reshape(-1, 4),
            np.asarray([r[1] for r in rows], np.float64),
            np.asarray([r[2] for r in rows], np.int64))
    return out


def dataset_gts(dataset):
    gts = {}
    for rec in dataset.records:
        b = rec.boxes
        gts[rec.img_id] = (
            np.concatenate([b[:, :2], b[:, 2:] - b[:, :2]], axis=1),
            rec.labels)
    return gts


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("results", help="detections json (tools/test.py --out)")
    ap.add_argument("--ann", required=True, help="COCO annotation json")
    ap.add_argument("--max-dets", type=int, nargs="*",
                    default=[10, 100, 500])
    args = ap.parse_args()

    from glsdet_tpu.data.coco import CocoDataset
    from glsdet_tpu.eval.coco_eval import CocoEvaluator, summarize

    dataset = CocoDataset(args.ann, img_root=".")
    dets = load_results(args.results, dataset.cat_to_contig)
    gts = dataset_gts(dataset)
    evaluator = CocoEvaluator(len(dataset.class_names),
                              max_dets=args.max_dets)
    result = evaluator.evaluate(gts, dets)
    print(summarize(result, dataset.class_names))


if __name__ == "__main__":
    main()
