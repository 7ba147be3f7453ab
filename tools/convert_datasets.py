#!/usr/bin/env python
"""Dataset converters CLI (VisDrone/UAVDT -> COCO).

Behavioral reference: ``UFPMP-Det-Tools/build_dataset/VisDrone2COCO.py``
and ``UAVDT2COCO.py`` (with the reference's parse/shape bugs fixed,
SURVEY.md §0).

    python tools/convert_datasets.py visdrone <root> <out.json>
    python tools/convert_datasets.py uavdt <root> <out.json> --split test
    python tools/convert_datasets.py images <img_dir> <out.json> \\
        --classes visdrone          # images2coco.py analog (no annos)
    python tools/convert_datasets.py coco2voc <ann.json> <dst_root>  \\
        # basetools format_converter/init_datasets analog (VOC skeleton)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset", choices=["visdrone", "uavdt", "voc",
                                        "images", "coco2voc"])
    ap.add_argument("root", help="dataset root (coco2voc: input json)")
    ap.add_argument("out_json", help="output json (coco2voc: dst root)")
    ap.add_argument("--split", default="train",
                    choices=["train", "val", "test", "trainval"])
    ap.add_argument("--image-dir", default="images")
    ap.add_argument("--anno-dir", default="annotations")
    ap.add_argument("--classes", default="visdrone",
                    help="voc only: 'visdrone', 'uavdt', or a "
                         "comma-separated class list")
    args = ap.parse_args()

    if args.dataset == "coco2voc":
        import json

        from glsdet_tpu.data.voc import coco_to_voc

        with open(args.root) as f:
            coco = json.load(f)
        n = coco_to_voc(coco, args.out_json, split=args.split)
        print(f"{n} xml annotations -> {args.out_json}/VOC2007")
        return
    if args.dataset == "images":
        from glsdet_tpu.data.coco import images_to_coco
        from glsdet_tpu.data.uavdt import UAVDT_CLASSES
        from glsdet_tpu.data.visdrone import VISDRONE_CLASSES

        names = {"visdrone": VISDRONE_CLASSES,
                 "uavdt": UAVDT_CLASSES}.get(
                     args.classes, tuple(args.classes.split(",")))
        coco = images_to_coco(args.root, args.out_json, names)
        print(f"{len(coco['images'])} images (no annotations) "
              f"-> {args.out_json}")
        return
    if args.dataset == "voc":
        from glsdet_tpu.data.uavdt import UAVDT_CLASSES
        from glsdet_tpu.data.visdrone import VISDRONE_CLASSES
        from glsdet_tpu.data.voc import voc_to_coco

        names = {"visdrone": VISDRONE_CLASSES,
                 "uavdt": UAVDT_CLASSES}.get(
                     args.classes, tuple(args.classes.split(",")))
        coco = voc_to_coco(args.root, args.out_json, names,
                           split=args.split)
    elif args.dataset == "visdrone":
        from glsdet_tpu.data.visdrone import visdrone_to_coco

        coco = visdrone_to_coco(args.root, args.out_json,
                                image_dir=args.image_dir,
                                anno_dir=args.anno_dir)
    else:
        from glsdet_tpu.data.uavdt import uavdt_to_coco

        coco = uavdt_to_coco(args.root, args.out_json, split=args.split)
    print(f"{len(coco['images'])} images, "
          f"{len(coco['annotations'])} annotations -> {args.out_json}")


if __name__ == "__main__":
    main()
