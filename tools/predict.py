#!/usr/bin/env python
"""Unified prediction CLI: single image, directory sweep, video, FPS.

Behavioral reference: ``yolox-drone/tools/predict.py`` — one script
multiplexing predict / video / fps / dir_predict modes over the YOLO
facade.  Here the facade is ``glsdet_tpu.apis.Detector`` (single model)
or ``apis.TwoStageDetector`` (full UFPMP pipeline) selected by
``--mp-config``; modes are CLI flags instead of edit-in-place constants.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp")


def build_detector(args):
    from glsdet_tpu.apis import Detector, TwoStageDetector

    from glsdet_tpu.config import parse_cfg_options

    opts = parse_cfg_options(args.cfg_options)
    if args.mp_config:
        return TwoStageDetector(
            args.config, args.checkpoint,
            mp_config=args.mp_config, mp_checkpoint=args.mp_checkpoint,
            score_thr=args.score_thr,
            coarse_options=opts,
            mp_options=parse_cfg_options(args.mp_cfg_options))
    return Detector(args.config, args.checkpoint,
                    score_thr=args.score_thr, options=opts)


def annotate(det, image, score_thr):
    from glsdet_tpu.utils.visualize import draw_detections

    d = det.detect(image)
    return draw_detections(image, d["boxes"], d["scores"], d["labels"],
                           det.class_names, score_thr), d


def load_image(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def save_image(arr, path):
    from PIL import Image

    Image.fromarray(np.asarray(arr, np.uint8)).save(path)


def mode_predict(det, args):
    out, d = annotate(det, load_image(args.input), args.draw_thr)
    dst = args.output or (os.path.splitext(args.input)[0] + "_det.png")
    save_image(out, dst)
    n = int((np.asarray(d["scores"]) >= args.draw_thr).sum())
    print(f"{n} detections >= {args.draw_thr} -> {dst}")


def mode_dir_predict(det, args):
    os.makedirs(args.output or "img_out", exist_ok=True)
    out_dir = args.output or "img_out"
    names = sorted(f for f in os.listdir(args.input)
                   if f.lower().endswith(IMG_EXTS))
    if not names:
        raise SystemExit(f"no images under {args.input}")
    t0 = time.time()
    for i, name in enumerate(names):
        out, _ = annotate(det, load_image(os.path.join(args.input, name)),
                          args.draw_thr)
        save_image(out, os.path.join(out_dir,
                                     os.path.splitext(name)[0] + ".png"))
        print(f"[{i + 1}/{len(names)}] {name}")
    dt = time.time() - t0
    print(f"{len(names)} images in {dt:.1f}s -> {out_dir}/")


def mode_fps(det, args):
    image = load_image(args.input)
    det.detect(image)  # warmup/compile outside the timed loop
    t0 = time.time()
    for _ in range(args.test_interval):
        det.detect(image)
    fps = args.test_interval / (time.time() - t0)
    print(f"{args.test_interval} forwards: {fps:.2f} FPS "
          f"({1000.0 / fps:.1f} ms/img)")


def mode_video(det, args):
    import cv2

    src = 0 if args.input in (None, "0") else args.input
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        raise SystemExit(f"cannot open video source {src!r}")
    writer = None
    if args.output:
        fps = args.video_fps or cap.get(cv2.CAP_PROP_FPS) or 25.0
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        writer = cv2.VideoWriter(
            args.output, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    n, t0 = 0, time.time()
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            out, _ = annotate(det, rgb, args.draw_thr)
            bgr = cv2.cvtColor(np.asarray(out, np.uint8),
                               cv2.COLOR_RGB2BGR)
            if writer is not None:
                writer.write(bgr)
            n += 1
            if args.max_frames and n >= args.max_frames:
                break
    finally:
        cap.release()
        if writer is not None:
            writer.release()
    dt = time.time() - t0
    print(f"{n} frames in {dt:.1f}s ({n / max(dt, 1e-9):.2f} FPS)"
          + (f" -> {args.output}" if args.output else ""))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode",
                    choices=["predict", "dir_predict", "fps", "video"])
    ap.add_argument("input", nargs="?",
                    help="image path (predict/fps), image dir "
                         "(dir_predict), or video path / '0' for camera")
    ap.add_argument("--config", default="coarse_det")
    ap.add_argument("--checkpoint")
    ap.add_argument("--mp-config",
                    help="stage-2 config: run the full two-stage "
                         "UFPMP pipeline")
    ap.add_argument("--mp-checkpoint")
    ap.add_argument("--output", help="output image/dir/video path")
    ap.add_argument("--score-thr", type=float, default=None,
                    help="detector score threshold (default: config)")
    ap.add_argument("--draw-thr", type=float, default=0.3,
                    help="min score to draw")
    ap.add_argument("--test-interval", type=int, default=20,
                    help="fps mode: timed forwards")
    ap.add_argument("--video-fps", type=float, default=None)
    ap.add_argument("--max-frames", type=int, default=0,
                    help="video mode: stop after N frames (0 = all)")
    ap.add_argument("--cfg-options", nargs="*", metavar="KEY=VAL")
    ap.add_argument("--mp-cfg-options", nargs="*", metavar="KEY=VAL",
                    help="stage-2 overrides (with --mp-config)")
    args = ap.parse_args()
    if args.mode != "video" and not args.input:
        ap.error(f"mode {args.mode} requires an input path")

    det = build_detector(args)
    {"predict": mode_predict, "dir_predict": mode_dir_predict,
     "fps": mode_fps, "video": mode_video}[args.mode](det, args)


if __name__ == "__main__":
    main()
