"""Single-stage eval runner: dataset -> jitted forward+NMS -> COCO metrics.

Behavioral reference: ``mmdet/apis/test.py:17`` (single_gpu_test loop) +
``CocoDataset.evaluate``.  The loop streams fixed-shape letterboxed
batches through one jitted program; detections are rescaled to original
coordinates on host and fed to the numpy COCO evaluator
(maxDets=[10,100,500] per ufpmp_det_eval.py:335).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.data.coco import CocoDataset
from glsdet_tpu.data.loader import EvalPipeline, eval_loader
from glsdet_tpu.eval.coco_eval import CocoEvaluator, CocoEvalResult, summarize
from glsdet_tpu.eval.postprocess import gfl_postprocess, yolox_postprocess


def _maybe_normalize(images):
    """Device-side normalize when the loader ships raw uint8 canvases
    (EvalPipeline(raw_uint8=True): 4x less transfer, no host normalize
    pass); already-normalized f32 passes through.  The dtype test is
    static under jit, so each input dtype is its own compiled program."""
    if images.dtype == jnp.uint8:
        from glsdet_tpu.data.coco import IMAGENET_MEAN, IMAGENET_STD

        return ((images.astype(jnp.float32) - jnp.asarray(IMAGENET_MEAN))
                / jnp.asarray(IMAGENET_STD))
    return images


def run_eval(
    dataset: CocoDataset,
    apply_fn: Callable,
    family: str,
    img_hw: Tuple[int, int],
    num_classes: int,
    batch_size: int = 8,
    score_thr: float = 0.01,
    nms_iou: float = 0.65,
    max_dets: int = 100,
    max_images: Optional[int] = None,
    verbose: bool = True,
    variables=None,
    strides=None,
    mesh=None,
    out_json: Optional[str] = None,
    format_only: bool = False,
    show_dir: Optional[str] = None,
    show_score_thr: float = 0.3,
) -> Tuple[Optional[CocoEvalResult], dict]:
    """apply_fn(variables, images) -> head outputs (pass ``variables``
    so weights stay jit arguments, not baked HLO constants); legacy
    apply_fn(images) accepted when ``variables`` is None.

    ``mesh``: optional jax Mesh — images are batch-sharded over its
    first axis and the jitted program runs data-parallel across chips,
    the XLA-collective replacement for the reference's multi_gpu_test +
    collect_results (mmdet/apis/test.py:70,118).
    """

    if family in ("yolox", "ffa"):
        yolox_strides = strides or ((4, 8, 16, 32) if family == "ffa"
                                    else (8, 16, 32))

        @jax.jit
        def _fwd(v, images):
            images = _maybe_normalize(images)
            out = apply_fn(v, images) if v is not None else apply_fn(images)
            cls, reg, obj = out
            return yolox_postprocess(cls, reg, obj, img_hw,
                                     strides=yolox_strides,
                                     score_thr=score_thr, iou_thr=nms_iou,
                                     max_dets=max_dets)
    else:
        @jax.jit
        def _fwd(v, images):
            images = _maybe_normalize(images)
            out = apply_fn(v, images) if v is not None else apply_fn(images)
            cls, reg = out
            return gfl_postprocess(cls, reg, img_hw, score_thr=score_thr,
                                   iou_thr=nms_iou, max_dets=max_dets)

    def forward(images):
        return _fwd(variables, images)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P(mesh.axis_names[0]))

    pipeline = EvalPipeline(dataset, img_hw, raw_uint8=True)
    dets_by_img: Dict[int, tuple] = {}
    seen = set()
    n_done = 0
    t0 = time.time()
    for batch in eval_loader(pipeline, batch_size):
        images = jnp.asarray(batch["images"])
        if mesh is not None:
            images = jax.device_put(images, batch_sh)
        out = forward(images)
        boxes = np.asarray(out["boxes"])
        scores = np.asarray(out["scores"])
        labels = np.asarray(out["labels"])
        valid = np.asarray(out["valid"])
        for i in range(len(batch["img_id"])):
            img_id = int(batch["img_id"][i])
            if img_id in seen:
                continue
            seen.add(img_id)
            v = valid[i]
            b = boxes[i][v]
            # undo letterbox
            dx, dy = batch["offset"][i]
            s = batch["scale"][i]
            b = (b - np.array([dx, dy, dx, dy])) / s
            h0, w0 = batch["orig_hw"][i]
            b[:, [0, 2]] = b[:, [0, 2]].clip(0, w0)
            b[:, [1, 3]] = b[:, [1, 3]].clip(0, h0)
            xywh = np.concatenate([b[:, :2], b[:, 2:] - b[:, :2]], axis=1)
            dets_by_img[img_id] = (xywh, scores[i][v], labels[i][v])
            n_done += 1
        if max_images is not None and n_done >= max_images:
            break
    elapsed = time.time() - t0

    if show_dir:
        # tools/test.py --show-dir analog: annotated prediction dumps
        import os

        from PIL import Image

        from glsdet_tpu.utils.visualize import draw_detections

        os.makedirs(show_dir, exist_ok=True)
        rec_by_id = {rec.img_id: rec for rec in dataset.records}
        for img_id, (xywh, ss, ll) in dets_by_img.items():
            rec = rec_by_id[img_id]
            xyxy = np.concatenate([xywh[:, :2], xywh[:, :2] + xywh[:, 2:]],
                                  axis=1)
            drawn = draw_detections(
                dataset.load_image(rec), xyxy, ss, ll,
                dataset.class_names, show_score_thr)
            stem = os.path.splitext(os.path.basename(rec.file_name))[0]
            Image.fromarray(np.asarray(drawn, np.uint8)).save(
                os.path.join(show_dir, f"{stem}.png"))
        if verbose:
            print(f"wrote {len(dets_by_img)} annotated images -> "
                  f"{show_dir}")

    if out_json:
        # COCO detection-results dump (tools/test.py --format-only /
        # --out analog): submission format without running the evaluator
        import json

        # contiguous label -> the dataset's own COCO category id (our
        # VisDrone converter writes 0-based ids per the reference's
        # cls-1 mapping; stock COCO is 1-based — don't assume either)
        cat_ids = getattr(dataset, "cat_ids", None)
        dump = []
        for img_id, (xywh, ss, ll) in dets_by_img.items():
            for box, sc, lb in zip(xywh, ss, ll):
                dump.append({
                    "image_id": int(img_id),
                    "category_id": (int(cat_ids[int(lb)]) if cat_ids
                                    else int(lb) + 1),
                    "bbox": [round(float(v), 2) for v in box],
                    "score": round(float(sc), 5),
                })
        with open(out_json, "w") as f:
            json.dump(dump, f)
        if verbose:
            print(f"wrote {len(dump)} detections -> {out_json}")
    if format_only:
        stats = {"images": n_done, "elapsed_s": round(elapsed, 2),
                 "images_per_sec": round(n_done / max(elapsed, 1e-9), 2)}
        return None, stats

    gts = {}
    for rec in dataset.records:
        if max_images is not None and rec.img_id not in dets_by_img:
            continue
        b = rec.boxes
        gts[rec.img_id] = (
            np.concatenate([b[:, :2], b[:, 2:] - b[:, :2]], axis=1),
            rec.labels)

    evaluator = CocoEvaluator(num_classes)
    result = evaluator.evaluate(gts, dets_by_img)
    stats = {
        "images": n_done,
        "elapsed_s": round(elapsed, 2),
        "images_per_sec": round(n_done / max(elapsed, 1e-9), 2),
    }
    if verbose:
        print(summarize(result, dataset.class_names))
        print(stats)
    return result, stats


def run_eval_tta(
    dataset: CocoDataset,
    apply_fn: Callable,
    family: str,
    img_hw: Tuple[int, int],
    num_classes: int,
    tta_scales: Tuple[float, ...] = (1.0,),
    tta_flip: bool = True,
    score_thr: float = 0.01,
    nms_iou: float = 0.65,
    max_dets: int = 100,
    max_images: Optional[int] = None,
    verbose: bool = True,
    variables=None,
    strides=None,
    out_json: Optional[str] = None,
    format_only: bool = False,
) -> Tuple[Optional[CocoEvalResult], dict]:
    """Multi-scale + flip TTA eval (MultiScaleFlipAug semantics,
    test_time_aug.py:11 + the aug_test merge).

    Every augmented variant is letterboxed to the SAME fixed ``img_hw``
    model canvas, so all scales and flips share ONE compiled program —
    a TTA "scale" changes how much of the canvas the image occupies
    (exactly what resizing before the reference's Resize(keep_ratio)
    step does), never the traced shapes.  Per-variant detections are
    mapped back to original coordinates and fused with a single NMS
    (eval/tta.py: tta_detect).
    """
    from glsdet_tpu.data.augment import letterbox
    from glsdet_tpu.eval.tta import tta_detect

    if family in ("yolox", "ffa"):
        yolox_strides = strides or ((4, 8, 16, 32) if family == "ffa"
                                    else (8, 16, 32))

        @jax.jit
        def _fwd(v, images):
            images = _maybe_normalize(images)
            out = apply_fn(v, images) if v is not None else apply_fn(images)
            cls, reg, obj = out
            return yolox_postprocess(cls, reg, obj, img_hw,
                                     strides=yolox_strides,
                                     score_thr=score_thr, iou_thr=nms_iou,
                                     max_dets=max_dets)
    else:
        @jax.jit
        def _fwd(v, images):
            images = _maybe_normalize(images)
            out = apply_fn(v, images) if v is not None else apply_fn(images)
            cls, reg = out
            return gfl_postprocess(cls, reg, img_hw, score_thr=score_thr,
                                   iou_thr=nms_iou, max_dets=max_dets)

    def detect_one(image: np.ndarray) -> dict:
        canvas, _, s, (dx, dy) = letterbox(
            image, np.zeros((0, 4), np.float32), img_hw)
        # uint8 canvas; _fwd normalizes on device (_maybe_normalize)
        out = _fwd(variables, jnp.asarray(canvas, jnp.uint8)[None])
        v = np.asarray(out["valid"][0])
        b = np.asarray(out["boxes"][0])[v]
        b = (b - np.array([dx, dy, dx, dy])) / s
        h0, w0 = image.shape[:2]
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, w0)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, h0)
        return {"boxes": b,
                "scores": np.asarray(out["scores"][0])[v],
                "labels": np.asarray(out["labels"][0])[v]}

    dets_by_img: Dict[int, tuple] = {}
    t0 = time.time()
    for rec in dataset.records:
        if max_images is not None and len(dets_by_img) >= max_images:
            break
        img = dataset.load_image(rec)
        d = tta_detect(detect_one, img, scales=tuple(tta_scales),
                       flip=tta_flip, iou_thr=nms_iou, max_dets=max_dets)
        b = d["boxes"]
        xywh = np.concatenate([b[:, :2], b[:, 2:] - b[:, :2]], axis=1)
        dets_by_img[rec.img_id] = (xywh, d["scores"], d["labels"])
    elapsed = time.time() - t0
    n_done = len(dets_by_img)

    if out_json:
        import json

        cat_ids = getattr(dataset, "cat_ids", None)
        dump = []
        for img_id, (xywh, ss, ll) in dets_by_img.items():
            for box, sc, lb in zip(xywh, ss, ll):
                dump.append({
                    "image_id": int(img_id),
                    "category_id": (int(cat_ids[int(lb)]) if cat_ids
                                    else int(lb) + 1),
                    "bbox": [round(float(x), 2) for x in box],
                    "score": round(float(sc), 5),
                })
        with open(out_json, "w") as f:
            json.dump(dump, f)
        if verbose:
            print(f"wrote {len(dump)} detections -> {out_json}")

    stats = {"images": n_done, "elapsed_s": round(elapsed, 2),
             "images_per_sec": round(n_done / max(elapsed, 1e-9), 2),
             "tta_scales": list(tta_scales), "tta_flip": tta_flip}
    if format_only:
        return None, stats

    gts = {}
    for rec in dataset.records:
        if max_images is not None and rec.img_id not in dets_by_img:
            continue
        b = rec.boxes
        gts[rec.img_id] = (
            np.concatenate([b[:, :2], b[:, 2:] - b[:, :2]], axis=1),
            rec.labels)
    evaluator = CocoEvaluator(num_classes)
    result = evaluator.evaluate(gts, dets_by_img)
    if verbose:
        print(summarize(result, dataset.class_names))
        print(stats)
    return result, stats
