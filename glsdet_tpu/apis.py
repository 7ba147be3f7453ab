"""High-level inference APIs — the mmdet ``apis`` + yolox-drone ``YOLO``
facade analogs.

Behavioral references:
- ``mmdet/apis/inference.py:17,89`` (init_detector / inference_detector).
- ``yolox-drone/yolo.py:19`` (YOLO predictor: detect_image, get_FPS,
  get_map_txt writing ``detection-results/<id>.txt`` lines
  ``<class_name> <conf> <x1> <y1> <x2> <y2>``).
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence

import numpy as np


def init_detector(config_name: str, checkpoint: Optional[str] = None,
                  use_ema: bool = True, options: Optional[dict] = None):
    """Build a model from a named config + optional orbax checkpoint.

    Returns (cfg, model, variables)."""
    import jax
    import jax.numpy as jnp

    from glsdet_tpu.config import apply_overrides, get_config
    from glsdet_tpu.train.loop import build_model, build_optimizer

    cfg = get_config(config_name)
    if options:
        apply_overrides(cfg, options)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    # init at a capped spatial size: the models are fully convolutional
    # (param shapes are resolution-independent) and a full-resolution
    # init program wastes minutes on a remote-tunnel TPU
    init_hw = (min(cfg.data.img_hw[0], 256), min(cfg.data.img_hw[1], 256))
    x = jnp.zeros((1, *init_hw, 3), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(rng, x)
    if checkpoint:
        from glsdet_tpu.train.loop import load_weights, make_state_template

        tx = build_optimizer(cfg, 1000)
        state = make_state_template(cfg, variables, tx, rng)
        # weights-only shape-matched load: reads full training
        # checkpoints AND stripped serving artifacts (ckpt_tool strip)
        state, n_loaded, skipped = load_weights(checkpoint, state)
        if n_loaded == 0:
            raise ValueError(
                f"no weight arrays in {checkpoint} match {config_name}: "
                f"{skipped[:5]}")
        params = state.ema_params if use_ema else state.params
        variables = {"params": params, "batch_stats": state.batch_stats}
    return cfg, model, variables


class Detector:
    """Single-model predictor facade (yolo.py:19 YOLO class analog)."""

    # class-level default so hand-assembled instances (tests build via
    # ``__new__`` + attribute assignment) skip lazy int8 calibration
    _needs_calibration = False

    def __init__(self, config_name: str, checkpoint: Optional[str] = None,
                 class_names: Optional[Sequence[str]] = None,
                 score_thr: Optional[float] = None,
                 use_ema: bool = True,
                 quant8=False,
                 int8_scales=None,
                 options: Optional[dict] = None):
        from glsdet_tpu.data.visdrone import VISDRONE_CLASSES

        cfg, model, variables = init_detector(config_name, checkpoint,
                                              use_ema, options)
        self.quant8 = quant8
        self.cfg = cfg
        self.class_names = list(class_names or VISDRONE_CLASSES)
        self.score_thr = (score_thr if score_thr is not None
                          else cfg.eval.score_thr)
        self._raw_apply = model.apply
        self._variables = variables

        # quant8="static" (ops/quant_static.py): serve with saved scales
        # when available (``int8_scales`` = json path or dict), else
        # calibrate lazily on the first detect/detect_batch inputs (and
        # persist to the path when one was named).
        self._scales_path = (int8_scales
                             if isinstance(int8_scales, str) else None)
        scales = None
        if quant8 == "static":
            if self._scales_path and os.path.exists(self._scales_path):
                from glsdet_tpu.ops.quant_static import load_scales
                scales = load_scales(self._scales_path)
            elif int8_scales is not None and not self._scales_path:
                scales = int8_scales
        self._needs_calibration = quant8 == "static" and scales is None

        apply_fn = self._raw_apply
        if quant8 == "static":
            if scales is not None:
                from glsdet_tpu.ops.quant_static import \
                    wrap_apply_quant8_static
                apply_fn = wrap_apply_quant8_static(apply_fn, scales)
        elif quant8:
            # W8A8 dynamic int8 (ops/quant.py): int8 convs on the MXU
            from glsdet_tpu.ops.quant import wrap_apply_quant8
            apply_fn = wrap_apply_quant8(apply_fn)
        self._set_fwd(apply_fn)

    def _set_fwd(self, apply_fn):
        import jax

        from glsdet_tpu.eval.postprocess import (gfl_postprocess,
                                                 yolox_postprocess)

        cfg = self.cfg
        img_hw = cfg.data.img_hw

        if cfg.model.family == "yolox":
            def _fwd(v, images):
                cls, reg, obj = apply_fn(v, images, train=False)
                return yolox_postprocess(
                    cls, reg, obj, img_hw, score_thr=self.score_thr,
                    iou_thr=cfg.eval.nms_iou, max_dets=cfg.eval.max_dets)
        else:
            def _fwd(v, images):
                cls, reg = apply_fn(v, images, train=False)
                return gfl_postprocess(
                    cls, reg, img_hw, score_thr=self.score_thr,
                    iou_thr=cfg.eval.nms_iou, max_dets=cfg.eval.max_dets)

        self._fwd = jax.jit(_fwd)

    def _calibrate(self, model_inputs):
        """``model_inputs``: the normalized (B, H, W, 3) batch the first
        request produced — it IS the calibration set."""
        from glsdet_tpu.ops.quant_static import (calibrate_scales,
                                                 save_scales,
                                                 wrap_apply_quant8_static)

        fn = lambda v, im: self._raw_apply(v, im, train=False)
        scales = calibrate_scales(fn, self._variables, [model_inputs])
        if self._scales_path:
            save_scales(self._scales_path, scales)
        self._set_fwd(wrap_apply_quant8_static(self._raw_apply, scales))
        self._needs_calibration = False

    def detect(self, image: np.ndarray) -> dict:
        """image: (H, W, 3) RGB uint8 -> detections in image coords."""
        import cv2
        import jax.numpy as jnp

        from glsdet_tpu.data.coco import normalize

        h0, w0 = image.shape[:2]
        h, w = self.cfg.data.img_hw
        resized = cv2.resize(image, (w, h))
        batch = jnp.asarray(normalize(resized)[None])
        if self._needs_calibration:
            self._calibrate(batch)
        out = self._fwd(self._variables, batch)
        valid = np.asarray(out["valid"][0])
        boxes = np.asarray(out["boxes"][0])[valid]
        boxes *= np.array([w0 / w, h0 / h, w0 / w, h0 / h], np.float32)
        return {
            "boxes": boxes,
            "scores": np.asarray(out["scores"][0])[valid],
            "labels": np.asarray(out["labels"][0])[valid],
        }

    def detect_batch(self, images: Sequence[np.ndarray]) -> list:
        """Batched ``detect``: ONE stacked dispatch for N frames.

        Frames may have different original sizes (each is resized to the
        model input and its detections are rescaled back individually).
        The stack is padded to a power of two so at most log2(N)+1 batch
        shapes ever compile.  This is the dynamic-batching hook used by
        ``serve.AsyncDetector``.
        """
        if not images:
            return []
        return self.collect_batch(self.submit_batch(images))

    def submit_batch(self, images: Sequence[np.ndarray]):
        """Streaming phase 1: preprocess + ONE stacked dispatch; returns
        a handle for :meth:`collect_batch`.  Nothing blocks on device
        results (JAX dispatch is asynchronous), so a server can keep a
        second batch's forward in flight while reading back the first
        (see ``serve.AsyncDetector``)."""
        import cv2
        import jax.numpy as jnp

        from glsdet_tpu.data.coco import normalize

        h, w = self.cfg.data.img_hw
        resized = np.stack([normalize(cv2.resize(im, (w, h)))
                            for im in images])
        b = 1
        while b < len(images):
            b *= 2
        if b > len(images):
            resized = np.concatenate(
                [resized, np.repeat(resized[-1:], b - len(images), 0)])
        batch = jnp.asarray(resized)
        if self._needs_calibration:
            self._calibrate(batch)
        return list(images), self._fwd(self._variables, batch)

    def collect_batch(self, handle) -> list:
        """Streaming phase 2: read back a :meth:`submit_batch` handle and
        rescale detections to each frame's original coordinates."""
        images, out = handle
        h, w = self.cfg.data.img_hw
        valid = np.asarray(out["valid"])
        all_boxes = np.asarray(out["boxes"])
        all_scores = np.asarray(out["scores"])
        all_labels = np.asarray(out["labels"])
        results = []
        for i, im in enumerate(images):
            h0, w0 = im.shape[:2]
            v = valid[i]
            boxes = all_boxes[i][v] * np.array(
                [w0 / w, h0 / h, w0 / w, h0 / h], np.float32)
            results.append({
                "boxes": boxes,
                "scores": all_scores[i][v],
                "labels": all_labels[i][v],
            })
        return results

    def detect_image(self, image: np.ndarray, score_thr: float = 0.3):
        """Draw detections (yolo.py detect_image analog)."""
        from glsdet_tpu.utils.visualize import draw_detections

        d = self.detect(image)
        return draw_detections(image, d["boxes"], d["scores"], d["labels"],
                               self.class_names, score_thr)

    def get_fps(self, image: np.ndarray, test_interval: int = 20) -> float:
        """yolo.py:199 get_FPS analog."""
        import jax

        self.detect(image)  # warmup/compile
        t0 = time.time()
        for _ in range(test_interval):
            out = self.detect(image)
        return test_interval / (time.time() - t0)

    def get_map_txt(self, image_id: str, image: np.ndarray,
                    out_dir: str) -> str:
        """Write ``detection-results/<id>.txt`` (yolo.py:251)."""
        os.makedirs(out_dir, exist_ok=True)
        d = self.detect(image)
        path = os.path.join(out_dir, f"{image_id}.txt")
        with open(path, "w") as f:
            for box, score, label in zip(d["boxes"], d["scores"],
                                         d["labels"]):
                name = self.class_names[int(label)]
                f.write(f"{name} {score:.6f} {int(box[0])} {int(box[1])} "
                        f"{int(box[2])} {int(box[3])}\n")
        return path


class TwoStageDetector:
    """Two-stage UFPMP predictor facade — the serving twin of
    ``tools/ufpmp_det_eval.py``.

    coarse detector (full frame) -> UFP packing -> MP-Det on the mosaic
    -> unmap + class-wise NMS, with the integrated on-device global-local
    fusion (merge_results.py semantics) on by default.  Exposes the same
    ``detect`` / ``detect_batch`` surface as ``Detector`` so
    ``serve.AsyncDetector`` (dynamic batching) and the HTTP service can
    serve the full pipeline; ``detect_batch`` maps onto the pipelined
    chunk-batched ``TwoStagePipeline.run_batch``.
    """

    _needs_calibration = False

    def __init__(self, coarse_config: str,
                 coarse_checkpoint: Optional[str] = None,
                 mp_config: str = "mp_det_res50",
                 mp_checkpoint: Optional[str] = None,
                 class_names: Optional[Sequence[str]] = None,
                 score_thr: Optional[float] = None,
                 fuse_global: bool = True,
                 use_ema: bool = True,
                 max_batch: int = 8,
                 coarse_options: Optional[dict] = None,
                 mp_options: Optional[dict] = None,
                 quant8=False,
                 int8_scales=None,
                 devices=None):
        from glsdet_tpu.data.visdrone import VISDRONE_CLASSES
        from glsdet_tpu.eval.two_stage import TwoStagePipeline

        c_cfg, c_model, c_vars = init_detector(
            coarse_config, coarse_checkpoint, use_ema, coarse_options)
        m_cfg, m_model, m_vars = init_detector(
            mp_config, mp_checkpoint, use_ema, mp_options)
        self.cfg = c_cfg
        self.mp_cfg = m_cfg
        self.class_names = list(class_names or VISDRONE_CLASSES)
        self.score_thr = (score_thr if score_thr is not None
                          else c_cfg.eval.score_thr)
        self._pipe_kwargs = dict(
            coarse_hw=c_cfg.data.img_hw,
            coarse_vars=c_vars, mp_vars=m_vars,
            num_classes=c_cfg.model.num_classes,
            ufp_scale=c_cfg.eval.ufp_scale,
            mosaic_buckets=c_cfg.eval.mosaic_buckets,
            max_regions=c_cfg.eval.max_regions,
            bucket_policy=getattr(c_cfg.eval, "bucket_policy", "image"),
            pack_mode=getattr(c_cfg.eval, "pack_mode", "square"),
            coarse_score_thr=c_cfg.eval.coarse_score_thr,
            final_nms_thr=c_cfg.eval.chip_nms_iou,
            max_batch=max_batch,
            fuse_global=fuse_global,
            fusion_nms_thr=c_cfg.eval.fusion_nms_iou,
            devices=devices)
        self._applies = (lambda v, im: c_model.apply(v, im, train=False),
                         lambda v, im: m_model.apply(v, im, train=False))
        # quant8="static" serving: ``int8_scales`` may be a saved-scales
        # json path (ops/quant_static.save_scales) or the (coarse, mp)
        # dict pair itself — then the pipeline starts int8 immediately.
        # Without scales it calibrates lazily on the first detect_batch
        # (the first frames ARE the calibration set) and, when
        # ``int8_scales`` names a not-yet-existing path, persists the
        # result there so the next boot skips calibration.
        self._scales_path = (int8_scales
                             if isinstance(int8_scales, str) else None)
        scales = None
        if quant8 == "static":
            if self._scales_path and os.path.exists(self._scales_path):
                from glsdet_tpu.ops.quant_static import load_scales
                scales = load_scales(self._scales_path)
            elif int8_scales is not None and not self._scales_path:
                scales = int8_scales
        self._needs_calibration = quant8 == "static" and scales is None
        self._pipe = TwoStagePipeline(
            *self._applies,
            quant8=False if self._needs_calibration else quant8,
            act_scales=scales,
            **self._pipe_kwargs)

    @property
    def pipeline(self):
        return self._pipe

    def _calibrate(self, images: Sequence[np.ndarray]):
        from glsdet_tpu.eval.two_stage import TwoStagePipeline

        scales = self._pipe.calibrate_int8(images)
        if self._scales_path:
            from glsdet_tpu.ops.quant_static import save_scales
            save_scales(self._scales_path, scales)
        self._pipe = TwoStagePipeline(
            *self._applies, quant8="static", act_scales=scales,
            **self._pipe_kwargs)
        self._needs_calibration = False

    def _filter(self, out: dict) -> dict:
        m = out["scores"] >= self.score_thr
        return {"boxes": out["boxes"][m], "scores": out["scores"][m],
                "labels": out["labels"][m]}

    def detect(self, image: np.ndarray) -> dict:
        """image: (H, W, 3) RGB uint8 -> two-stage detections in image
        coordinates."""
        return self.detect_batch([image])[0]

    def detect_batch(self, images: Sequence[np.ndarray]) -> list:
        """Chunk-batched, pipelined two-stage inference over N frames
        (the dynamic-batching hook used by ``serve.AsyncDetector``)."""
        return self.collect_batch(self.submit_batch(images))

    def submit_batch(self, images: Sequence[np.ndarray]):
        """Streaming phase 1: upload + coarse dispatch (non-blocking);
        returns a pipeline batch handle."""
        frames = [np.asarray(im, np.uint8) for im in images]
        if self._needs_calibration:
            self._calibrate(frames[:4])
        return self._pipe.submit_batch(frames)

    def advance_batch(self, handle):
        """Streaming phase 2: coarse readback + UFP packing + mosaic
        dispatch.  Optional — :meth:`collect_batch` runs it if skipped;
        calling it while a NEWER batch's coarse programs are already
        queued on-device is what overlaps host packing with device
        compute across requests."""
        self._pipe.dispatch_mosaics(handle)

    def collect_batch(self, handle) -> list:
        """Streaming phase 3: mosaic readback -> per-frame detections."""
        return [self._filter(o) for o in self._pipe.collect_batch(handle)]

    def warmup(self, image_hw):
        """Pre-compile the pipeline programs for one input shape."""
        self._pipe.warmup(tuple(image_hw))


def load_det_txt(path: str, class_names: Sequence[str]):
    """Read a detection txt back into arrays (merge_results.py format)."""
    name_to_id = {n: i for i, n in enumerate(class_names)}
    boxes, scores, labels = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 6:
                continue
            # class name may contain no spaces in our vocabularies
            name, conf, x1, y1, x2, y2 = parts[:6]
            boxes.append([float(x1), float(y1), float(x2), float(y2)])
            scores.append(float(conf))
            labels.append(name_to_id[name])
    return (np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(scores, np.float32),
            np.asarray(labels, np.int64))
