"""On-device image preprocessing: resize, letterbox, normalize.

The reference preprocesses on CPU (mmdet pipelines ``Resize``/
``Normalize``/``Pad``; yolox-drone letterbox in ``models/core/dataloader.py``
and ``yolo.py``).  On TPU these become XLA ops so the whole eval path stays
on device; fixed output shapes keep everything jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ImageNet statistics used by the mmdet configs (img_norm_cfg).
IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def normalize_image(img: jnp.ndarray,
                    mean=IMAGENET_MEAN, std=IMAGENET_STD,
                    dtype=jnp.float32) -> jnp.ndarray:
    """(..., H, W, 3) uint8/float -> normalized float (NHWC)."""
    img = img.astype(jnp.float32)
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return ((img - mean) / std).astype(dtype)


def resize_keep_ratio(img: jnp.ndarray, out_h: int, out_w: int,
                      method: str = "bilinear"):
    """Keep-aspect resize into a fixed (out_h, out_w) canvas, top-left
    anchored, zero padded (mmdet ``Resize(keep_ratio=True)`` + ``Pad``).

    Returns (canvas (out_h, out_w, C), scale) where ``scale`` maps original
    coords to canvas coords.
    """
    h, w = img.shape[0], img.shape[1]
    scale = min(out_h / h, out_w / w)
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    resized = jax.image.resize(img.astype(jnp.float32),
                               (new_h, new_w, img.shape[2]), method)
    canvas = jnp.zeros((out_h, out_w, img.shape[2]), jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (0, 0, 0))
    return canvas, scale


def letterbox(img: jnp.ndarray, out_h: int, out_w: int,
              pad_value: float = 128.0, method: str = "bilinear"):
    """Center-padded keep-aspect resize (yolox-drone ``resize_image`` with
    ``letterbox_image=True``).

    Returns (canvas, scale, (pad_x, pad_y)).
    """
    h, w = img.shape[0], img.shape[1]
    scale = min(out_h / h, out_w / w)
    new_h, new_w = int(round(h * scale)), int(round(w * scale))
    resized = jax.image.resize(img.astype(jnp.float32),
                               (new_h, new_w, img.shape[2]), method)
    pad_y = (out_h - new_h) // 2
    pad_x = (out_w - new_w) // 2
    canvas = jnp.full((out_h, out_w, img.shape[2]), pad_value, jnp.float32)
    canvas = jax.lax.dynamic_update_slice(canvas, resized, (pad_y, pad_x, 0))
    return canvas, scale, (pad_x, pad_y)


def unletterbox_boxes(boxes: jnp.ndarray, scale: float, pad_x: float,
                      pad_y: float) -> jnp.ndarray:
    """Map xyxy boxes from letterboxed-canvas coords back to the original
    image (yolox-drone ``yolo_correct_boxes`` semantics, utils_bbox.py:8)."""
    shift = jnp.asarray([pad_x, pad_y, pad_x, pad_y], boxes.dtype)
    return (boxes - shift) / scale
