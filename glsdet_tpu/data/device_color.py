"""Device-side color augmentation: mixup blend + HSV jitter + normalize.

Behavioral references:
- MixUp pixel blend: ``yolox-ufp/mmdet/datasets/pipelines/transforms.py``
  (:2216, ratio fixed ~0.5 in the YOLOX recipe) — the host analog is
  ``data/augment.py mixup`` (float blend, truncating uint8 cast).
- YOLOXHSVRandomAug: ``transforms.py:2698`` — integer HSV deltas
  (h mod 180, s/v clipped) around cv2's uint8 RGB<->HSV conversion.

Why this module exists: on a CPU-starved host the color stage of the
train pipeline (mixup blend + two cv2.cvtColor passes + f32 normalize)
costs ~40ms per 640^2 sample — more than the entire geometric stage.
All of it is elementwise, which is exactly what the TPU's VPU does for
free inside the (HBM-bound) train step: moving it on device removes the
host cost AND shrinks host->device transfer (uint8 images + a few
scalars instead of f32).  The host keeps parameter sampling and the
exact box geometry; the device renders pixels.

Numerics: cv2's uint8 conversions use 12-bit fixed-point divide tables;
this module uses the same formulas in f32 with round-half-away
(jnp.round is round-half-even — matches cv2's ``cvRound`` on the .5
boundary closely enough that codes differ by at most +/-1, and the RGB
round-trip by at most +/-2; tests pin that envelope).  Augmentation
noise of 2/255 is far below any training-relevant signal.

All functions are jit-safe, shape-polymorphic over leading batch dims,
and f32 internally (bf16 double-rounding moves codes by +/-2 — the
Pallas GN lesson from ARCHITECTURE §9 applies here too).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ImageNet mean/std of the mmdet pipelines (kept in sync with
# data/coco.py IMAGENET_MEAN/STD; duplicated literally to keep this
# module importable without the host data stack).
_MEAN = (123.675, 116.28, 103.53)
_STD = (58.395, 57.12, 57.375)


def rgb_to_hsv_u8(rgb: jnp.ndarray) -> jnp.ndarray:
    """cv2 COLOR_RGB2HSV semantics for uint8 input (H in [0,180)).

    ``rgb``: (..., 3) float32 holding integer codes in [0, 255].
    Returns (..., 3) float32 integer codes (h, s, v).
    """
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    s = jnp.where(v > 0, jnp.round(255.0 * diff / jnp.maximum(v, 1e-6)),
                  0.0)
    safe = jnp.maximum(diff, 1e-6)
    # 60deg per sector, stored as deg/2 -> 30/diff per code unit
    h = jnp.where(
        v == r, 30.0 * (g - b) / safe,
        jnp.where(v == g, 60.0 + 30.0 * (b - r) / safe,
                  120.0 + 30.0 * (r - g) / safe))
    h = jnp.round(jnp.where(diff > 0, h, 0.0))
    h = jnp.where(h < 0, h + 180.0, h)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb_u8(hsv: jnp.ndarray) -> jnp.ndarray:
    """cv2 COLOR_HSV2RGB semantics for uint8 HSV codes -> uint8 RGB codes
    (float32 carriers)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    hd = h * 2.0                       # degrees
    sf = s / 255.0
    sector = jnp.floor(hd / 60.0)
    f = hd / 60.0 - sector
    p = v * (1.0 - sf)
    q = v * (1.0 - sf * f)
    t = v * (1.0 - sf * (1.0 - f))
    sector = sector.astype(jnp.int32) % 6
    r = jnp.select([sector == 0, sector == 1, sector == 2,
                    sector == 3, sector == 4, sector == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([sector == 0, sector == 1, sector == 2,
                    sector == 3, sector == 4, sector == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([sector == 0, sector == 1, sector == 2,
                    sector == 3, sector == 4, sector == 5],
                   [p, p, t, v, v, q])
    return jnp.round(jnp.stack([r, g, b], axis=-1))


def hsv_jitter(img: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """YOLOXHSVRandomAug on device: ``img`` (..., 3) f32 uint8-codes,
    ``deltas`` (..., 3) f32/int (dh, ds, dv) broadcast over the spatial
    dims.  h wraps mod 180; s, v clip to [0, 255]."""
    hsv = rgb_to_hsv_u8(img)
    dh, ds, dv = deltas[..., 0], deltas[..., 1], deltas[..., 2]
    h = jnp.mod(hsv[..., 0] + dh, 180.0)
    s = jnp.clip(hsv[..., 1] + ds, 0.0, 255.0)
    v = jnp.clip(hsv[..., 2] + dv, 0.0, 255.0)
    return hsv_to_rgb_u8(jnp.stack([h, s, v], axis=-1))


def apply_color(images: jnp.ndarray, mix_images=None, mix_weight=None,
                hsv_deltas=None) -> jnp.ndarray:
    """The fused device color stage: blend -> HSV jitter.

    images, mix_images: (B, H, W, 3) uint8
    mix_weight: (B,) f32 — 1.0 = no mixup (mix_images ignored),
                0.5 = the YOLOX recipe's fixed blend
    hsv_deltas: (B, 3) f32 integer deltas
    Returns (B, H, W, 3) f32 uint8-codes (un-normalized).

    ``mix_images``/``hsv_deltas`` may be None (stage statically
    disabled): a pipeline with hsv off must be an EXACT no-op on
    pixels — the uint8 HSV round-trip at zero deltas is not one (the
    quantization moves saturated pixels by several codes) — and a
    mixup-off pipeline must not pay the blend.

    Order matches the host pipeline (mixup -> hsv); the blend truncates
    like the host's ``.astype(np.uint8)`` (values are non-negative so
    floor == trunc).
    """
    out = images.astype(jnp.float32)
    if mix_images is not None:
        w = mix_weight.astype(jnp.float32)[:, None, None, None]
        out = jnp.floor(out * w + mix_images.astype(jnp.float32) * (1.0 - w))
    if hsv_deltas is not None:
        out = hsv_jitter(out,
                         hsv_deltas.astype(jnp.float32)[:, None, None, :])
    return out


def prep_batch_images(batch: dict, normalize: bool) -> jnp.ndarray:
    """Resolve a train batch's image tensor: run the device color stage
    when its keys are present (static per jit trace — key presence picks
    the compiled program), then optionally normalize.

    Without color keys and with ``normalize=False`` this is the legacy
    already-normalized-f32 contract of train/steps.py.
    """
    return normalize_images(apply_batch_color(batch), normalize)


def apply_batch_color(batch: dict, out_hw=None) -> jnp.ndarray:
    """The color half of ``prep_batch_images``: resolve ``images`` —
    rendering them with the device geometric warp first when the
    pipeline deferred it (``geom_*`` keys, data/device_geom.py) — and
    run ``apply_color`` for whichever color keys the pipeline emitted.
    Split out because the multi-scale train step resizes BETWEEN color
    and normalize (train/steps.py).

    out_hw: static output size, required only for geom batches (they
    carry no ``images`` tensor to infer it from)."""
    if "geom_sources" in batch:
        from glsdet_tpu.data.device_geom import geom_warp

        assert out_hw is not None, "geom batches need a static out_hw"
        images = geom_warp(batch["geom_sources"], batch["geom_quads"],
                           batch["geom_mat"], out_hw)
    else:
        images = batch["images"]
    if "mix_images" in batch or "hsv_deltas" in batch:
        images = apply_color(images, batch.get("mix_images"),
                             batch.get("mix_weight"),
                             batch.get("hsv_deltas"))
    return images


def normalize_images(images: jnp.ndarray,
                     normalize: bool = True) -> jnp.ndarray:
    """ImageNet-normalize uint8-code images (no-op when ``normalize``
    is False: the legacy already-normalized-f32 batch contract)."""
    if not normalize:
        return images
    mean = jnp.asarray(_MEAN, jnp.float32)
    std = jnp.asarray(_STD, jnp.float32)
    return (images.astype(jnp.float32) - mean) / std
