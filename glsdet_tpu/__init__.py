"""glsdet_tpu — a TPU-native JAX/Flax/Pallas rebuild of GLSDet.

GLSDet (TGRS 2025) is a two-stage drone-image small-object detection
pipeline: a coarse detector on the full image, Unified Foreground Packing
(UFP) of its detections into a dense mosaic, a fine detector (MP-Det, a
GFL head with multi-proxy semantic guidance) on the mosaic, and a
result-level global-local NMS fusion.

This package re-designs those capabilities TPU-first:

- ``ops``      — box geometry, fixed-shape batched NMS, Sinkhorn, k-means,
                 image resize/letterbox, on-device mosaic assembly
                 (Pallas kernels for the hot paths).
- ``ufp``      — Unified Foreground Packing (region merge + strip packing).
- ``models``   — Flax modules: CSPDarknet/PAFPN/YOLOX head, ResNet/FPN/
                 GFL/MP heads, attention variants (FFA/LSK/CFP/...).
- ``assign``   — ATSS and SimOTA label assignment as fixed-shape JAX.
- ``losses``   — QFL/DFL/IoU/focal losses.
- ``data``     — VisDrone/UAVDT converters, COCO datasets, augmentations.
- ``train``    — train state (incl. BoIW buffers + EMA), optax schedules,
                 hooks (optimal-transport schedule, mosaic switch).
- ``eval``     — COCO eval, VOC mAP, two-stage UFPMP driver, fusion.
- ``parallel`` — mesh/sharding helpers for pjit over ICI.

Reference behavior studied from WUTCM-Lab/GLSDet (see SURVEY.md); all code
here is new and written for XLA:TPU.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# The deployment environment's sitecustomize force-registers the TPU
# plugin and presets jax_platforms, overriding the JAX_PLATFORMS env var.
# Honor the env var like stock JAX does so `JAX_PLATFORMS=cpu python ...`
# works (tests and host-side tools rely on it).
_env_platforms = _os.environ.get("JAX_PLATFORMS")
if _env_platforms and _jax.config.jax_platforms != _env_platforms:
    try:
        _jax.config.update("jax_platforms", _env_platforms)
    except RuntimeError:
        pass  # backends already initialized; too late to change
