"""Result-level global–local fusion.

Behavioral reference: ``yolox-drone/merge_results.py`` — merge the
full-image ("global") and UFP-mosaic ("local") detection sets for each
image, then class-wise batched NMS at IoU 0.65 (:153-158); a gaussian
soft-NMS variant is offered (:41,:121).

Here fusion is a fixed-shape jittable op over padded detection sets, so a
whole eval shard fuses in one program (and shards over a device mesh with
the detections all-gathered).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from glsdet_tpu.ops.nms import NEG_INF, batched_nms, soft_nms


def fuse_detections(dets_a: dict, dets_b: dict, iou_thr: float = 0.65,
                    max_dets: int = 500, use_soft: bool = False,
                    sigma: float = 0.5) -> dict:
    """Fuse two per-image detection dicts (boxes/scores/labels/valid each
    (K, ...)); returns the same structure with ``max_dets`` rows."""
    boxes = jnp.concatenate([dets_a["boxes"], dets_b["boxes"]], axis=0)
    scores = jnp.concatenate([dets_a["scores"], dets_b["scores"]], axis=0)
    labels = jnp.concatenate([dets_a["labels"], dets_b["labels"]], axis=0)
    valid = jnp.concatenate([dets_a["valid"], dets_b["valid"]], axis=0)
    scores = jnp.where(valid, scores, NEG_INF)

    if use_soft:
        offsets = labels.astype(boxes.dtype)[:, None] * 8192.0
        new_scores = soft_nms(boxes + offsets, scores, sigma=sigma)
        kept = new_scores
    else:
        keep, _ = batched_nms(boxes, scores, labels, iou_thr)
        kept = jnp.where(keep, scores, NEG_INF)

    out_scores, idx = jax.lax.top_k(kept, max_dets)
    out_valid = out_scores > NEG_INF / 2
    return {
        "boxes": boxes[idx],
        "scores": jnp.where(out_valid, out_scores, 0.0),
        "labels": labels[idx],
        "valid": out_valid,
    }


fuse_detections_batch = jax.vmap(
    fuse_detections, in_axes=(0, 0, None, None), out_axes=0)
