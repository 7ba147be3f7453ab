"""GFL distribution-to-distance decoding.

The reference's ``Integral`` layer (gfl_head.py:16-49) computes the
softmax expectation over the discrete set {0..reg_max} for each of the 4
box sides.  One reshape + softmax + matvec; XLA fuses it into the head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def integral_decode(logits: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """(..., 4*(reg_max+1)) distribution logits -> (..., 4) distances."""
    shape = logits.shape[:-1]
    x = logits.reshape(*shape, 4, reg_max + 1)
    probs = jax.nn.softmax(x, axis=-1)
    project = jnp.arange(reg_max + 1, dtype=probs.dtype)
    return jnp.einsum("...kb,b->...k", probs, project)


def distance2bbox(points: jnp.ndarray, distances: jnp.ndarray,
                  max_shape=None) -> jnp.ndarray:
    """(l, t, r, b) distances from center points -> xyxy boxes
    (DistancePointBBoxCoder.decode semantics)."""
    x1 = points[..., 0] - distances[..., 0]
    y1 = points[..., 1] - distances[..., 1]
    x2 = points[..., 0] + distances[..., 2]
    y2 = points[..., 1] + distances[..., 3]
    if max_shape is not None:
        h, w = max_shape
        x1 = jnp.clip(x1, 0, w)
        y1 = jnp.clip(y1, 0, h)
        x2 = jnp.clip(x2, 0, w)
        y2 = jnp.clip(y2, 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2distance(points: jnp.ndarray, bboxes: jnp.ndarray,
                  reg_max: float | None = None) -> jnp.ndarray:
    """xyxy boxes -> (l, t, r, b) distances (DistancePointBBoxCoder.encode);
    clamped to ``reg_max - 0.1`` like the reference coder."""
    left = points[..., 0] - bboxes[..., 0]
    top = points[..., 1] - bboxes[..., 1]
    right = bboxes[..., 2] - points[..., 0]
    bottom = bboxes[..., 3] - points[..., 1]
    d = jnp.stack([left, top, right, bottom], axis=-1)
    if reg_max is not None:
        d = jnp.clip(d, 0, reg_max - 0.1)
    return d
