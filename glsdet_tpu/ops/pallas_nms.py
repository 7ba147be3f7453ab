"""Fused greedy-NMS Pallas kernel for TPU.

The XLA-composed NMS in ``glsdet_tpu.ops.nms`` materializes the full
(K, K) IoU matrix in HBM and then runs an O(K) ``fori_loop`` of masked
vector steps over it.  This kernel fuses both stages: boxes live in VMEM
as a (4, K) struct-of-arrays, each scan step recomputes its IoU row with
VPU ops (8x128 lanes), and the keep mask never leaves VMEM — zero HBM
traffic for the O(K^2) suppression work.

Semantics match ``ops.nms.nms`` exactly (strictly-greater suppression,
descending-score order assumed pre-sorted by the caller, padding rows
carry valid=0), so ``nms_pallas`` is a drop-in accelerated path used when
running on TPU; other backends fall back to the XLA version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, iou_threshold: float,
                offset: float):
    """boxes_ref: (4, K) f32 sorted by descending score; valid_ref (1, K)
    f32 {0,1}; keep_ref (1, K) f32 out."""
    k = boxes_ref.shape[1]
    x1 = boxes_ref[0:1, :]
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    areas = jnp.maximum(x2 - x1 + offset, 0.0) * \
        jnp.maximum(y2 - y1 + offset, 0.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, keep):
        onehot = (iota == i).astype(jnp.float32)
        # extract box i via masked reductions (vector-friendly scalar read)
        xi1 = jnp.sum(x1 * onehot)
        yi1 = jnp.sum(y1 * onehot)
        xi2 = jnp.sum(x2 * onehot)
        yi2 = jnp.sum(y2 * onehot)
        area_i = jnp.sum(areas * onehot)
        alive_i = jnp.sum(keep * onehot) > 0.0

        iw = jnp.maximum(
            jnp.minimum(x2, xi2) - jnp.maximum(x1, xi1) + offset, 0.0)
        ih = jnp.maximum(
            jnp.minimum(y2, yi2) - jnp.maximum(y1, yi1) + offset, 0.0)
        inter = iw * ih
        union = jnp.maximum(areas + area_i - inter, 1e-12)
        iou_row = inter / union

        suppress = (iou_row > iou_threshold) & (iota > i) & alive_i
        return keep * (1.0 - suppress.astype(jnp.float32))

    keep0 = valid_ref[:]
    keep_ref[:] = jax.lax.fori_loop(0, k, body, keep0)


def _pad_to_lane(k: int) -> int:
    return ((k + LANE - 1) // LANE) * LANE


@functools.partial(jax.jit, static_argnames=("iou_threshold", "offset",
                                             "interpret"))
def nms_pallas_sorted(boxes_sorted: jnp.ndarray, valid: jnp.ndarray,
                      iou_threshold: float, offset: float = 0.0,
                      interpret: bool = False) -> jnp.ndarray:
    """Suppression scan over score-sorted boxes.

    Args:
        boxes_sorted: (K, 4) xyxy, descending score order.
        valid: (K,) bool — padding rows False.

    Returns:
        (K,) bool keep mask in the sorted order.
    """
    k = boxes_sorted.shape[0]
    kp = _pad_to_lane(k)
    boxes_t = jnp.zeros((4, kp), jnp.float32)
    boxes_t = boxes_t.at[:, :k].set(boxes_sorted.T.astype(jnp.float32))
    valid_row = jnp.zeros((1, kp), jnp.float32)
    valid_row = valid_row.at[0, :k].set(valid.astype(jnp.float32))

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold=iou_threshold,
                          offset=offset),
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes_t, valid_row)
    return keep[0, :k] > 0.5


def nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray,
               iou_threshold: float, offset: float = 0.0,
               interpret: bool = False):
    """Drop-in ``ops.nms.nms`` with the fused kernel.

    Returns (keep mask over input order, descending-score order)."""
    from glsdet_tpu.ops.nms import NEG_INF

    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    valid = scores[order] > NEG_INF / 2
    keep_sorted = nms_pallas_sorted(sorted_boxes, valid, iou_threshold,
                                    offset, interpret=interpret)
    k = scores.shape[0]
    keep = jnp.zeros((k,), bool).at[order].set(keep_sorted)
    return keep, order


def batched_nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray,
                       class_ids: jnp.ndarray, iou_threshold: float,
                       coord_bound: float = 8192.0,
                       interpret: bool = False):
    """Class-offset batched NMS on the fused kernel."""
    offsets = class_ids.astype(boxes.dtype)[:, None] * coord_bound
    return nms_pallas(boxes + offsets, scores, iou_threshold,
                      interpret=interpret)


def use_pallas_nms() -> bool:
    """True only when explicitly requested via GLSDET_PALLAS_NMS=1 on a
    TPU backend.

    Measured on v5e: the fixpoint-iteration NMS in ``ops.nms.nms`` (a
    handful of vectorized (K, K) passes) beats this kernel's K
    sequential VMEM steps for every K this framework uses (<= 2048), and
    unlike a Pallas call it composes freely with vmap/jit fusion — so
    the kernel is opt-in, kept as the VMEM-resident alternative for
    very large K."""
    import os

    if os.environ.get("GLSDET_NO_PALLAS"):  # legacy kill-switch
        return False
    return (os.environ.get("GLSDET_PALLAS_NMS") == "1"
            and jax.default_backend() == "tpu")
