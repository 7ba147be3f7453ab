"""Detection losses as pure elementwise/reduction-free JAX functions.

All functions return *per-element* losses; callers apply weights and
normalize by an ``avg_factor`` (which in the distributed setting is a
``lax.pmean`` across the mesh — the XLA-collective replacement for the
reference's NCCL ``reduce_mean``, yolox-ufp/mmdet/core/utils/dist_utils.py:67).

Behavioral references:
- QFL/DFL: yolox-ufp/mmdet/models/losses/gfocal_loss.py:82,147
- GIoU/IoU losses: mmdet iou_loss.py semantics; YOLOX square IoU loss
  (yolox-drone/models/base/yolox_losses.py:10, mode='square')
- BCE: torch F.binary_cross_entropy_with_logits semantics
- Focal: mmdet focal_loss.py (sigmoid variant)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from glsdet_tpu.ops.boxes import giou as _pairwise_aligned_giou  # noqa: F401
from glsdet_tpu.ops.boxes import iou as _aligned_iou


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross entropy on logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def quality_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       quality: jnp.ndarray, num_classes: int,
                       beta: float = 2.0) -> jnp.ndarray:
    """Quality Focal Loss (gfocal_loss.py:82).

    Args:
        logits: (N, C) joint cls-quality logits.
        labels: (N,) int class ids; ``num_classes`` = background.
        quality: (N,) IoU-quality target for positives (0 elsewhere).

    Returns:
        (N,) loss summed over classes.
    """
    sigma = jax.nn.sigmoid(logits)
    # all-negative target first
    zero_tgt = jnp.zeros_like(logits)
    loss_all = bce_with_logits(logits, zero_tgt) * jnp.power(sigma, beta)
    # positive positions: replace the label column with the quality target
    pos = labels < num_classes
    onehot = jax.nn.one_hot(jnp.where(pos, labels, 0), num_classes,
                            dtype=logits.dtype) * pos[:, None]
    q = quality[:, None] * onehot
    mod = jnp.power(jnp.abs(q - sigma), beta)
    loss_pos = bce_with_logits(logits, q) * mod
    loss = jnp.where(onehot > 0, loss_pos, loss_all)
    return loss.sum(axis=-1)


def distribution_focal_loss(logits: jnp.ndarray,
                            target: jnp.ndarray) -> jnp.ndarray:
    """DFL (gfocal_loss.py:147): CE against the two integer bins
    bracketing the continuous target, linearly weighted.

    Args:
        logits: (N, reg_max+1) per-side distribution logits.
        target: (N,) continuous targets in [0, reg_max].
    """
    left = jnp.floor(target).astype(jnp.int32)
    nbins = logits.shape[-1]
    left = jnp.clip(left, 0, nbins - 2)
    right = left + 1
    wl = right.astype(logits.dtype) - target
    wr = target - left.astype(logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # weighted one-hot dot, NOT take_along_axis: a per-row gather on a
    # (N, 17) tensor measured 17ms vs 2ms for the masked sum at GFL
    # train sizes (N≈700k) — bit-identical result
    iota = jnp.arange(nbins)
    w = (wl[:, None] * (iota == left[:, None])
         + wr[:, None] * (iota == right[:, None]))
    # mask before multiplying: with non-finite upstream logits a -inf
    # logp in an unselected bin would otherwise turn 0 * -inf into NaN
    # for the whole row (take_along_axis never read those bins)
    return -jnp.sum(jnp.where(w != 0, logp * w, 0.0), axis=-1)


def giou_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - GIoU for aligned xyxy box pairs -> (N,)."""
    return 1.0 - _pairwise_aligned_giou(pred, target)


def iou_loss(pred: jnp.ndarray, target: jnp.ndarray, mode: str = "square",
             eps: float = 1e-16) -> jnp.ndarray:
    """YOLOX IoU loss on aligned xyxy pairs: 1 - iou**2 ('square') or
    -log(iou) ('log') or 1 - iou ('linear')."""
    i = _aligned_iou(pred, target)
    if mode == "square":
        return 1.0 - i * i
    if mode == "log":
        return -jnp.log(jnp.clip(i, eps, 1.0))
    return 1.0 - i


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target)


def sigmoid_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       num_classes: int, alpha: float = 0.25,
                       gamma: float = 2.0) -> jnp.ndarray:
    """Sigmoid focal loss (mmdet focal_loss.py). labels==num_classes is bg.

    Returns (N,) loss summed over classes.
    """
    onehot = jax.nn.one_hot(
        jnp.where(labels < num_classes, labels, num_classes), num_classes + 1,
        dtype=logits.dtype)[..., :num_classes]
    p = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, onehot)
    p_t = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    return (alpha_t * jnp.power(1 - p_t, gamma) * ce).sum(axis=-1)


def softmax_cross_entropy(logits: jnp.ndarray,
                          labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot sum instead of a per-row gather (see DFL note above);
    # masked so a -inf logp in an unselected column stays inert
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    return -jnp.sum(jnp.where(onehot != 0, logp * onehot, 0.0), axis=-1)


__all__ = [
    "bce_with_logits",
    "quality_focal_loss",
    "distribution_focal_loss",
    "giou_loss",
    "iou_loss",
    "l1_loss",
    "sigmoid_focal_loss",
    "softmax_cross_entropy",
]
