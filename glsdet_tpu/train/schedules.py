"""LR schedules matching the reference training recipes.

- ``yolox_warm_cos``: quadratic warmup -> cosine annealing -> constant
  floor for the final no-augmentation epochs.  Behavioral reference:
  ``yolox-ufp/mmdet/core/hook/yolox_lrupdater_hook.py:8`` (YOLOXLrUpdaterHook,
  warmup='exp' with quadratic ratio, min_lr_ratio 0.05) and the yolox
  config ``num_last_epochs=15``.
- ``epoch_step_decay``: Adam + StepLR(gamma=0.92 per epoch) of the drone
  trainer (yolox-drone/train.py:207-214).
- ``schedule_1x``: SGD multi-step x0.1 at epochs (8, 11) of 12
  (configs/_base_/schedules/schedule_1x.py) used by the MP-Det recipe.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def yolox_warm_cos(base_lr: float, warmup_steps: int, total_steps: int,
                   no_aug_steps: int, min_lr_ratio: float = 0.05):
    min_lr = base_lr * min_lr_ratio
    cos_steps = max(total_steps - no_aug_steps - warmup_steps, 1)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * jnp.square(
            jnp.clip(step / max(warmup_steps, 1), 0.0, 1.0))
        t = jnp.clip((step - warmup_steps) / cos_steps, 0.0, 1.0)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * t))
        lr = jnp.where(step < warmup_steps, warm, cos)
        return jnp.where(step >= total_steps - no_aug_steps, min_lr, lr)

    return sched


def epoch_step_decay(base_lr: float, steps_per_epoch: int,
                     gamma: float = 0.92):
    def sched(step):
        epoch = jnp.asarray(step, jnp.float32) // steps_per_epoch
        return base_lr * jnp.power(gamma, epoch)

    return sched


def schedule_1x(base_lr: float, steps_per_epoch: int,
                warmup_steps: int = 500, warmup_ratio: float = 0.001,
                milestones=(8, 11)):
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        alpha = jnp.clip(step / max(warmup_steps, 1), 0.0, 1.0)
        warm_f = warmup_ratio * (1 - alpha) + alpha
        epoch = step // steps_per_epoch
        decay = jnp.power(
            0.1, sum((epoch >= m).astype(jnp.float32) for m in milestones))
        return base_lr * warm_f * decay

    return sched


def yolox_sgd(schedule, momentum: float = 0.9,
              weight_decay: float = 5e-4, nesterov: bool = True,
              momentum_dtype=None):
    """SGD + nesterov + weight decay (yolox 8x8 config optimizer). BN/bias
    exemption from weight decay is handled via the mask below.

    momentum_dtype: dtype of the momentum buffers (optax
    accumulator_dtype) — ``jnp.bfloat16`` halves optimizer-state HBM
    traffic on the hbm-bound train steps (A/B via bench --train,
    GLSDET_MOMENTUM_DTYPE=bfloat16)."""

    def wd_mask(params):
        import jax

        def is_weight(path, x):
            # decay only rank >= 2 kernels (convs/dense), not bias/norm
            return x.ndim >= 2

        return jax.tree_util.tree_map_with_path(is_weight, params)

    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=wd_mask),
        optax.sgd(learning_rate=schedule, momentum=momentum,
                  nesterov=nesterov, accumulator_dtype=momentum_dtype),
    )


def mp_det_sgd(schedule, momentum: float = 0.9, weight_decay: float = 1e-4,
               grad_clip: float = 35.0, momentum_dtype=None):
    """schedule_1x SGD (lr 0.01, wd 1e-4, grad clip 35) per mmdet default.

    momentum_dtype: see :func:`yolox_sgd`."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=schedule, momentum=momentum,
                  accumulator_dtype=momentum_dtype),
    )


def ema_momentum(step, base_momentum: float = 0.0002,
                 gamma: float = 2000.0):
    """ExpMomentumEMAHook decay (mmdet/core/hook/ema.py:104):
    m(t) = (1 - m0) * exp(-(1 + t) / gamma) + m0."""
    step = jnp.asarray(step, jnp.float32)
    return (1 - base_momentum) * jnp.exp(-(1 + step) / gamma) + base_momentum
