"""Jittable train steps for the two detector families.

Parallelism model (SURVEY.md §2.4): global-view ``jax.jit`` over a
``jax.sharding.Mesh`` — the batch is sharded over the ``data`` mesh axis
via NamedSharding; gradients, BatchNorm batch statistics, positive-count
normalizers and the BoIW update all operate on the *global* batch, so XLA
inserts the reduce/all-gather collectives that the reference performed
explicitly with NCCL (DDP grad all-reduce, ``reduce_mean``, SyncNormHook).
No axis_name plumbing is needed on this path; the losses also accept
``axis_name`` for an optional shard_map/pmap deployment.

Batch dict contract (fixed shapes):
    images:    (B, H, W, 3) uint8 RGB (preferred: 4x less host->device
               traffic; normalization happens inside the step) or
               already-normalized float32 (legacy; pass
               normalize=False to the step factory)
    gt_boxes:  (B, G, 4) xyxy, zero-padded
    gt_labels: (B, G) int32
    gt_valid:  (B, G) bool
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from glsdet_tpu.data.device_color import (apply_batch_color,
                                          normalize_images)
from glsdet_tpu.models.mp_head import proxy_class_matrix
from glsdet_tpu.models.yolox_head import flatten_head_outputs
from glsdet_tpu.ops.priors import grid_anchors, grid_points
from glsdet_tpu.train.gfl_loss import gfl_loss, gfl_targets
from glsdet_tpu.train.mp_loss import mp_loss
from glsdet_tpu.train.state import TrainState, apply_updates
from glsdet_tpu.train.yolox_loss import yolox_loss

YOLOX_STRIDES = (8, 16, 32)
GFL_STRIDES = (8, 16, 32, 64, 128)

# color + normalize live in ONE place (data/device_color.py); the train
# steps only pick where the multi-scale resize goes between them
_batch_images = apply_batch_color
_prep_images = normalize_images


def make_yolox_train_step(model, tx: optax.GradientTransformation,
                          img_hw: Tuple[int, int],
                          use_l1: bool = False,
                          strides: Tuple[int, ...] = YOLOX_STRIDES,
                          normalize: bool = False,
                          resize_from: Tuple[int, int] = None,
                          bbox_loss_mode: str = "square") -> Callable:
    """Returns step(state, batch) -> (state, metrics).

    resize_from: when set, batches arrive at this spatial size and the
    step bilinear-resizes images to ``img_hw`` ON DEVICE, scaling the
    gt boxes by the ratio — the multi-scale-training primitive.  The
    reference achieves multi-scale by re-sizing in the data pipeline
    after an NCCL size broadcast (SyncRandomSizeHook,
    yolox-ufp/mmdet/core/hook/sync_random_size_hook.py:52); with fixed
    shapes the loader stays at one base size and each target size is
    its own compiled program doing its own device-side resize (the
    mmdetection-YOLOX ``_preprocess`` analog).
    """
    centers_np, strides_np, _ = grid_points(img_hw, strides, offset=0.5)
    priors_cxy = jnp.asarray(centers_np)
    priors_stride = jnp.asarray(strides_np)
    do_resize = (resize_from is not None
                 and tuple(resize_from) != tuple(img_hw))

    def step(state: TrainState, batch):
        images = _batch_images(batch, resize_from if do_resize else img_hw)
        gt_boxes = batch["gt_boxes"]
        if do_resize:
            b, _, _, c = images.shape
            images = jax.image.resize(
                images.astype(jnp.float32),
                (b, img_hw[0], img_hw[1], c), "bilinear")
            sy = img_hw[0] / resize_from[0]
            sx = img_hw[1] / resize_from[1]
            gt_boxes = gt_boxes * jnp.asarray(
                [sx, sy, sx, sy], gt_boxes.dtype)
        images = _prep_images(images, normalize)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            cls_l, reg_l, obj_l = out
            cls_f, reg_f, obj_f = flatten_head_outputs(cls_l, reg_l, obj_l)
            losses = yolox_loss(
                cls_f.astype(jnp.float32), reg_f.astype(jnp.float32),
                obj_f.astype(jnp.float32), priors_cxy, priors_stride,
                gt_boxes, batch["gt_labels"], batch["gt_valid"],
                use_l1=use_l1, bbox_loss_mode=bbox_loss_mode)
            return losses.total, (losses, mut["batch_stats"])

        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = apply_updates(state, tx, grads, new_bs)
        metrics = {
            "loss": total,
            "loss_cls": losses.loss_cls,
            "loss_bbox": losses.loss_bbox,
            "loss_obj": losses.loss_obj,
            "loss_l1": losses.loss_l1,
            "num_fg": losses.num_fg,
        }
        return new_state, metrics

    return step


def make_mpdet_train_step(model, tx: optax.GradientTransformation,
                          img_hw: Tuple[int, int],
                          num_classes: int,
                          proxies_list: Sequence[int],
                          reg_max: int = 16,
                          gamma: float = 10.0,
                          normalize: bool = False) -> Callable:
    """MP-Det train step: ATSS targets + GFL + proxy/BoIW losses."""
    anchors_np, counts = grid_anchors(img_hw, GFL_STRIDES,
                                      octave_base_scale=8.0)
    anchors = jnp.asarray(anchors_np)
    anchor_centers = (anchors[:, :2] + anchors[:, 2:4]) / 2.0
    anchor_strides = jnp.concatenate([
        jnp.full((n,), s, jnp.float32)
        for n, s in zip(counts, GFL_STRIDES)])
    membership = jnp.asarray(proxy_class_matrix(proxies_list))

    def step(state: TrainState, batch):
        rng, new_rng = jax.random.split(state.rng)
        targets = gfl_targets(
            anchors, counts, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], num_classes)

        images = _prep_images(_batch_images(batch, img_hw), normalize)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            cls_feats_l, bbox_preds_l = out
            b = batch["images"].shape[0]
            cls_feats = jnp.concatenate(
                [f.reshape(b, -1, f.shape[-1]) for f in cls_feats_l], axis=1)
            bbox_preds = jnp.concatenate(
                [p.reshape(b, -1, p.shape[-1]) for p in bbox_preds_l], axis=1)
            out = mp_loss(
                cls_feats, bbox_preds.astype(jnp.float32),
                params["head"]["proxies"], membership, state.boiw, rng,
                targets, anchor_centers, anchor_strides, num_classes,
                proxies_list, reg_max=reg_max, gamma=gamma)
            return out.total, (out, mut["batch_stats"])

        (total, (out, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = apply_updates(state, tx, grads, new_bs,
                                  new_boiw=out.boiw, new_rng=new_rng)
        metrics = {
            "loss": total,
            "loss_cls": out.loss_cls,
            "loss_bbox": out.loss_bbox,
            "loss_dfl": out.loss_dfl,
            "loss_emb": out.loss_emb,
            "loss_op": out.loss_op,
        }
        return new_state, metrics

    return step


def make_scan_train_step(step_fn: Callable) -> Callable:
    """Wrap a single train step into a K-micro-step scan group.

    Returns ``scan_step(state, stacked_batch) -> (state, metrics)`` where
    ``stacked_batch`` is the usual batch dict with an extra leading axis K
    (``stack_batches``) and ``metrics`` carries the same keys stacked to
    ``(K,)``. The K optimizer steps run inside ONE compiled program
    (``lax.scan``), so a driver pays one dispatch per K steps instead of
    per step. On a remote-tunnel backend whose per-dispatch floor is
    ~15-30ms this is the difference between measuring the program and
    measuring the RPC channel (CLAUDE.md); on directly-attached chips it
    still removes per-step launch/donation bookkeeping.

    Semantics: identical to K sequential calls of ``step_fn`` (pinned by
    tests/test_train_state.py::test_scan_step_equivalence). Hook-cadence
    caveat for loop integration: host-side hooks (OT update, logging,
    invalid-loss check) can only run at group boundaries, so intervals
    must be multiples of K — the production loop exposes this as
    ``config.train.steps_per_call`` and validates the intervals at
    start (train/loop.py).

    The reference has no analog — its runner is strictly
    one-iteration-per-dispatch (mmcv EpochBasedRunner,
    yolox-ufp/mmdet/apis/train.py:203).
    """

    def scan_step(state: TrainState, stacked_batch):
        def body(carry, batch):
            new_state, metrics = step_fn(carry, batch)
            return new_state, metrics

        return jax.lax.scan(body, state, stacked_batch)

    return scan_step


def stack_batches(batches) -> dict:
    """Stack K batch dicts into one scan-group input (leading K axis)."""
    import numpy as np

    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def make_gfl_train_step(model, tx: optax.GradientTransformation,
                        img_hw: Tuple[int, int], num_classes: int,
                        reg_max: int = 16,
                        normalize: bool = False) -> Callable:
    """Plain GFL train step (MP-Det ablation baseline)."""
    anchors_np, counts = grid_anchors(img_hw, GFL_STRIDES,
                                      octave_base_scale=8.0)
    anchors = jnp.asarray(anchors_np)
    anchor_centers = (anchors[:, :2] + anchors[:, 2:4]) / 2.0
    anchor_strides = jnp.concatenate([
        jnp.full((n,), s, jnp.float32)
        for n, s in zip(counts, GFL_STRIDES)])

    def step(state: TrainState, batch):
        targets = gfl_targets(
            anchors, counts, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], num_classes)

        images = _prep_images(_batch_images(batch, img_hw), normalize)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            cls_l, bbox_l = out
            b = batch["images"].shape[0]
            cls_f = jnp.concatenate(
                [f.reshape(b, -1, f.shape[-1]) for f in cls_l], axis=1)
            bbox_f = jnp.concatenate(
                [p.reshape(b, -1, p.shape[-1]) for p in bbox_l], axis=1)
            losses = gfl_loss(
                cls_f.astype(jnp.float32), bbox_f.astype(jnp.float32),
                targets, anchor_centers, anchor_strides, num_classes,
                reg_max)
            return losses.total, (losses, mut["batch_stats"])

        (total, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = apply_updates(state, tx, grads, new_bs)
        metrics = {
            "loss": total,
            "loss_cls": losses.loss_cls,
            "loss_bbox": losses.loss_bbox,
            "loss_dfl": losses.loss_dfl,
        }
        return new_state, metrics

    return step
