"""Training loop: config -> model/optimizer/loader -> epochs with hooks.

Behavioral reference: ``mmdet/apis/train.py:71`` (train_detector:
dataloaders -> DP wrap -> optimizer -> EpochBasedRunner -> hooks) and the
hook set on the GLSDet paths:

- OptimalTransportHook (core/hook/optimal_transport_hook.py:5): every
  ``ot_interval`` iters while epoch < ot_stop_epoch run ``update_ot``;
  at ``emd_start_epoch`` flip beta 0->1.
- YOLOXModeSwitchHook (core/hook/yolox_mode_switch_hook.py:7): last
  ``num_last_epochs`` epochs disable Mosaic/MixUp and enable L1.
- CheckInvalidLossHook (core/hook/checkloss_hook.py:7): assert finite
  loss every 50 iters.
- ExpMomentumEMAHook — EMA folded into ``apply_updates``.
- CheckpointHook / EvalHook — orbax checkpoint + COCO eval per epoch.

The runner is deliberately plain python around one jitted step: all hot
work is in the step; hooks are host-side schedule glue exactly like the
reference's.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.config import Config
from glsdet_tpu.data.coco import CocoDataset
from glsdet_tpu.data.loader import TrainPipeline, train_loader
from glsdet_tpu.models import GFLDet, MPDet, YOLOXDetector
from glsdet_tpu.parallel.mesh import multiscale_size
from glsdet_tpu.train import schedules
from glsdet_tpu.train.boiw import enable_emd_training, init_boiw, update_ot
from glsdet_tpu.train.state import TrainState
from glsdet_tpu.train.steps import (
    make_gfl_train_step,
    make_mpdet_train_step,
    make_scan_train_step,
    make_yolox_train_step,
    stack_batches,
)

logger = logging.getLogger("glsdet_tpu")


def build_model(cfg: Config, axis_name: Optional[str] = None):
    import jax.numpy as jnp

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        cfg.model.dtype]
    if cfg.model.family == "yolox":
        return YOLOXDetector(num_classes=cfg.model.num_classes,
                             phi=cfg.model.phi,
                             variant=cfg.model.variant, dtype=dtype,
                             axis_name=axis_name)
    if cfg.model.family == "mpdet":
        return MPDet(num_classes=cfg.model.num_classes,
                     depth=cfg.model.depth,
                     feat_channels=cfg.model.feat_channels,
                     proxies_list=cfg.model.proxies_list,
                     gamma=cfg.model.gamma, dtype=dtype,
                     axis_name=axis_name, remat=cfg.model.remat)
    if cfg.model.family == "gfl":
        return GFLDet(num_classes=cfg.model.num_classes,
                      depth=cfg.model.depth,
                      feat_channels=cfg.model.feat_channels,
                      dtype=dtype, axis_name=axis_name,
                      remat=cfg.model.remat)
    if cfg.model.family == "ffa":
        from glsdet_tpu.models.variants import FFAYoloBody

        return FFAYoloBody(num_classes=cfg.model.num_classes,
                           phi=cfg.model.phi, dtype=dtype,
                           axis_name=axis_name)
    raise ValueError(cfg.model.family)


def family_strides(family: str):
    """Head strides per model family (ffa adds the P2 level)."""
    if family == "ffa":
        return (4, 8, 16, 32)
    if family in ("mpdet", "gfl"):
        return (8, 16, 32, 64, 128)
    return (8, 16, 32)


def make_state_template(cfg: Config, variables, tx, rng):
    """TrainState template matching what training checkpoints contain
    (mpdet configs carry BoIW buffers)."""
    boiw = None
    if cfg.model.family == "mpdet":
        boiw = init_boiw(rng, cfg.model.num_classes, cfg.model.num_words,
                         cfg.model.feat_channels, cfg.model.proxies_list)
    return TrainState.create(variables, tx, rng, boiw=boiw)


def build_optimizer(cfg: Config, steps_per_epoch: int,
                    frozen_sections: Tuple[str, ...] = ()):
    t = cfg.train
    # iter-based mode: schedules span max_iters, not epochs (mmdet
    # IterBasedRunner semantics)
    total = t.max_iters or t.epochs * steps_per_epoch
    if t.optimizer == "yolox_sgd":
        sched = schedules.yolox_warm_cos(
            t.base_lr, t.warmup_epochs * steps_per_epoch, total,
            t.num_last_epochs * steps_per_epoch, t.min_lr_ratio)
        tx = schedules.yolox_sgd(sched, weight_decay=t.weight_decay)
    elif t.optimizer == "mp_sgd":
        sched = schedules.schedule_1x(t.base_lr, steps_per_epoch)
        tx = schedules.mp_det_sgd(
            sched, weight_decay=t.weight_decay,
            grad_clip=t.grad_clip or 35.0)
    elif t.optimizer == "adam_step":
        import optax

        sched = schedules.epoch_step_decay(t.base_lr, steps_per_epoch)
        tx = optax.chain(
            optax.add_decayed_weights(t.weight_decay),
            optax.adam(sched))
    else:
        raise ValueError(t.optimizer)
    return freeze_sections(tx, frozen_sections) if frozen_sections else tx


def freeze_sections(tx, sections: Tuple[str, ...]):
    """Partition the optimizer so top-level param sections in
    ``sections`` receive zero updates (the functional analog of
    yolox-drone's ``model.backbone.parameters() requires_grad=False``,
    train.py:228-230: frozen params get neither gradient steps nor
    weight decay, while batch statistics still update in the forward)."""
    import optax
    from flax import traverse_util

    def label(params):
        flat = traverse_util.flatten_dict(params)
        labels = {k: ("frozen" if k[0] in sections else "train")
                  for k in flat}
        return traverse_util.unflatten_dict(labels)

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, label)


# shared checkpointer so async saves can be awaited across calls
_ckptr = None


def _get_ckptr():
    global _ckptr
    if _ckptr is None:
        import orbax.checkpoint as ocp

        _ckptr = ocp.StandardCheckpointer()
    return _ckptr


def save_checkpoint(work_dir: str, state: TrainState, epoch: int,
                    wait: bool = True):
    """Write ``work_dir/epoch_{epoch}``.  ``wait=False`` returns once
    the state is snapshotted to host memory and lets orbax serialize /
    write to disk in the background (overlapping the next epoch's
    compute); a subsequent save or :func:`finish_checkpoints` joins it.
    mmcv's CheckpointHook blocks the loop for the full write."""
    path = os.path.abspath(os.path.join(work_dir, f"epoch_{epoch}"))
    ckptr = _get_ckptr()
    # np.asarray snapshot: device->host copy happens here, so the donated
    # train-state buffers can keep mutating while the write proceeds
    ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    if wait:
        ckptr.wait_until_finished()
    return path


def finish_checkpoints():
    """Block until every in-flight async checkpoint write is durable."""
    if _ckptr is not None:
        _ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def restore_raw(path: str):
    """Restore a checkpoint as a raw (template-free) pytree of arrays.

    Entry point for checkpoint tooling (``tools/ckpt_tool.py``) and for
    weights-only loads where the stored tree need not match the running
    TrainState (stripped serving artifacts, other optimizers)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


# TrainState sections that hold model weights/statistics (vs. training
# trajectory: step / opt_state / rng)
WEIGHT_SECTIONS = ("params", "ema_params", "batch_stats", "boiw")


def load_weights(path: str, state: TrainState):
    """Weights-only, shape-matched partial load (mmdet ``load_from``,
    apis/train.py:199-202, + yolox-drone's partial state-dict load by
    shape match, train.py:139-165).

    Merges ``params`` / ``ema_params`` / ``batch_stats`` / ``boiw``
    leaves from the checkpoint into ``state`` wherever the key exists
    and the shape matches; everything else (step, optimizer moments,
    rng, mismatched or missing leaves) keeps the fresh-init value.  A
    checkpoint without ``ema_params`` (stripped artifact) seeds EMA from
    its ``params``.  Returns ``(state, n_loaded, skipped)`` where
    ``skipped`` lists ``(key, reason)``."""
    from flax import serialization
    from flax.traverse_util import flatten_dict, unflatten_dict

    raw = restore_raw(path)
    if not isinstance(raw, dict):
        raw = serialization.to_state_dict(raw)
    if "params" not in raw:      # bare params tree artifact
        raw = {"params": raw}
    if "ema_params" not in raw and "params" in raw:
        raw = dict(raw)
        raw["ema_params"] = raw["params"]

    target = serialization.to_state_dict(state)
    flat_t = flatten_dict(target, keep_empty_nodes=True)
    flat_r = flatten_dict(
        {k: v for k, v in raw.items() if k in WEIGHT_SECTIONS and
         v is not None})
    n_loaded, skipped = 0, []
    for key, val in flat_r.items():
        if key not in flat_t:
            skipped.append(("/".join(map(str, key)), "missing in model"))
            continue
        cur = flat_t[key]
        val = np.asarray(val)
        if np.shape(cur) != val.shape:
            skipped.append(("/".join(map(str, key)),
                            f"shape {val.shape} vs {np.shape(cur)}"))
            continue
        flat_t[key] = val.astype(np.asarray(cur).dtype)
        n_loaded += 1
    merged = unflatten_dict(flat_t)
    return (serialization.from_state_dict(state, merged), n_loaded,
            skipped)


def train(cfg: Config, dataset: Optional[CocoDataset] = None,
          max_steps: Optional[int] = None,
          eval_fn: Optional[Callable] = None) -> TrainState:
    """Run the full training schedule. ``max_steps`` truncates for tests.

    eval_fn(state, epoch) is the EvalHook analog, called per epoch.

    ``cfg.train.freeze_epochs > 0`` selects the two-phase frozen-backbone
    recipe (yolox-drone train.py:196-262): phase 1 trains
    ``freeze_epochs`` epochs at ``freeze_lr`` / ``freeze_batch_size``
    with ``freeze_sections`` params frozen, then phase 2 rebuilds a
    fresh optimizer (like the reference's new ``optim.Adam`` per phase)
    and trains the remaining epochs unfrozen at ``base_lr`` /
    ``data.batch_size``.  Checkpoint/eval epoch numbering is continuous
    across phases.
    """
    if cfg.train.freeze_epochs > 0:
        if cfg.train.max_iters > 0:
            # each phase would otherwise apply the FULL max_iters budget
            # independently (2x the asked steps); the reference also has
            # no iter-based two-phase recipe (IterBasedRunner vs the
            # drone trainer's epoch phases) — reject the combination
            raise ValueError(
                "train.max_iters (iteration-based mode) cannot be "
                "combined with train.freeze_epochs (the epoch-based "
                "two-phase freeze recipe)")
        return _train_two_phase(cfg, dataset, max_steps, eval_fn)
    return _train_run(cfg, dataset, max_steps, eval_fn)


def _train_two_phase(cfg: Config, dataset, max_steps, eval_fn):
    import copy

    t = cfg.train
    if t.resume:
        raise ValueError(
            "resume with freeze_epochs is ambiguous (which phase?): "
            "resume the unfrozen phase explicitly with freeze_epochs=0, "
            "the reduced epoch count and resume=<ckpt> (the reference's "
            "manual Init_Epoch), or restart the two-phase run with "
            "load_from.")
    if t.freeze_epochs >= t.epochs:
        raise ValueError(f"freeze_epochs {t.freeze_epochs} must be < "
                         f"epochs {t.epochs}")

    p1 = copy.deepcopy(cfg)
    p1.train.epochs = t.freeze_epochs
    if t.freeze_lr:
        p1.train.base_lr = t.freeze_lr
    if t.freeze_batch_size:
        p1.data.batch_size = t.freeze_batch_size
    # the no-aug+L1 tail belongs to the END of the overall schedule
    p1.train.num_last_epochs = 0
    logger.info("freeze phase: %d epochs, lr %g, batch %d, frozen %s",
                p1.train.epochs, p1.train.base_lr, p1.data.batch_size,
                t.freeze_sections)
    state = _train_run(p1, dataset, max_steps, eval_fn,
                       frozen_sections=tuple(t.freeze_sections))

    used = int(state.step)
    if max_steps is not None and used >= max_steps:
        return state

    p2 = copy.deepcopy(cfg)
    p2.train.epochs = t.epochs - t.freeze_epochs
    p2.train.load_from = ""     # weights carry over in memory
    logger.info("unfreeze phase: %d epochs, lr %g, batch %d",
                p2.train.epochs, p2.train.base_lr, p2.data.batch_size)
    return _train_run(p2, dataset,
                      None if max_steps is None else max_steps - used,
                      eval_fn, carry_state=state,
                      epoch_offset=t.freeze_epochs)


def _train_run(cfg: Config, dataset: Optional[CocoDataset] = None,
               max_steps: Optional[int] = None,
               eval_fn: Optional[Callable] = None,
               frozen_sections: Tuple[str, ...] = (),
               carry_state: Optional[TrainState] = None,
               epoch_offset: int = 0) -> TrainState:
    """One optimizer lifetime (both single-phase training and each phase
    of the freeze/unfreeze recipe).  ``carry_state`` seeds weights
    (params / batch_stats / EMA / BoIW / rng) from a previous phase into
    a fresh optimizer; ``epoch_offset`` keeps checkpoint, log and eval
    epoch numbering continuous across phases."""
    os.makedirs(cfg.train.work_dir, exist_ok=True)
    log_path = os.path.join(cfg.train.work_dir, "train.log.json")
    rng = jax.random.PRNGKey(cfg.train.seed)

    # ── parallel layout ──────────────────────────────────────────────
    # cfg.data.batch_size is the GLOBAL batch.  Single process: shard it
    # over the largest device prefix that divides it (1 device = the
    # unsharded fast path, identical to before).  Multi-process (the
    # dist_train.sh / DDP analog): every process loads its 1/n_proc
    # slice via DistributedGroupSampler and the slices are assembled
    # into one global array per step — the reference's
    # MMDistributedDataParallel data path (mmdet/apis/train.py:113-121)
    # as a global-view jit.
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0
    if n_proc > 1:
        if cfg.data.batch_size % (n_proc * jax.local_device_count()):
            raise ValueError(
                f"global batch {cfg.data.batch_size} not divisible by "
                f"{n_proc} processes x {jax.local_device_count()} "
                "local devices")
        n_use = len(jax.devices())
    else:
        n_use = len(jax.devices())
        while cfg.data.batch_size % n_use:
            n_use -= 1
    mesh = None
    if n_use > 1 or n_proc > 1:
        from glsdet_tpu.parallel.mesh import data_mesh

        mesh = data_mesh(None if n_proc > 1 else n_use)
        batch_sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data"))
        repl_sh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())
        logger.info("data-parallel mesh: %d devices, %d processes",
                    n_use, n_proc)

    if dataset is None:
        dataset = CocoDataset(cfg.data.ann_file, cfg.data.img_root,
                              filter_empty=True,
                              cache_images=cfg.data.cache_images,
                              cache_bytes=cfg.data.cache_bytes)
    pipeline = TrainPipeline(
        dataset, cfg.data.img_hw, cfg.data.max_gt,
        mosaic=cfg.data.mosaic, enable_mixup=cfg.data.mixup,
        hsv=cfg.data.hsv, flip_prob=cfg.data.flip_prob,
        raw_uint8=True, device_color=cfg.data.device_color)
    steps_per_epoch = max(len(dataset) // cfg.data.batch_size, 1)
    # iteration-based mode (mmdet IterBasedRunner analog): an exact
    # optimizer-step budget on the infinite grouped sample stream;
    # epoch-cadenced hooks keep firing every steps_per_epoch steps
    iter_based = cfg.train.max_iters > 0
    if iter_based:
        max_steps = (cfg.train.max_iters if max_steps is None
                     else min(max_steps, cfg.train.max_iters))

    model = build_model(cfg)
    tx = build_optimizer(cfg, steps_per_epoch,
                         frozen_sections=frozen_sections)

    # jitted init at a small spatial size: eager init is thousands of
    # tiny dispatches (minutes on a remote-tunnel TPU); shapes are
    # resolution-independent for these fully-convolutional models
    init_hw = (min(cfg.data.img_hw[0], 256), min(cfg.data.img_hw[1], 256))
    sample = jnp.zeros((1, *init_hw, 3), jnp.float32)
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False))(rng, sample)
    boiw = None
    if cfg.model.family == "mpdet":
        boiw = init_boiw(rng, cfg.model.num_classes, cfg.model.num_words,
                         cfg.model.feat_channels, cfg.model.proxies_list)
    state = TrainState.create(variables, tx, rng, boiw=boiw)
    if carry_state is not None:
        # phase handoff: weights/statistics continue, the optimizer
        # trajectory does not (fresh moments + schedule, like the
        # reference's per-phase optim.Adam); step stays 0 so the new
        # schedule starts at its own warmup
        state = state.replace(
            params=carry_state.params,
            batch_stats=carry_state.batch_stats,
            ema_params=carry_state.ema_params,
            boiw=carry_state.boiw,
            rng=carry_state.rng)
    if mesh is not None:
        state = jax.device_put(state, repl_sh)

    if cfg.train.resume:
        state = restore_checkpoint(cfg.train.resume, state)
        logger.info("resumed from %s at step %d", cfg.train.resume,
                    int(state.step))
    elif cfg.train.load_from:   # resume wins, like mmdet apis/train.py
        state, n_loaded, skipped = load_weights(cfg.train.load_from,
                                                state)
        logger.info("loaded %d weight arrays from %s (%d skipped)",
                    n_loaded, cfg.train.load_from, len(skipped))
        for key, reason in skipped:
            logger.info("  skipped %s: %s", key, reason)
    if mesh is not None:   # restored/loaded leaves back onto the mesh
        state = jax.device_put(state, repl_sh)

    # donate the state buffers: params/opt-state/EMA update in place
    # instead of allocating a second copy every step
    if cfg.model.family == "mpdet":
        raw_step = make_mpdet_train_step(
            model, tx, cfg.data.img_hw, cfg.model.num_classes,
            cfg.model.proxies_list, reg_max=cfg.model.reg_max,
            gamma=cfg.model.gamma, normalize=True)
        raw_step_l1 = raw_step
    elif cfg.model.family == "gfl":
        raw_step = make_gfl_train_step(
            model, tx, cfg.data.img_hw, cfg.model.num_classes,
            reg_max=cfg.model.reg_max, normalize=True)
        raw_step_l1 = raw_step
    else:
        strides = family_strides(cfg.model.family)
        raw_step = make_yolox_train_step(
            model, tx, cfg.data.img_hw, use_l1=False, strides=strides,
            normalize=True, bbox_loss_mode=cfg.train.bbox_loss_mode)
        raw_step_l1 = make_yolox_train_step(
            model, tx, cfg.data.img_hw, use_l1=True, strides=strides,
            normalize=True, bbox_loss_mode=cfg.train.bbox_loss_mode)
    step_fn = jax.jit(raw_step, donate_argnums=(0,))
    step_fn_l1 = (step_fn if raw_step_l1 is raw_step
                  else jax.jit(raw_step_l1, donate_argnums=(0,)))

    # multi-scale training: one compiled step per size, each resizing
    # the base-size batch on device (SyncRandomSizeHook analog; see
    # config TrainConfig.multiscale_sizes).  jax.jit is lazy, so only
    # sizes the schedule actually visits pay a compile.
    ms_sizes = tuple(cfg.train.multiscale_sizes or ())
    ms_steps = {}
    if ms_sizes:
        if cfg.model.family in ("mpdet", "gfl"):
            raise ValueError(
                "train.multiscale_sizes is a YOLOX-recipe feature "
                "(the MP-Det recipe trains fixed-size crops)")
        strides = family_strides(cfg.model.family)
        for s in ms_sizes:
            if s % 32:
                raise ValueError(f"multiscale size {s} not a 32-multiple")
            mk = lambda use_l1, s=s: make_yolox_train_step(
                model, tx, (s, s), use_l1=use_l1, strides=strides,
                normalize=True, resize_from=cfg.data.img_hw,
                bbox_loss_mode=cfg.train.bbox_loss_mode)
            ms_steps[s] = (jax.jit(mk(False), donate_argnums=(0,)),
                           jax.jit(mk(True), donate_argnums=(0,)))

    # K optimizer steps per dispatch (config.train.steps_per_call,
    # steps.py make_scan_train_step). Host hooks fire at group
    # boundaries, so hook intervals must align.
    spc = max(int(cfg.train.steps_per_call), 1)
    group_fn = group_fn_l1 = None
    group_sh = None
    if ms_sizes and spc > 1:
        raise ValueError(
            "train.multiscale_sizes requires steps_per_call=1 (per-size "
            "scan-group programs would multiply the compile budget; pick "
            "one of the two)")
    if spc > 1:
        for knob in ("ot_interval", "log_interval"):
            val = getattr(cfg.train, knob)
            if val % spc:
                raise ValueError(
                    f"train.{knob}={val} must be a multiple of "
                    f"train.steps_per_call={spc} (host hooks run at "
                    "scan-group boundaries)")
        group_fn = jax.jit(make_scan_train_step(raw_step),
                           donate_argnums=(0,))
        group_fn_l1 = (group_fn if raw_step_l1 is raw_step
                       else jax.jit(make_scan_train_step(raw_step_l1),
                                    donate_argnums=(0,)))
        if mesh is not None:
            # stacked batches are (K, B, ...): shard the BATCH axis
            group_sh = jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(None, "data"))

    local_batch = cfg.data.batch_size // n_proc
    sampler = None
    if iter_based:
        from glsdet_tpu.data.loader import InfiniteGroupBatchSampler

        sampler = InfiniteGroupBatchSampler(
            dataset, local_batch, num_replicas=n_proc,
            rank=jax.process_index(), seed=cfg.train.seed)
    elif n_proc > 1:
        from glsdet_tpu.data.loader import DistributedGroupSampler

        sampler = DistributedGroupSampler(
            dataset, local_batch, num_replicas=n_proc,
            rank=jax.process_index(), seed=cfg.train.seed)
    loader = train_loader(pipeline, local_batch,
                          seed=cfg.train.seed + jax.process_index(),
                          num_threads=cfg.data.num_workers,
                          sampler=sampler)

    def put_batch(batch):
        if n_proc > 1:
            return {
                k: jax.make_array_from_process_local_data(
                    batch_sh, v, (cfg.data.batch_size, *v.shape[1:]))
                for k, v in batch.items()
            }
        if mesh is not None:
            return jax.device_put(batch, batch_sh)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def put_group(stacked):
        # (K, B, ...) scan-group input; the batch axis (1) is sharded
        if n_proc > 1:
            return {
                k: jax.make_array_from_process_local_data(
                    group_sh, v,
                    (spc, cfg.data.batch_size, *v.shape[2:]))
                for k, v in stacked.items()
            }
        if mesh is not None:
            return jax.device_put(stacked, group_sh)
        return {k: jnp.asarray(v) for k, v in stacked.items()}

    start_epoch = int(state.step) // steps_per_epoch
    global_step = int(state.step)
    t_iter = time.time()
    ot_rng = np.random.RandomState(cfg.train.seed + 1)
    # jitted OT update: eager cosine-kmeans is hundreds of tiny dispatches
    jit_update_ot = jax.jit(
        lambda b, k: update_ot(b, k, cfg.model.proxies_list))

    n_epochs = cfg.train.epochs
    if iter_based:
        # enough epoch-shaped chunks to cover the step budget; the
        # max_steps check inside the loop stops exactly at max_iters
        n_epochs = start_epoch - (-max_steps // steps_per_epoch) + 1
    for epoch in range(start_epoch, n_epochs):
        # epoch-indexed hooks run on the GLOBAL epoch so schedules stay
        # continuous across freeze/unfreeze phases (epoch_offset=0 in
        # single-phase runs)
        gepoch = epoch + epoch_offset
        # the last-epochs mode switch (no-aug + L1) is an epoch-recipe
        # feature; iter-based runs keep augmentation on throughout
        last_phase = (not iter_based and
                      epoch >= cfg.train.epochs - cfg.train.num_last_epochs)
        if last_phase:
            pipeline.disable_aug()
        fn = step_fn_l1 if last_phase else step_fn
        gfn = group_fn_l1 if last_phase else group_fn

        # OT hook: beta switch at emd_start_epoch (mpdet only)
        if (cfg.model.family == "mpdet"
                and gepoch == cfg.train.emd_start_epoch
                and state.boiw is not None):
            state = state.replace(boiw=enable_emd_training(state.boiw))
            logger.info("epoch %d: enabled emd training (beta=1)", gepoch)

        it = 0
        while it < steps_per_epoch:
            if max_steps is not None and global_step >= max_steps:
                finish_checkpoints()
                return state
            # scan groups only when a FULL group fits (one compiled
            # group shape); epoch/max_steps tails run as single steps
            use_group = (
                gfn is not None
                and it + spc <= steps_per_epoch
                and (max_steps is None or global_step + spc <= max_steps))
            if use_group:
                stacked = stack_batches(
                    [next(loader) for _ in range(spc)])
                state, metrics_k = gfn(state, put_group(stacked))
                # report the LAST micro-step's metrics, but fold the
                # whole (K,) loss vector into the invalid-loss check: a
                # transient NaN at micro-step j<K-1 must trip the
                # CheckInvalidLoss guard on this boundary, not K steps
                # later when the poisoned params resurface it
                metrics = {k: v[-1] for k, v in metrics_k.items()}
                metrics["loss"] = jnp.where(
                    jnp.all(jnp.isfinite(metrics_k["loss"])),
                    metrics["loss"], jnp.float32(jnp.nan))
                stepped = spc
            else:
                batch = next(loader)
                if ms_steps:
                    s = multiscale_size(global_step, ms_sizes,
                                        cfg.train.multiscale_interval)
                    sized = ms_steps[s]
                    fn_ms = sized[1] if last_phase else sized[0]
                    state, metrics = fn_ms(state, put_batch(batch))
                else:
                    state, metrics = fn(state, put_batch(batch))
                stepped = 1
            it += stepped
            global_step += stepped

            # bound in-flight async work: without a periodic real sync the
            # dispatch queue retains every step's host batch buffers (OOM
            # at ~200 in-flight 47MB batches on remote backends whose
            # block_until_ready is advisory). "crossed a multiple of 10"
            # (== `% 10 == 0` when stepped == 1)
            if global_step % 10 < stepped:
                float(metrics["loss"])

            # OT hook: update_ot every ot_interval while epoch < stop
            # (crossing semantics: epoch-tail single steps may leave
            # global_step misaligned from the group stride)
            if (cfg.model.family == "mpdet"
                    and gepoch < cfg.train.ot_stop_epoch
                    and global_step % cfg.train.ot_interval < stepped):
                key = jax.random.PRNGKey(int(ot_rng.randint(2 ** 31)))
                state = state.replace(
                    boiw=jit_update_ot(state.boiw, key))
                logger.info("step %d: ran update_ot", global_step)

            if global_step % cfg.train.log_interval < stepped:
                vals = {k: float(v) for k, v in metrics.items()}
                # CheckInvalidLossHook analog
                if not np.isfinite(vals["loss"]):
                    raise FloatingPointError(
                        f"non-finite loss at step {global_step}: {vals}")
                dt = (time.time() - t_iter) / cfg.train.log_interval
                t_iter = time.time()
                entry = {"mode": "train", "epoch": gepoch + 1,
                         "iter": it, "step": global_step,
                         "time": round(dt, 4), **vals}
                logger.info("%s", entry)
                if is_main:
                    with open(log_path, "a") as f:
                        f.write(json.dumps(entry) + "\n")

        # state is replicated, so process 0 alone writes checkpoints and
        # runs the eval hook (the reference gates these on rank 0 too)
        if is_main and (gepoch + 1) % cfg.train.ckpt_interval == 0:
            # async: disk write overlaps the next epoch (joined by the
            # next save or by finish_checkpoints below)
            save_checkpoint(cfg.train.work_dir, state, gepoch + 1,
                            wait=False)
        if eval_fn is not None and is_main:
            eval_fn(state, gepoch + 1)

    finish_checkpoints()
    return state
