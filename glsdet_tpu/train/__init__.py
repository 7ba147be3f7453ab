"""Training stack: losses, targets, state, schedules, steps, BoIW."""

from glsdet_tpu.train.boiw import (
    BoIWState,
    enable_emd_training,
    init_boiw,
    update_dictionary,
    update_ot,
)
from glsdet_tpu.train.gfl_loss import GFLLossOut, GFLTargets, gfl_loss, gfl_targets
from glsdet_tpu.train.mp_loss import MPLossOut, contrastive_loss, mp_loss, ot_proxy_loss
from glsdet_tpu.train.schedules import (
    ema_momentum,
    epoch_step_decay,
    mp_det_sgd,
    schedule_1x,
    yolox_sgd,
    yolox_warm_cos,
)
from glsdet_tpu.train.state import TrainState, apply_updates
from glsdet_tpu.train.steps import (
    make_gfl_train_step,
    make_mpdet_train_step,
    make_scan_train_step,
    make_yolox_train_step,
    stack_batches,
)
from glsdet_tpu.train.yolox_loss import (
    YOLOXLossOut,
    yolox_loss,
    yolox_loss_3assign,
    yolox_loss_decoupled,
    yolox_loss_fpn_weight,
)

__all__ = [
    "BoIWState",
    "enable_emd_training",
    "init_boiw",
    "update_dictionary",
    "update_ot",
    "GFLLossOut",
    "GFLTargets",
    "gfl_loss",
    "gfl_targets",
    "MPLossOut",
    "contrastive_loss",
    "mp_loss",
    "ot_proxy_loss",
    "ema_momentum",
    "epoch_step_decay",
    "mp_det_sgd",
    "schedule_1x",
    "yolox_sgd",
    "yolox_warm_cos",
    "TrainState",
    "apply_updates",
    "make_gfl_train_step",
    "make_mpdet_train_step",
    "make_scan_train_step",
    "make_yolox_train_step",
    "stack_batches",
    "YOLOXLossOut",
    "yolox_loss",
    "yolox_loss_3assign",
    "yolox_loss_decoupled",
    "yolox_loss_fpn_weight",
]
