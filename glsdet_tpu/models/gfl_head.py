"""GFL head (Generalized Focal Loss), flax/NHWC.

Behavioral reference: ``yolox-ufp/mmdet/models/dense_heads/gfl_head.py:53``
with mmdet GFL defaults: 4 stacked 3x3 ConvModules (GroupNorm-32 + ReLU)
per tower **shared across pyramid levels**, a 3x3 cls predictor, a 3x3 reg
predictor emitting ``4*(reg_max+1)`` distribution logits, and one learnable
``Scale`` per level on the reg output.  Anchor-free single-anchor setting
(num_anchors == 1) as asserted by the reference MPHead (mp_head.py:67).

The head emits raw per-level maps; loss/decode live in
``glsdet_tpu.train.gfl_loss`` / ``glsdet_tpu.eval.postprocess`` so that the
forward is a clean jittable function reusable for both stages.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from glsdet_tpu.models.layers import ConvNormAct, Scale, remat_active, remat_policy


class GFLHead(nn.Module):
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    reg_max: int = 16
    dtype: Any = jnp.float32
    remat: bool = False  # jax.checkpoint each level's towers (the tower
    # activations dominate the train-time memory of the whole detector)

    @nn.compact
    def __call__(self, feats, *, train: bool = False):
        assert len(feats) == self.num_levels
        cls_convs = [
            ConvNormAct(self.feat_channels, 3, 1, norm="gn", act="relu",
                        dtype=self.dtype, name=f"cls_conv{i}")
            for i in range(self.stacked_convs)
        ]
        reg_convs = [
            ConvNormAct(self.feat_channels, 3, 1, norm="gn", act="relu",
                        dtype=self.dtype, name=f"reg_conv{i}")
            for i in range(self.stacked_convs)
        ]
        bias_init = nn.initializers.constant(float(-np.log((1 - 0.01) / 0.01)))
        gfl_cls = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                          dtype=self.dtype, bias_init=bias_init,
                          kernel_init=nn.initializers.normal(0.01),
                          name="gfl_cls")
        gfl_reg = nn.Conv(4 * (self.reg_max + 1), (3, 3),
                          padding=[(1, 1), (1, 1)], dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          name="gfl_reg")
        scales = [Scale(1.0, name=f"scale{i}") for i in range(self.num_levels)]

        def level(mdl, x, lvl):
            # mdl is self; the shared tower children register on its
            # scope (param names unchanged vs the inline loop)
            del mdl
            cls_feat, reg_feat = x, x
            for conv in cls_convs:
                cls_feat = conv(cls_feat, train=train)
            for conv in reg_convs:
                reg_feat = conv(reg_feat, train=train)
            return (gfl_cls(cls_feat),
                    scales[lvl](gfl_reg(reg_feat)).astype(jnp.float32))

        # remat only at apply time: during init the shared tower children
        # must be created outside any lifted transform (see mp_head.py)
        use_remat = remat_active(self.remat) and not self.is_initializing()
        run = (nn.remat(level, prevent_cse=False, static_argnums=(2,),
                        policy=remat_policy())
               if use_remat else level)
        cls_scores, bbox_preds = [], []
        for lvl, x in enumerate(feats):
            cs, bp = run(self, x, lvl)
            cls_scores.append(cs)
            bbox_preds.append(bp)
        return cls_scores, bbox_preds
