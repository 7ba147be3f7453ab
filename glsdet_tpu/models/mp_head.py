"""MPHead — multi-proxy semantic-guidance head (the GLSDet novelty).

Behavioral reference: ``yolox-ufp/mmdet/models/dense_heads/mp_head.py:23``.
A GFL head whose 1x1 class predictor is replaced by cosine classification
against learnable per-class proxies:

- ``proxies``: (sum(proxies_list), C) learnable, L2-normalized at use;
  default VisDrone split [2,3,2,5,4,8,8,4,3,3] (mp_head.py:31).
- class score = gamma * sum_p softmax_p(gamma*sim) * sim over the class's
  proxies (mp_head.py:105-121) — here vectorized as two (N,P)x(P,C)
  matmuls with a class-membership matrix instead of the reference's
  per-class python loop, so the whole proxy head is MXU work.
- BoIW dictionary: a (num_classes+1, num_words, C) ring buffer of cls
  features + per-class pointer (mp_head.py:78-81).  In this functional
  rebuild the dictionary is NOT a module buffer — it lives in the train
  state (``glsdet_tpu.train.boiw``) and is updated with pure functions, so
  the train step stays a single jitted program.
- Extra losses (contrastive vs. dictionary, Sinkhorn OT to proxies) are in
  ``glsdet_tpu.train.mp_loss``.

Training forward returns per-level (cls_feat, bbox_pred) exactly like the
reference (mp_head.py:147-148); inference applies the proxy classifier.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from glsdet_tpu.models.layers import ConvNormAct, Scale, remat_active, remat_policy

VISDRONE_PROXIES = (2, 3, 2, 5, 4, 8, 8, 4, 3, 3)


def proxy_class_matrix(proxies_list: Sequence[int]) -> np.ndarray:
    """(num_proxies, num_classes) one-hot membership matrix."""
    total = sum(proxies_list)
    mat = np.zeros((total, len(proxies_list)), dtype=np.float32)
    start = 0
    for c, n in enumerate(proxies_list):
        mat[start:start + n, c] = 1.0
        start += n
    return mat


def proxy_scores(feat: jnp.ndarray, proxies: jnp.ndarray,
                 membership: jnp.ndarray, gamma: float = 10.0,
                 return_sim: bool = False):
    """Cosine multi-proxy classification (mp_head.py:105-121), vectorized.

    Args:
        feat: (N, C) raw cls features.
        proxies: (P, C) raw proxy vectors.
        membership: (P, num_classes) one-hot proxy-to-class matrix.

    Returns:
        (N, num_classes) scores (logit-like, pre-sigmoid); optionally the
        raw (N, P) cosine similarities.
    """
    f = feat * jax.lax.rsqrt(
        jnp.sum(feat * feat, axis=-1, keepdims=True) + 1e-12)
    p = proxies * jax.lax.rsqrt(
        jnp.sum(proxies * proxies, axis=-1, keepdims=True) + 1e-12)
    sim = f @ p.T  # (N, P), in [-1, 1]
    # per-class softmax over that class's proxies: gamma*sim <= gamma so a
    # plain exp is numerically safe (gamma = 10).
    e = jnp.exp(gamma * sim)
    denom = e @ membership  # (N, C)
    num = (e * sim) @ membership
    scores = gamma * num / jnp.maximum(denom, 1e-12)
    if return_sim:
        return scores, sim
    return scores


class MPHead(nn.Module):
    """GFL-structured head with proxy classifier. Shares tower layout with
    ``gfl_head.GFLHead`` but predicts a C-dim cls *feature* map."""

    num_classes: int = 10
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    reg_max: int = 16
    gamma: float = 10.0
    proxies_list: Sequence[int] = VISDRONE_PROXIES
    dtype: Any = jnp.float32
    remat: bool = False  # jax.checkpoint each level's towers (see GFLHead)

    @nn.compact
    def __call__(self, feats, *, train: bool = False):
        """Returns (cls_out, bbox_preds):

        train=True:  cls_out = per-level (B,H,W,C) cls features.
        train=False: cls_out = per-level (B,H,W,num_classes) proxy scores.
        """
        assert len(feats) == self.num_levels
        assert self.num_classes == len(self.proxies_list)
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
        gfl_cls_conv = nn.Conv(
            self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.dtype, kernel_init=nn.initializers.normal(0.01),
            name="gfl_cls_conv")
        gfl_reg = nn.Conv(
            4 * (self.reg_max + 1), (3, 3), padding=[(1, 1), (1, 1)],
            dtype=self.dtype, kernel_init=nn.initializers.normal(0.01),
            name="gfl_reg")
        scales = [Scale(1.0, name=f"scale{i}") for i in range(self.num_levels)]
        proxies = self.param(
            "proxies", nn.initializers.normal(0.01),
            (sum(self.proxies_list), self.feat_channels))
        membership = jnp.asarray(proxy_class_matrix(self.proxies_list))

        def level(mdl, x, lvl):
            # mdl is self; shared tower children register on its scope
            # (param names identical to the inline loop)
            del mdl
            cls_feat, reg_feat = x, x
            for conv in cls_convs:
                cls_feat = conv(cls_feat, train=train)
            for conv in reg_convs:
                reg_feat = conv(reg_feat, train=train)
            return (gfl_cls_conv(cls_feat),
                    scales[lvl](gfl_reg(reg_feat)).astype(jnp.float32))

        # remat only at apply time: during init the shared tower children
        # must be *created* outside any lifted transform (a child created
        # inside one remat trace and reused in the next leaks tracers)
        use_remat = remat_active(self.remat) and not self.is_initializing()
        run = (nn.remat(level, prevent_cse=False, static_argnums=(2,),
                        policy=remat_policy())
               if use_remat else level)
        cls_out, bbox_preds = [], []
        for lvl, x in enumerate(feats):
            cls_feat, bp = run(self, x, lvl)
            bbox_preds.append(bp)
            if train:
                cls_out.append(cls_feat)
            else:
                b, h, w, c = cls_feat.shape
                scores = proxy_scores(
                    cls_feat.reshape(-1, c).astype(jnp.float32),
                    proxies.astype(jnp.float32), membership, self.gamma)
                cls_out.append(scores.reshape(b, h, w, self.num_classes))
        return cls_out, bbox_preds
