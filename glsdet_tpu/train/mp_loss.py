"""MP-Det training loss: GFL + contrastive BoIW + Sinkhorn OT-to-proxies.

Behavioral reference: mp_head.py ``loss``/``loss_single`` (:307-478):
 - cls scores come from the multi-proxy cosine classifier over raw cls
   features (forward_proxy :105),
 - ``loss_emb`` (contrastive :272): softmax over the flattened
   (num_classes+1) x num_words dictionary, positives = own-class words,
   weighted by label weights, / num_total_samples / num_words, x beta,
 - ``loss_op`` (:226-270): per-class Sinkhorn transport between that
   class's positive features and its proxies (cost = normalized cosine
   distance, reg 0.1, target marginal = current ``proxies_prob``),
   averaged over classes, x beta,
 - the BoIW dictionary ring-buffer update happens inside the loss pass
   (:247) — here it returns a new functional state instead of mutating.

Fixed-shape strategy: the OT loss caps positives per class at
``max_pos_per_class`` random-ish (top-k by mask) anchors with a row mask —
VisDrone images rarely exceed ~100 positives per class per batch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.models.mp_head import proxy_scores
from glsdet_tpu.ops.sinkhorn import sinkhorn
from glsdet_tpu.ops.topk import first_k_true
from glsdet_tpu.train.boiw import BoIWState, update_dictionary
from glsdet_tpu.train.gfl_loss import GFLTargets, gfl_loss


def contrastive_loss(features: jnp.ndarray, labels: jnp.ndarray,
                     embedding: jnp.ndarray, num_total_samples: jnp.ndarray,
                     weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """BoIW contrastive loss (mp_head.py:272-305).

    features: (N, C) raw cls features; labels: (N,) in [0, num_classes];
    embedding: (num_classes+1, num_words, C).
    """
    num_slots, num_words, c = embedding.shape
    f = features * jax.lax.rsqrt(
        jnp.sum(features * features, -1, keepdims=True) + 1e-12)
    e = embedding.reshape(-1, c)
    e = e * jax.lax.rsqrt(jnp.sum(e * e, -1, keepdims=True) + 1e-12)
    logits = (f @ e.T).reshape(-1, num_slots, num_words)
    # exp-sum over words per slot; sims are in [-1, 1] so exp is safe
    exp_slot = jnp.exp(logits).sum(-1)  # (N, num_slots)
    total = exp_slot.sum(-1)
    # one-hot sum, not take_along_axis: per-row gathers on (N, slots)
    # tensors are ~8x slower than the masked reduce at N≈175k
    # (losses/__init__.py DFL note)
    # labels MUST be in [0, num_classes] (num_classes = bg slot): an
    # out-of-range label gives an all-zero one-hot row -> pos=0 ->
    # log(0) = -inf; the floor below keeps that finite (matching the
    # old clamped-gather behavior: wrong value, not NaN propagation)
    onehot = jax.nn.one_hot(labels, num_slots, dtype=exp_slot.dtype)
    pos = jnp.sum(exp_slot * onehot, axis=1)
    log_prob = jnp.log(jnp.maximum(pos, 1e-12) / jnp.maximum(total, 1e-12))
    if weights is not None:
        log_prob = log_prob * weights
    return -jnp.sum(log_prob) / num_total_samples / num_words


def ot_proxy_loss(features: jnp.ndarray, labels: jnp.ndarray,
                  proxies: jnp.ndarray, proxies_prob: jnp.ndarray,
                  proxies_list: Sequence[int],
                  max_pos_per_class: int = 256,
                  reg: float = 0.1, num_iters: int = 100) -> jnp.ndarray:
    """Sinkhorn OT loss (mp_head.py:254-270), fixed-shape.

    All classes run as ONE vmapped Sinkhorn over a (C, K, maxP) padded
    cost tensor — 100 batched iterations instead of the reference's
    C x 100 sequential tiny-matmul steps (the per-class python loop is
    latency-bound on an accelerator).
    """
    num_classes = len(proxies_list)
    max_p = max(proxies_list)
    f = features * jax.lax.rsqrt(
        jnp.sum(features * features, -1, keepdims=True) + 1e-12)
    p = proxies * jax.lax.rsqrt(
        jnp.sum(proxies * proxies, -1, keepdims=True) + 1e-12)
    sim = f @ p.T  # (N, P)
    dis = 1.0 - (sim + 1.0) / 2.0  # normalized cosine distance

    n = features.shape[0]
    k = min(max_pos_per_class, n)
    # per-class first-k positive selection, batched: (C, N) -> (C, K).
    # first_k_true == lax.top_k on the 0/1 mask (stable ties = first k
    # set bits) but costs one cumsum instead of a 175k-element sort
    # (ops/topk.py; was ~1/3 of the whole mp_loss forward)
    class_ids = jnp.arange(num_classes)[:, None]
    masks = labels[None, :] == class_ids                    # (C, N)
    idx, valid = first_k_true(masks, k)                     # (C, K)

    # padded per-class cost blocks (C, K, maxP); pad columns get zero
    # marginal so they are inert in the transport plan
    starts = np.cumsum([0] + list(proxies_list))[:-1]
    cost = jnp.zeros((num_classes, k, max_p), f.dtype)
    ut = jnp.zeros((num_classes, max_p), f.dtype)
    col_ok = jnp.zeros((num_classes, max_p), bool)
    for c, (s0, nprox) in enumerate(zip(starts, proxies_list)):
        rows = dis[idx[c]]  # (K, P)
        cost = cost.at[c, :, :nprox].set(
            jax.lax.dynamic_slice_in_dim(rows, int(s0), nprox, axis=1))
        ut = ut.at[c, :nprox].set(
            jax.lax.dynamic_slice_in_dim(proxies_prob, int(s0), nprox))
        col_ok = col_ok.at[c, :nprox].set(True)

    def one(cost_c, ut_c, valid_c):
        # Backprop THROUGH the scaling iterations (differentiable scan),
        # matching the reference's torch loop (mp_head.py:156-182).  The
        # plan is NOT a constant under differentiation: the envelope
        # theorem applies to the full entropic objective <P,C> + reg*H,
        # not to <P,C> alone — d<P*(C),C>/dC = P* + <dP*/dC, C>, and the
        # second term measures ~30% of the first on small fixtures
        # (tests/test_sinkhorn_grad.py, central finite differences).
        plan = sinkhorn(cost_c, target_marginal=ut_c, reg=reg,
                        num_iters=num_iters, row_mask=valid_c,
                        differentiable=True)
        has_pos = jnp.any(valid_c)
        return jnp.where(has_pos, jnp.sum(plan * cost_c), 0.0)

    losses = jax.vmap(one)(cost, ut, valid)
    return losses.sum() / num_classes


class MPLossOut(NamedTuple):
    total: jnp.ndarray
    loss_cls: jnp.ndarray
    loss_bbox: jnp.ndarray
    loss_dfl: jnp.ndarray
    loss_emb: jnp.ndarray
    loss_op: jnp.ndarray
    boiw: BoIWState


def mp_loss(
    cls_feats: jnp.ndarray,
    bbox_pred_logits: jnp.ndarray,
    proxies: jnp.ndarray,
    membership: jnp.ndarray,
    boiw: BoIWState,
    rng: jax.Array,
    targets: GFLTargets,
    anchor_centers: jnp.ndarray,
    anchor_strides: jnp.ndarray,
    num_classes: int,
    proxies_list: Sequence[int],
    reg_max: int = 16,
    gamma: float = 10.0,
    axis_name: Optional[str] = None,
) -> MPLossOut:
    """Full MP-Det loss over flattened levels.

    cls_feats: (B, A, C) raw cls features from MPHead (train mode).
    """
    b, a, c = cls_feats.shape
    feat_flat = cls_feats.reshape(-1, c).astype(jnp.float32)
    labels_flat = targets.labels.reshape(-1)

    scores = proxy_scores(feat_flat, proxies.astype(jnp.float32),
                          membership, gamma)  # (B*A, num_classes)
    gfl = gfl_loss(
        scores.reshape(b, a, num_classes), bbox_pred_logits, targets,
        anchor_centers, anchor_strides, num_classes, reg_max,
        # MPHead divides by the RAW weight sum (mp_head.py:473, no
        # clamp); the tiny floor only turns the reference's 0/0-NaN
        # case (no positives anywhere) into 0
        avg_factor_floor=1e-6,
        axis_name=axis_name)

    beta = boiw.beta
    loss_emb = beta * contrastive_loss(
        feat_flat, labels_flat, boiw.embedding, gfl.num_total_samples,
        weights=targets.label_weights.reshape(-1))
    loss_op = beta * ot_proxy_loss(
        feat_flat, labels_flat, proxies.astype(jnp.float32),
        boiw.proxies_prob, proxies_list)

    # dictionary update is on stop-gradient features (reference: no_grad)
    if axis_name is not None:
        # identical update on every replica: gather features across the mesh
        gathered_f = jax.lax.all_gather(
            jax.lax.stop_gradient(feat_flat), axis_name).reshape(-1, c)
        gathered_l = jax.lax.all_gather(
            labels_flat, axis_name).reshape(-1)
    else:
        gathered_f = jax.lax.stop_gradient(feat_flat)
        gathered_l = labels_flat
    new_boiw = update_dictionary(boiw, rng, gathered_f, gathered_l)

    total = gfl.total + loss_emb + loss_op
    return MPLossOut(total, gfl.loss_cls, gfl.loss_bbox, gfl.loss_dfl,
                     loss_emb, loss_op, new_boiw)
