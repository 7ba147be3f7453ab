"""Numeric parity of the MP-Det loss family vs the ACTUAL reference code.

``ref_mmdet.load_ref_mmdet`` imports the genuine reference modules
(``gfl_head.py``, ``mp_head.py``, ``atss_assigner.py``, ``gfocal_loss.py``,
``iou_loss.py`` — mmcv stubbed with plain-torch equivalents), so every
value compared here is computed by the reference's own torch code:

  - anchor grids       (mmdet AnchorGenerator octave_base_scale=8)
  - ATSS assignment    (atss_assigner.py:40-179, topk=9)
  - GFLHead.loss       (gfl_head.py:218-378: QFL/DFL/GIoU, per-image
                        pos clamp, clamp(min=1) weight normalizer)
  - MPHead.loss        (mp_head.py:307-478: proxy QFL + contrastive +
                        Sinkhorn OT, UNclamped weight normalizer)
  - gradients of all of the above
  - BoIW ring-buffer mechanics (mp_head.py:184-201)
  - a K-step LOCK-STEP MPHead SGD trajectory (the mp_sgd recipe with
    grad-clip 35) — closing VERDICT r04 missing #2/#3.

Property tests live in test_gfl_loss.py; THIS file is the
reference-computed-numbers instrument.
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from ref_mmdet import (GFL_STRIDES, load_ref_mmdet, make_gfl_head,
                       make_mp_head)  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/yolox-ufp/mmdet"),
    reason="reference snapshot not mounted")

NC = 10
C_IN = 64          # small towers keep the torch side fast
H = W = 64         # -> per-level anchor counts [64, 16, 4, 1, 1]
B = 2
PROXIES = (2, 3, 2, 5, 4, 8, 8, 4, 3, 3)
NUM_WORDS = 16


# ---------------------------------------------------------------------------
# shared fixtures
# ---------------------------------------------------------------------------

def _img_metas(n=B):
    return [dict(img_shape=(H, W, 3), pad_shape=(H, W, 3), scale_factor=1.0)
            for _ in range(n)]


def _gts(seed=0, counts=(4, 3)):
    """Per-image GT boxes sized to land positives on several levels."""
    rs = np.random.RandomState(seed)
    boxes, labels = [], []
    for n in counts:
        x1 = rs.uniform(0, 30, n)
        y1 = rs.uniform(0, 30, n)
        bw = rs.uniform(6, 30, n)
        bh = rs.uniform(6, 30, n)
        b = np.stack([x1, y1, np.minimum(x1 + bw, W - 1),
                      np.minimum(y1 + bh, H - 1)], -1).astype(np.float32)
        boxes.append(b)
        labels.append(rs.randint(0, NC, n).astype(np.int64))
    return boxes, labels


def _pad_gts(boxes, labels, max_gt=8):
    """torch per-image lists -> our fixed-shape padded batch arrays."""
    bsz = len(boxes)
    gb = np.zeros((bsz, max_gt, 4), np.float32)
    gl = np.zeros((bsz, max_gt), np.int32)
    gv = np.zeros((bsz, max_gt), bool)
    for i, (bx, lb) in enumerate(zip(boxes, labels)):
        n = len(bx)
        gb[i, :n] = bx
        gl[i, :n] = lb
        gv[i, :n] = True
    return gb, gl, gv


def _level_sizes():
    import math
    return [(math.ceil(H / s), math.ceil(W / s)) for s in GFL_STRIDES]


def _preds(seed=0, scale=1.0, shift=0.0, channels=NC):
    """Random per-level (cls, reg) prediction tensors, torch layout."""
    rs = np.random.RandomState(seed)
    cls_l, reg_l = [], []
    for (h, w) in _level_sizes():
        cls_l.append((rs.randn(B, channels, h, w) * scale + shift)
                     .astype(np.float32))
        reg_l.append((rs.randn(B, 4 * 17, h, w) * scale)
                     .astype(np.float32))
    return cls_l, reg_l


def _flatten_levels(levels):
    """list of (B, C, H, W) -> (B, A, C) in our level-concat anchor order."""
    flat = [np.transpose(t, (0, 2, 3, 1)).reshape(B, -1, t.shape[1])
            for t in levels]
    return np.concatenate(flat, axis=1)


def _our_anchor_geom():
    import jax.numpy as jnp

    from glsdet_tpu.ops.priors import grid_anchors
    anchors_np, counts = grid_anchors((H, W), GFL_STRIDES,
                                      octave_base_scale=8.0)
    anchors = jnp.asarray(anchors_np)
    centers = (anchors[:, :2] + anchors[:, 2:4]) / 2.0
    strides = jnp.concatenate([
        jnp.full((n,), s, jnp.float32)
        for n, s in zip(counts, GFL_STRIDES)])
    return anchors_np, counts, centers, strides


# ---------------------------------------------------------------------------
# 1. anchors
# ---------------------------------------------------------------------------

def test_anchor_grid_parity():
    ref = load_ref_mmdet()
    gen = ref.core.build_prior_generator(dict(
        type="AnchorGenerator", ratios=[1.0], octave_base_scale=8,
        scales_per_octave=1, strides=list(GFL_STRIDES)))
    ref_levels = gen.grid_priors(_level_sizes(), device="cpu")
    ref_anchors = torch.cat(ref_levels).numpy()
    ours, counts = _our_anchor_geom()[:2]
    assert [lvl.shape[0] for lvl in ref_levels] == list(counts)
    np.testing.assert_allclose(ours, ref_anchors, atol=1e-4)


# ---------------------------------------------------------------------------
# 2. ATSS assignment
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_atss_assignment_parity(seed):
    import jax.numpy as jnp

    from glsdet_tpu.assign.atss import atss_assign

    ref = load_ref_mmdet()
    anchors_np, counts, _, _ = _our_anchor_geom()
    boxes, labels = _gts(seed, counts=(5,))
    assigner = ref.atss.ATSSAssigner(topk=9)
    res = assigner.assign(torch.from_numpy(anchors_np), list(counts),
                          torch.from_numpy(boxes[0]), None,
                          torch.from_numpy(labels[0]))

    gb, gl, gv = _pad_gts(boxes[:1], labels[:1])
    ours = atss_assign(jnp.asarray(anchors_np), counts,
                       jnp.asarray(gb[0]), jnp.asarray(gl[0]),
                       jnp.asarray(gv[0]), NC, topk=9)

    ref_gt = res.gt_inds.numpy() - 1          # 1-based, 0 = bg -> -1 = bg
    ours_gt = np.asarray(ours.assigned_gt)
    np.testing.assert_array_equal(ours_gt, ref_gt)
    ref_labels = res.labels.numpy().copy()
    ref_labels[ref_labels < 0] = NC           # ref bg = -1; ours = NC
    np.testing.assert_array_equal(np.asarray(ours.labels), ref_labels)


# ---------------------------------------------------------------------------
# 3/4. GFL loss values + gradients
# ---------------------------------------------------------------------------

def _ref_gfl_losses(head, cls_l, reg_l, boxes, labels, grad=False):
    cls_t = [torch.tensor(t, requires_grad=grad) for t in cls_l]
    reg_t = [torch.tensor(t, requires_grad=grad) for t in reg_l]
    losses = head.loss(list(cls_t), list(reg_t),
                       [torch.from_numpy(b) for b in boxes],
                       [torch.from_numpy(l) for l in labels],
                       _img_metas(len(boxes)))
    sums = {k: sum(v) if isinstance(v, list) else v
            for k, v in losses.items()}
    if grad:
        total = sum(sums.values())
        total.backward()
        g_cls = _flatten_levels([t.grad.numpy() for t in cls_t])
        g_reg = _flatten_levels([t.grad.numpy() for t in reg_t])
        return ({k: float(v) for k, v in sums.items()}, g_cls, g_reg)
    return {k: float(v) for k, v in sums.items()}


def _our_gfl(cls_flat, reg_flat, gb, gl, gv, grad=False):
    import jax
    import jax.numpy as jnp

    from glsdet_tpu.train.gfl_loss import gfl_loss, gfl_targets

    anchors_np, counts, centers, strides = _our_anchor_geom()
    targets = gfl_targets(jnp.asarray(anchors_np), counts, jnp.asarray(gb),
                          jnp.asarray(gl), jnp.asarray(gv), NC)

    def run(cls_j, reg_j):
        out = gfl_loss(cls_j, reg_j, targets, centers, strides, NC)
        return out.total, out

    if not grad:
        _, out = run(jnp.asarray(cls_flat), jnp.asarray(reg_flat))
        return out
    (_, out), grads = jax.value_and_grad(run, argnums=(0, 1), has_aux=True)(
        jnp.asarray(cls_flat), jnp.asarray(reg_flat))
    return out, np.asarray(grads[0]), np.asarray(grads[1])


@pytest.mark.parametrize("seed,shift", [(0, 0.0), (1, 0.0), (2, -8.0)])
def test_gfl_loss_value_parity(seed, shift):
    """shift=-8 drives sigmoid scores ~0 so the weight sum < 1 and the
    reference's ``clamp_(min=1)`` (gfl_head.py:374) BINDS."""
    torch.manual_seed(0)
    head = make_gfl_head(NC, C_IN)
    boxes, labels = _gts(seed)
    cls_l, reg_l = _preds(seed, shift=shift)
    ref = _ref_gfl_losses(head, cls_l, reg_l, boxes, labels)

    gb, gl, gv = _pad_gts(boxes, labels)
    ours = _our_gfl(_flatten_levels(cls_l), _flatten_levels(reg_l),
                    gb, gl, gv)
    assert float(ours.loss_cls) == pytest.approx(ref["loss_cls"], rel=2e-5)
    assert float(ours.loss_bbox) == pytest.approx(ref["loss_bbox"], rel=2e-5)
    assert float(ours.loss_dfl) == pytest.approx(ref["loss_dfl"], rel=2e-5)


def test_gfl_loss_empty_image_normalizer_parity():
    """An image with ZERO GTs still contributes 1 to num_total_samples
    (anchor_head get_targets ``max(inds.numel(), 1)``)."""
    torch.manual_seed(0)
    head = make_gfl_head(NC, C_IN)
    boxes, labels = _gts(0, counts=(4,))
    boxes.append(np.zeros((0, 4), np.float32))
    labels.append(np.zeros((0,), np.int64))
    cls_l, reg_l = _preds(3)
    ref = _ref_gfl_losses(head, cls_l, reg_l, boxes, labels)

    gb, gl, gv = _pad_gts(boxes, labels)
    ours = _our_gfl(_flatten_levels(cls_l), _flatten_levels(reg_l),
                    gb, gl, gv)
    assert float(ours.loss_cls) == pytest.approx(ref["loss_cls"], rel=2e-5)
    assert float(ours.loss_bbox) == pytest.approx(ref["loss_bbox"], rel=2e-5)
    assert float(ours.loss_dfl) == pytest.approx(ref["loss_dfl"], rel=2e-5)


def test_gfl_gradient_parity():
    torch.manual_seed(0)
    head = make_gfl_head(NC, C_IN)
    boxes, labels = _gts(1)
    cls_l, reg_l = _preds(1)
    ref, g_cls_ref, g_reg_ref = _ref_gfl_losses(
        head, cls_l, reg_l, boxes, labels, grad=True)

    gb, gl, gv = _pad_gts(boxes, labels)
    ours, g_cls, g_reg = _our_gfl(
        _flatten_levels(cls_l), _flatten_levels(reg_l), gb, gl, gv,
        grad=True)
    tot = float(ours.loss_cls) + float(ours.loss_bbox) + float(ours.loss_dfl)
    assert tot == pytest.approx(sum(ref.values()), rel=2e-5)
    scale = np.abs(g_cls_ref).max()
    np.testing.assert_allclose(g_cls, g_cls_ref, atol=2e-5 * scale)
    scale_r = np.abs(g_reg_ref).max()
    np.testing.assert_allclose(g_reg, g_reg_ref, atol=2e-5 * scale_r)


# ---------------------------------------------------------------------------
# 5/6. MPHead loss values + gradients (proxy QFL + contrastive + OT)
# ---------------------------------------------------------------------------

C_FEAT = 64


def _mp_head(seed=0):
    torch.manual_seed(seed)
    head = make_mp_head(NC, C_FEAT, num_words=NUM_WORDS, beta=1.0,
                        proxies_list=PROXIES, feat_channels=C_FEAT)
    return head


def _boiw_from_head(head):
    import jax.numpy as jnp

    from glsdet_tpu.train.boiw import BoIWState
    return BoIWState(
        embedding=jnp.asarray(head._embedding.numpy().copy()),
        ptr=jnp.asarray(
            head._pos_embedding_ptr.numpy().copy().astype(np.int32)),
        proxies_prob=jnp.asarray(head._proxies_prob.numpy().copy()),
        beta=jnp.asarray(float(head.beta), jnp.float32),
    )


def _ref_mp_losses(head, feat_l, reg_l, boxes, labels, grad=False):
    random.seed(0)  # _update_dictionary's random.sample (post-loss)
    feat_t = [torch.tensor(t, requires_grad=grad) for t in feat_l]
    reg_t = [torch.tensor(t, requires_grad=grad) for t in reg_l]
    if grad and head.proxies.grad is not None:
        head.proxies.grad = None
    losses = head.loss(list(feat_t), list(reg_t),
                       [torch.from_numpy(b) for b in boxes],
                       [torch.from_numpy(l) for l in labels],
                       _img_metas(len(boxes)))
    sums = {k: sum(v) if isinstance(v, list) else v
            for k, v in losses.items()}
    if grad:
        total = sum(sums.values())
        total.backward()
        return ({k: float(v) for k, v in sums.items()},
                _flatten_levels([t.grad.numpy() for t in feat_t]),
                _flatten_levels([t.grad.numpy() for t in reg_t]),
                head.proxies.grad.numpy().copy())
    return {k: float(v) for k, v in sums.items()}


def _our_mp(head, feat_flat, reg_flat, gb, gl, gv, grad=False):
    import jax
    import jax.numpy as jnp

    from glsdet_tpu.models.mp_head import proxy_class_matrix
    from glsdet_tpu.train.gfl_loss import gfl_targets
    from glsdet_tpu.train.mp_loss import mp_loss

    anchors_np, counts, centers, strides = _our_anchor_geom()
    targets = gfl_targets(jnp.asarray(anchors_np), counts, jnp.asarray(gb),
                          jnp.asarray(gl), jnp.asarray(gv), NC)
    membership = jnp.asarray(proxy_class_matrix(PROXIES))
    boiw = _boiw_from_head(head)
    proxies = jnp.asarray(head.proxies.detach().numpy().copy())
    rng = jax.random.PRNGKey(0)

    def run(feat_j, reg_j, prox_j):
        out = mp_loss(feat_j, reg_j, prox_j, membership, boiw, rng,
                      targets, centers, strides, NC, PROXIES)
        return out.total, out

    args = (jnp.asarray(feat_flat), jnp.asarray(reg_flat), proxies)
    if not grad:
        return run(*args)[1]
    (_, out), grads = jax.value_and_grad(
        run, argnums=(0, 1, 2), has_aux=True)(*args)
    return out, tuple(np.asarray(g) for g in grads)


@pytest.mark.parametrize("seed", [0, 1])
def test_mp_loss_value_parity(seed):
    head = _mp_head(seed)
    boxes, labels = _gts(seed, counts=(6, 5))
    feat_l, reg_l = _preds(seed + 10, channels=C_FEAT)
    ours = _our_mp(head, _flatten_levels(feat_l), _flatten_levels(reg_l),
                   *_pad_gts(boxes, labels))
    ref = _ref_mp_losses(head, feat_l, reg_l, boxes, labels)
    assert float(ours.loss_cls) == pytest.approx(ref["loss_cls"], rel=2e-5)
    assert float(ours.loss_bbox) == pytest.approx(ref["loss_bbox"], rel=2e-5)
    assert float(ours.loss_dfl) == pytest.approx(ref["loss_dfl"], rel=2e-5)
    assert float(ours.loss_emb) == pytest.approx(ref["loss_emb"], rel=2e-5)
    assert float(ours.loss_op) == pytest.approx(ref["loss_op"], rel=1e-4,
                                                abs=1e-7)


def test_mp_gradient_parity():
    head = _mp_head(0)
    boxes, labels = _gts(2, counts=(6, 5))
    feat_l, reg_l = _preds(12, channels=C_FEAT)
    ours, (g_feat, g_reg, g_prox) = _our_mp(
        head, _flatten_levels(feat_l), _flatten_levels(reg_l),
        *_pad_gts(boxes, labels), grad=True)
    ref, g_feat_ref, g_reg_ref, g_prox_ref = _ref_mp_losses(
        head, feat_l, reg_l, boxes, labels, grad=True)

    tot = sum(float(getattr(ours, k)) for k in
              ("loss_cls", "loss_bbox", "loss_dfl", "loss_emb", "loss_op"))
    assert tot == pytest.approx(sum(ref.values()), rel=3e-5)
    for name, a, b in (("cls_feat", g_feat, g_feat_ref),
                       ("bbox_pred", g_reg, g_reg_ref),
                       ("proxies", g_prox, g_prox_ref)):
        scale = np.abs(b).max()
        np.testing.assert_allclose(
            a, b, atol=5e-5 * scale,
            err_msg=f"{name} gradient mismatch (ref-grad scale {scale:.3e})")


# ---------------------------------------------------------------------------
# 7. BoIW ring-buffer mechanics (mp_head.py:184-201)
# ---------------------------------------------------------------------------

def test_boiw_update_parity():
    """With <= max_step positives per class the reference writes ALL of a
    class's features (random.sample only permutes); content-as-a-set and
    pointer advance must match ours exactly, including ring wraparound."""
    import jax
    import jax.numpy as jnp

    from glsdet_tpu.train.boiw import BoIWState, update_dictionary

    head = _mp_head(3)
    rs = np.random.RandomState(0)
    n = 40
    feats = rs.randn(n, C_FEAT).astype(np.float32)
    lbls = rs.randint(0, NC + 1, n).astype(np.int64)
    # force a wrap: class 0's pointer starts near the end of the ring
    head._pos_embedding_ptr[0] = NUM_WORDS - 2

    random.seed(1)
    head._update_dictionary(torch.from_numpy(feats),
                            torch.from_numpy(lbls), 10)

    state = BoIWState(
        embedding=jnp.zeros((NC + 1, NUM_WORDS, C_FEAT)),
        ptr=jnp.asarray(
            np.concatenate([[NUM_WORDS - 2], np.zeros(NC)]).astype(np.int32)),
        proxies_prob=jnp.asarray(head._proxies_prob.numpy()),
        beta=jnp.ones(()))
    new = update_dictionary(state, jax.random.PRNGKey(0),
                            jnp.asarray(feats), jnp.asarray(lbls))

    ref_emb = head._embedding.numpy()
    our_emb = np.asarray(new.embedding)
    np.testing.assert_array_equal(np.asarray(new.ptr),
                                  head._pos_embedding_ptr.numpy())
    for cls in range(NC + 1):
        cnt = int((lbls == cls).sum())
        assert cnt <= 10, "fixture must keep classes under max_step"
        want = feats[lbls == cls]
        start = NUM_WORDS - 2 if cls == 0 else 0
        slots = [(start + i) % NUM_WORDS for i in range(cnt)]
        got_ref = ref_emb[cls, slots]
        got_ours = our_emb[cls, slots]
        # both write the same SET of rows (selection order is RNG-local)
        for got in (got_ref, got_ours):
            d = np.linalg.norm(got[:, None, :] - want[None, :, :], axis=-1)
            assert (d.min(axis=1) < 1e-6).all(), f"class {cls}"
            assert (d.min(axis=0) < 1e-6).all(), f"class {cls}"


# ---------------------------------------------------------------------------
# 8. K-step LOCK-STEP MPHead trajectory (reference torch SGD vs ours)
# ---------------------------------------------------------------------------

def _find_trace(opt_state):
    """Locate the optax TraceState inside a chain state (path, state)."""
    for i, s in enumerate(opt_state):
        if hasattr(s, "trace"):
            return (i,), s
        if isinstance(s, tuple):
            for j, ss in enumerate(s):
                if hasattr(ss, "trace"):
                    return (i, j), ss
    raise AssertionError("no TraceState in optimizer state")


def _replace_trace(opt_state, new_trace):
    path, ts = _find_trace(opt_state)
    new_ts = ts._replace(trace=new_trace)
    opt_state = list(opt_state)
    if len(path) == 1:
        opt_state[path[0]] = new_ts
    else:
        inner = list(opt_state[path[0]])
        inner[path[1]] = new_ts
        opt_state[path[0]] = tuple(inner)
    return tuple(opt_state)


def test_mphead_lockstep_trajectory_parity():
    """K SGD steps on the ACTUAL reference MPHead (towers + proxy head +
    contrastive/OT losses) with the mmdet schedule_1x recipe (momentum
    0.9, wd 1e-4 all params, clip-35 OptimizerHook), each step lock-step
    from the transplanted torch state — VERDICT r04 missing #3."""
    import jax
    import jax.numpy as jnp
    import optax

    from glsdet_tpu.models.mp_head import MPHead, proxy_class_matrix
    from glsdet_tpu.train.gfl_loss import gfl_targets
    from glsdet_tpu.train.mp_loss import mp_loss
    from glsdet_tpu.train.schedules import mp_det_sgd
    from glsdet_tpu.utils.torch_import import convert_mpdet

    K, LR = 4, 0.01
    head = _mp_head(7)
    head.init_weights()
    opt = torch.optim.SGD(head.parameters(), lr=LR, momentum=0.9,
                          weight_decay=1e-4)

    model = MPHead(num_classes=NC, feat_channels=C_FEAT,
                   proxies_list=PROXIES)
    sizes = _level_sizes()
    template = model.init(
        jax.random.PRNGKey(0),
        [jnp.zeros((1, h, w, C_FEAT)) for h, w in sizes], train=True)
    template = {"params": {"head": template["params"]}}

    anchors_np, counts, centers, strides = _our_anchor_geom()
    anchors_j = jnp.asarray(anchors_np)
    membership = jnp.asarray(proxy_class_matrix(PROXIES))
    tx = mp_det_sgd(lambda s: LR)

    def from_torch():
        sd = {"bbox_head." + k: v.detach().numpy().copy()
              for k, v in head.state_dict().items()}
        conv, rep = convert_mpdet(sd, template)
        assert not rep.missing and not rep.unmatched, rep.summary()
        return conv["params"]["head"]

    def momentum_pytree():
        sd = {}
        for n, p in head.named_parameters():
            buf = opt.state.get(p, {}).get("momentum_buffer")
            sd["bbox_head." + n] = (
                buf.detach().numpy().copy() if buf is not None
                else np.zeros(tuple(p.shape), np.float32))
        conv, rep = convert_mpdet(sd, template)
        assert not rep.missing, rep.summary()
        return conv["params"]["head"]

    @jax.jit
    def jax_step(params, boiw, opt_state, feat_in, reg_targets_args):
        gb, gl, gv = reg_targets_args
        targets = gfl_targets(anchors_j, counts, gb, gl, gv, NC)

        def loss_fn(p):
            cls_l, reg_l = model.apply({"params": p}, feat_in, train=True)
            bsz = feat_in[0].shape[0]
            cls_flat = jnp.concatenate(
                [f.reshape(bsz, -1, f.shape[-1]) for f in cls_l], 1)
            reg_flat = jnp.concatenate(
                [r.reshape(bsz, -1, r.shape[-1]) for r in reg_l], 1)
            out = mp_loss(cls_flat, reg_flat.astype(jnp.float32),
                          p["proxies"], membership, boiw,
                          jax.random.PRNGKey(0), targets, centers,
                          strides, NC, PROXIES)
            return out.total, out

        (total, out), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        gnorm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, total, gnorm

    rs = np.random.RandomState(99)
    clip_bound = False
    for k in range(K):
        feat_l = [(rs.randn(B, C_FEAT, h, w) * 2.0).astype(np.float32)
                  for h, w in sizes]
        boxes, labels = _gts(50 + k, counts=(6, 5))

        # ours FROM the current torch state (params + momentum + BoIW)
        params = jax.tree.map(jnp.asarray, from_torch())
        opt_state = _replace_trace(tx.init(params),
                                   jax.tree.map(jnp.asarray,
                                                momentum_pytree()))
        boiw = _boiw_from_head(head)
        feat_in = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feat_l]
        gb, gl, gv = _pad_gts(boxes, labels)
        params, opt_state, total, gnorm = jax_step(
            params, boiw, opt_state,
            feat_in, (jnp.asarray(gb), jnp.asarray(gl), jnp.asarray(gv)))

        # one torch step from the same state
        random.seed(k)
        head.zero_grad()
        feats_t = [torch.tensor(f) for f in feat_l]
        outs = head.forward(feats_t)
        losses = head.loss(list(outs[0]), list(outs[1]),
                           [torch.from_numpy(b) for b in boxes],
                           [torch.from_numpy(l) for l in labels],
                           _img_metas())
        ref_total = sum(sum(v) if isinstance(v, list) else v
                        for v in losses.values())
        ref_total.backward()
        tnorm = torch.nn.utils.clip_grad_norm_(head.parameters(), 35.0)
        opt.step()
        clip_bound |= float(tnorm) > 35.0

        np.testing.assert_allclose(float(total), float(ref_total.detach()),
                                   rtol=1e-4, err_msg=f"step {k} loss")
        np.testing.assert_allclose(float(gnorm), float(tnorm), rtol=1e-4,
                                   err_msg=f"step {k} grad norm")
        want = from_torch()
        diffs = jax.tree.map(
            lambda a, b: np.max(np.abs(np.asarray(a) - b)), params, want)
        worst = max(jax.tree.leaves(diffs))
        assert float(worst) < 3e-4, (
            f"step {k}: max post-step param diff {float(worst):.2e}")
