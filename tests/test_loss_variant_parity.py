"""Full-loss parity vs the ACTUAL reference yolox-drone loss modules.

Runs the reference ``YOLOLoss.forward`` (torch, per-image dynamic-shape
SimOTA) and this repo's fixed-shape batched XLA loss on IDENTICAL random
head outputs + labels, and requires the scalar losses to agree:

- baseline (models/base/yolox_losses.py)      == yolox_loss(variant='mmdet')
- cls-sigmoid (losses/yolox_losses_cls_sigmoid.py)
                                              == yolox_loss(variant='cls_sigmoid')
- no-sigmoid (losses/yolox_losses_no_sigmoid.py)
                                              == yolox_loss(variant='no_sigmoid')
- decoupled (losses/yolox_losses_decoupled.py)== yolox_loss_decoupled

This pins, in one shot: the decode math, SimOTA candidate geometry and
cost (incl. the per-variant sigmoid placement and the decoupled swapped
cost weights), dynamic-k selection, conflict resolution, per-level
weight generation, and every loss term + normalizer.

The raw obj/cls channels are drawn from (0.05, 0.95): the no-sigmoid
ablations feed raw head outputs to ``sqrt``/``nn.BCELoss`` whose domain
is (0, 1) — outside it the reference produces NaN (a reference bug we
paper over with a clip, see train/yolox_loss.py:_bce_probs), so parity
is only defined on the valid domain.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/yolox-drone"
torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not present")

IMG = 64
STRIDES = (8, 16, 32)
SIZES = tuple(IMG // s for s in STRIDES)  # (8, 4, 2)
NUM_CLASSES = 7
B, G = 2, 3


@pytest.fixture(scope="module")
def ref_losses():
    sys.path.insert(0, REF)
    try:
        import importlib

        mods = {
            "mmdet": importlib.import_module("models.base.yolox_losses"),
            "cls_sigmoid": importlib.import_module(
                "models.losses.yolox_losses_cls_sigmoid"),
            "no_sigmoid": importlib.import_module(
                "models.losses.yolox_losses_no_sigmoid"),
            "decoupled": importlib.import_module(
                "models.losses.yolox_losses_decoupled"),
            "fpn_weight": importlib.import_module(
                "models.losses.yolox_losses_fpn_weight"),
            "fpn_weight_sigmoid": importlib.import_module(
                "models.losses.yolox_losses_fpn_weight_sigmoid"),
            "fpn_weight_softmax": importlib.import_module(
                "models.losses.yolox_losses_fpn_weight_sigmoid640v2"),
            "dw": importlib.import_module(
                "models.losses.yolox_losses_dw_sigmoid640"),
        }
        yield mods
    finally:
        sys.path.remove(REF)
        for name in [n for n in sys.modules if n == "models"
                     or n.startswith("models.")]:
            del sys.modules[name]


def _fixture(seed: int):
    """Random per-level raw head outputs + labels in both contracts."""
    rs = np.random.RandomState(seed)
    inputs = []           # torch: (B, 5+C, H, W), channels [reg4, obj, cls]
    for sz in SIZES:
        reg = rs.randn(B, 4, sz, sz).astype(np.float32) * 0.5
        objcls = rs.uniform(
            0.05, 0.95, (B, 1 + NUM_CLASSES, sz, sz)).astype(np.float32)
        inputs.append(np.concatenate([reg, objcls], axis=1))

    # labels: cxcywh + class, inside the image with room for the box
    gts = []
    for _ in range(B):
        cx = rs.uniform(12, IMG - 12, G)
        cy = rs.uniform(12, IMG - 12, G)
        w = rs.uniform(6, 20, G)
        h = rs.uniform(6, 20, G)
        cls = rs.randint(0, NUM_CLASSES, G).astype(np.float32)
        gts.append(np.stack([cx, cy, w, h, cls], axis=1).astype(np.float32))
    return inputs, gts


def _jax_args(inputs, gts):
    import jax.numpy as jnp

    from glsdet_tpu.ops.priors import grid_points

    cls_f, reg_f, obj_f = [], [], []
    for lvl in inputs:
        flat = lvl.reshape(B, lvl.shape[1], -1).transpose(0, 2, 1)
        reg_f.append(flat[..., :4])
        obj_f.append(flat[..., 4])
        cls_f.append(flat[..., 5:])
    cls_f = jnp.asarray(np.concatenate(cls_f, axis=1))
    reg_f = jnp.asarray(np.concatenate(reg_f, axis=1))
    obj_f = jnp.asarray(np.concatenate(obj_f, axis=1))

    centers_np, strides_np, counts = grid_points(
        (IMG, IMG), STRIDES, offset=0.5)
    gt_boxes = np.zeros((B, G, 4), np.float32)
    gt_labels = np.zeros((B, G), np.int32)
    for i, g in enumerate(gts):
        cxy, wh = g[:, :2], g[:, 2:4]
        gt_boxes[i, :, :2] = cxy - wh / 2
        gt_boxes[i, :, 2:] = cxy + wh / 2
        gt_labels[i] = g[:, 4].astype(np.int32)
    return (cls_f, reg_f, obj_f, jnp.asarray(centers_np),
            jnp.asarray(strides_np), counts,
            jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.ones((B, G), bool))


@pytest.mark.parametrize("variant", ["mmdet", "cls_sigmoid", "no_sigmoid"])
def test_variant_full_loss_parity(ref_losses, variant):
    from glsdet_tpu.train.yolox_loss import yolox_loss

    inputs, gts = _fixture(seed=17)
    mod = ref_losses[variant]
    ref_loss = mod.YOLOLoss(NUM_CLASSES, strides=list(STRIDES))
    with torch.no_grad():
        # .copy(): torch.from_numpy shares memory and the reference
        # DECODES IN PLACE through flatten/permute views
        # (get_output_and_grid, yolox_losses.py:93-105), which would
        # corrupt the fixtures the jax side reads below
        want = float(ref_loss(
            [torch.from_numpy(x.copy()) for x in inputs],
            [torch.from_numpy(g) for g in gts]))

    (cls_f, reg_f, obj_f, centers, strides, _counts,
     gt_boxes, gt_labels, gt_valid) = _jax_args(inputs, gts)
    out = yolox_loss(cls_f, reg_f, obj_f, centers, strides,
                     gt_boxes, gt_labels, gt_valid, variant=variant)
    np.testing.assert_allclose(float(out.total), want, rtol=2e-4,
                               err_msg=f"variant={variant}")
    assert float(out.num_fg) >= 1


def test_decoupled_full_loss_parity(ref_losses):
    from glsdet_tpu.train.yolox_loss import yolox_loss_decoupled

    inputs, gts = _fixture(seed=23)
    mod = ref_losses["decoupled"]
    ref_loss = mod.YOLOLoss(NUM_CLASSES, strides=list(STRIDES),
                            fpn_size=list(SIZES))
    labels = [torch.from_numpy(g) for g in gts]
    with torch.no_grad():
        # DOCUMENTED DIVERGENCE: the reference wrapper
        # ``YOLOLoss.forward = cls_loss(inputs) + reg_loss(inputs)``
        # (yolox_losses_decoupled.py:66-68) decodes ``inputs`` IN PLACE
        # through flatten/permute views inside ClsLoss, so RegLoss then
        # runs on doubly-decoded boxes (exp of already-scaled wh) — a
        # composition bug.  The intended semantics (each half on raw
        # head outputs, as when the halves were ablated standalone) is
        # what we implement, so parity is pinned per half on fresh
        # tensors.
        want_cls = float(ref_loss.cls_loss(
            [torch.from_numpy(x.copy()) for x in inputs], labels))
        want_reg = float(ref_loss.reg_loss(
            [torch.from_numpy(x.copy()) for x in inputs], labels))

    (cls_f, reg_f, obj_f, centers, strides, counts,
     gt_boxes, gt_labels, gt_valid) = _jax_args(inputs, gts)
    out = yolox_loss_decoupled(cls_f, reg_f, obj_f, centers, strides,
                               counts, gt_boxes, gt_labels, gt_valid)
    np.testing.assert_allclose(float(out.loss_cls), want_cls, rtol=2e-4,
                               err_msg="cls half")
    np.testing.assert_allclose(
        float(out.loss_bbox) + float(out.loss_obj), want_reg, rtol=2e-4,
        err_msg="reg half")
    np.testing.assert_allclose(float(out.total), want_cls + want_reg,
                               rtol=2e-4)
    assert float(out.num_fg) >= 1


@pytest.mark.parametrize("key,kwargs", [
    ("fpn_weight", dict(sigmoid=False)),
    ("fpn_weight_sigmoid", dict(sigmoid=True)),
    ("fpn_weight_softmax", dict(sigmoid=True, weight_mode="softmax")),
    ("dw", dict(sigmoid=True, neg_cls_terms=True)),
])
def test_fpn_weight_family_parity(ref_losses, key, kwargs):
    """The FPN-level-reweighting family (incl. the softmax-weight v2 and
    the dw negative-cls-terms variant) == yolox_loss_fpn_weight.  The
    640/960 files differ from these only in their hardcoded fpn_size
    preset, which is pure config in the fixed-shape design (level
    counts derive from img_hw)."""
    from glsdet_tpu.train.yolox_loss import yolox_loss_fpn_weight

    inputs, gts = _fixture(seed=29)
    mod = ref_losses[key]
    ref_loss = mod.YOLOLoss(NUM_CLASSES, strides=list(STRIDES),
                            fpn_size=list(SIZES))
    with torch.no_grad():
        want = float(ref_loss(
            [torch.from_numpy(x.copy()) for x in inputs],
            [torch.from_numpy(g) for g in gts]))

    (cls_f, reg_f, obj_f, centers, strides, counts,
     gt_boxes, gt_labels, gt_valid) = _jax_args(inputs, gts)
    out = yolox_loss_fpn_weight(cls_f, reg_f, obj_f, centers, strides,
                                counts, gt_boxes, gt_labels, gt_valid,
                                **kwargs)
    np.testing.assert_allclose(float(out.total), want, rtol=2e-4,
                               err_msg=key)
    assert float(out.num_fg) >= 1


def test_variant_gradients_finite():
    """The clip guards keep grads finite even at raw values outside the
    reference's valid (0,1) BCE domain (where torch NaNs)."""
    import jax
    import jax.numpy as jnp

    from glsdet_tpu.train.yolox_loss import (yolox_loss,
                                             yolox_loss_decoupled)

    inputs, gts = _fixture(seed=5)
    (cls_f, reg_f, obj_f, centers, strides, counts,
     gt_boxes, gt_labels, gt_valid) = _jax_args(inputs, gts)
    # push some raw values out of (0, 1)
    cls_f = cls_f.at[:, ::3].add(2.0)
    obj_f = obj_f.at[:, ::2].add(-1.5)

    for name, fn in [
        ("no_sigmoid", lambda c, r, o: yolox_loss(
            c, r, o, centers, strides, gt_boxes, gt_labels, gt_valid,
            variant="no_sigmoid").total),
        ("decoupled", lambda c, r, o: yolox_loss_decoupled(
            c, r, o, centers, strides, counts, gt_boxes, gt_labels,
            gt_valid).total),
    ]:
        grads = jax.grad(fn, argnums=(0, 1, 2))(cls_f, reg_f, obj_f)
        for g in grads:
            assert bool(jnp.all(jnp.isfinite(g))), name


def test_bbox_loss_mode_giou_escapes_disjoint_plateau():
    """bbox_loss_mode='giou' (rebuild extra): gradients w.r.t. the raw
    regression outputs are NONZERO for matched-but-disjoint boxes,
    where the reference 'square' mode's vanish (the from-scratch
    plateau documented in yolox_loss)."""
    import jax
    import jax.numpy as jnp

    inputs, gts = _fixture(seed=31)
    (cls_f, reg_f, obj_f, centers, strides, _counts,
     gt_boxes, gt_labels, gt_valid) = _jax_args(inputs, gts)
    from glsdet_tpu.train.yolox_loss import yolox_loss

    # shrink every predicted box to ~0.1px so every matched pair is
    # disjoint: wh = exp(raw)*stride, raw=-6 -> 0.02*stride
    reg_small = reg_f.at[..., 2:].set(-6.0)

    def bbox_term(mode):
        def f(r):
            return yolox_loss(cls_f, r, obj_f, centers, strides,
                              gt_boxes, gt_labels, gt_valid,
                              bbox_loss_mode=mode).loss_bbox
        val = f(reg_small)
        g = jax.grad(f)(reg_small)
        return float(val), float(jnp.max(jnp.abs(g)))

    v_sq, g_sq = bbox_term("square")
    v_gi, g_gi = bbox_term("giou")
    assert v_sq > 4.99           # fully saturated: no overlap anywhere
    assert g_sq < 1e-5           # ...and NO gradient to escape with
    assert g_gi > 1e-3           # giou pulls disjoint boxes together
