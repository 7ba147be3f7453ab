"""Detection-set parity of the FULL decode+NMS chain vs the reference
YOLOX predictor (yolox-drone/models/core/utils_bbox.py:254 decode_outputs,
:375 non_max_suppression).

Both sides consume IDENTICAL per-level head maps and must produce the
same final detection sets — boxes, scores, labels, count, ranking.
This pins in one shot: grid/stride decode conventions, sigmoid
placement, the single-max-class scoring, the conf-threshold boundary,
class-wise NMS suppression semantics, and the y1x1y2x2 -> pixel
unmapping.  Composed with tests/test_torch_parity.py (YoloBody ==
YOLOXDetector forward on transplanted weights), this is end-to-end
predictor parity; the split exists because a random-INIT YoloBody
collapses spatial information (constant scores = massive NMS ties),
while shared random head maps give a well-separated, tie-free score
distribution that actually exercises the ranking.

torchvision is absent from the image; the reference imports only
``torchvision.ops.boxes.batched_nms``, stubbed here with a pure-torch
greedy NMS implementing torchvision's documented contract
(descending-score walk, suppress same-class IoU > threshold).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/yolox-drone"
torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not present")


def _stub_torchvision():
    """Minimal pure-torch torchvision.ops.boxes for utils_bbox.py:3."""
    if "torchvision" in sys.modules:
        return

    def nms(boxes, scores, iou_threshold):
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(int(i))
            if order.numel() == 1:
                break
            rest = order[1:]
            x1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
            y1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
            x2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
            y2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            area_i = ((boxes[i, 2] - boxes[i, 0])
                      * (boxes[i, 3] - boxes[i, 1]))
            area_r = ((boxes[rest, 2] - boxes[rest, 0])
                      * (boxes[rest, 3] - boxes[rest, 1]))
            iou = inter / (area_i + area_r - inter)
            order = rest[iou <= iou_threshold]
        return torch.as_tensor(keep, dtype=torch.long)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.long)
        offs = idxs.to(boxes) * (boxes.max() + torch.tensor(1.0))
        return nms(boxes + offs[:, None], scores, iou_threshold)

    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    boxes_mod.nms = nms
    boxes_mod.batched_nms = batched_nms
    ops_mod = types.ModuleType("torchvision.ops")
    ops_mod.boxes = boxes_mod
    ops_mod.nms = nms
    ops_mod.batched_nms = batched_nms
    tv_mod = types.ModuleType("torchvision")
    tv_mod.ops = ops_mod
    sys.modules["torchvision"] = tv_mod
    sys.modules["torchvision.ops"] = ops_mod
    sys.modules["torchvision.ops.boxes"] = boxes_mod


@pytest.fixture(scope="module")
def ref_bbox():
    _stub_torchvision()
    sys.path.insert(0, REF)
    try:
        import importlib

        yield importlib.import_module("models.core.utils_bbox")
    finally:
        sys.path.remove(REF)
        for name in [n for n in sys.modules if n == "models"
                     or n.startswith("models.")]:
            del sys.modules[name]


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _head_maps(rs, b, hw, num_classes, strides=(8, 16, 32)):
    """Per-level (cls, reg, obj) NHWC maps with realistic spreads:
    logits ~ N(0, 2) so sigmoid covers (0.02, 0.98) with negligible
    tie probability; wh logits small so exp decode stays bounded."""
    cls_l, reg_l, obj_l = [], [], []
    for s in strides:
        h = w = hw // s
        reg = np.concatenate([
            rs.randn(b, h, w, 2).astype(np.float32),          # xy offset
            (rs.randn(b, h, w, 2) * 0.6).astype(np.float32),  # log wh
        ], axis=-1)
        cls_l.append((rs.randn(b, h, w, num_classes) * 2).astype(np.float32))
        obj_l.append((rs.randn(b, h, w, 1) * 2).astype(np.float32))
        reg_l.append(reg)
    return cls_l, reg_l, obj_l


def _to_ref_levels(cls_l, reg_l, obj_l):
    """NHWC triplets -> the reference head layout: per-level NCHW
    (4 reg, 1 obj, C cls) — yolox-drone/models/base/yolox.py head cat."""
    outs = []
    for c, r, o in zip(cls_l, reg_l, obj_l):
        m = np.concatenate([r, o, c], axis=-1).transpose(0, 3, 1, 2)
        outs.append(torch.from_numpy(np.ascontiguousarray(m)))
    return outs


@pytest.mark.parametrize("seed,conf", [(0, 0.5), (1, 0.3), (2, 0.7)])
def test_decode_nms_chain_parity(ref_bbox, seed, conf):
    from glsdet_tpu.eval.postprocess import yolox_postprocess

    num_classes, hw, nms_thr = 6, 128, 0.65
    rs = np.random.RandomState(seed)
    cls_l, reg_l, obj_l = _head_maps(rs, 2, hw, num_classes)

    # ---- reference path
    with torch.no_grad():
        decoded = ref_bbox.decode_outputs(
            _to_ref_levels(cls_l, reg_l, obj_l), (hw, hw))
        ref_dets = ref_bbox.non_max_suppression(
            decoded, num_classes, (hw, hw), (hw, hw),
            letterbox_image=False, conf_thres=conf, nms_thres=nms_thr)

    # ---- this repo's jitted path
    got = jax.jit(lambda c, r, o: yolox_postprocess(
        c, r, o, (hw, hw), score_thr=conf, iou_thr=nms_thr,
        max_dets=200))(
            [jnp.asarray(a) for a in cls_l],
            [jnp.asarray(a) for a in reg_l],
            [jnp.asarray(a) for a in obj_l])

    total = 0
    for i in range(2):
        k = int(got["valid"][i].sum())
        ref = ref_dets[i]
        n_ref = 0 if ref is None else len(ref)
        assert k == n_ref, f"img {i}: {k} dets vs reference {n_ref}"
        total += k
        if k == 0:
            continue
        # reference rows: (y1, x1, y2, x2, obj, cls_conf, label) in
        # pixels (yolo_correct_boxes, letterbox off)
        ref_scores = ref[:, 4] * ref[:, 5]
        order = np.argsort(-ref_scores, kind="stable")
        ref_boxes = ref[order][:, [1, 0, 3, 2]]  # -> x1 y1 x2 y2
        np.testing.assert_allclose(
            np.asarray(got["scores"][i][:k]), ref_scores[order],
            atol=1e-5, rtol=1e-4, err_msg=f"img {i} scores")
        np.testing.assert_array_equal(
            np.asarray(got["labels"][i][:k]),
            ref[order][:, 6].astype(np.int64), err_msg=f"img {i} labels")
        np.testing.assert_allclose(
            np.asarray(got["boxes"][i][:k]), ref_boxes,
            atol=5e-3, rtol=1e-4, err_msg=f"img {i} boxes")
    assert total >= 10, f"degenerate fixture: only {total} detections"


@pytest.mark.parametrize("variant,ref_fn", [
    ("cls", "decode_outputs_cls_sigmoid"),    # utils_bbox.py:92
    ("obj", "decode_outputs_no_sigmoid"),     # utils_bbox.py:146
    ("none", "decode_outputs_no_sigmoid_all"),  # utils_bbox.py:200
])
def test_ablation_decode_parity(ref_bbox, variant, ref_fn):
    """The loss-ablation decode variants differ only in sigmoid
    placement; pin each against yolox_postprocess(apply_sigmoid=...)
    through the full chain."""
    from glsdet_tpu.eval.postprocess import yolox_postprocess

    num_classes, hw, conf = 4, 64, 0.4
    rs = np.random.RandomState(7)
    cls_l, reg_l, obj_l = _head_maps(rs, 1, hw, num_classes)
    # keep raw (non-sigmoid) scores positive so conf filtering works in
    # the no-sigmoid variants too
    cls_l = [np.abs(a) for a in cls_l]
    obj_l = [np.abs(a) for a in obj_l]
    with torch.no_grad():
        decoded = getattr(ref_bbox, ref_fn)(
            _to_ref_levels(cls_l, reg_l, obj_l), (hw, hw))
        ref_dets = ref_bbox.non_max_suppression(
            decoded, num_classes, (hw, hw), (hw, hw),
            letterbox_image=False, conf_thres=conf, nms_thres=0.65)
    got = yolox_postprocess(
        [jnp.asarray(a) for a in cls_l], [jnp.asarray(a) for a in reg_l],
        [jnp.asarray(a) for a in obj_l], (hw, hw), score_thr=conf,
        iou_thr=0.65, max_dets=200, apply_sigmoid=variant)
    k = int(got["valid"][0].sum())
    ref = ref_dets[0]
    n_ref = 0 if ref is None else len(ref)
    assert k == n_ref and k > 0, (k, n_ref)
    ref_scores = ref[:, 4] * ref[:, 5]
    order = np.argsort(-ref_scores, kind="stable")
    np.testing.assert_allclose(np.asarray(got["scores"][0][:k]),
                               ref_scores[order], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["boxes"][0][:k]),
                               ref[order][:, [1, 0, 3, 2]],
                               atol=5e-3, rtol=1e-4)


def test_decode_values_match_reference(ref_bbox):
    """Raw decode parity at every anchor (pre-NMS): (pred_xy + grid) *
    stride and exp(wh) * stride, row-major level concat order."""
    from glsdet_tpu.models.yolox_head import (decode_boxes,
                                              flatten_head_outputs)
    from glsdet_tpu.ops.priors import grid_points

    num_classes, hw = 3, 64
    rs = np.random.RandomState(5)
    cls_l, reg_l, obj_l = _head_maps(rs, 1, hw, num_classes)
    with torch.no_grad():
        decoded = ref_bbox.decode_outputs(
            _to_ref_levels(cls_l, reg_l, obj_l), (hw, hw)).numpy()[0]
    ref_cxcywh = decoded[:, :4] * hw  # reference normalizes by input

    cls_f, reg_f, obj_f = flatten_head_outputs(
        [jnp.asarray(a) for a in cls_l], [jnp.asarray(a) for a in reg_l],
        [jnp.asarray(a) for a in obj_l])
    centers, strides_np, _ = grid_points((hw, hw), (8, 16, 32), offset=0.5)
    grids = jnp.asarray(centers / strides_np[:, None] - 0.5)
    boxes = np.asarray(decode_boxes(reg_f, grids, jnp.asarray(strides_np))[0])
    got_cxcywh = np.stack([
        (boxes[:, 0] + boxes[:, 2]) / 2, (boxes[:, 1] + boxes[:, 3]) / 2,
        boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]], axis=1)
    np.testing.assert_allclose(got_cxcywh, ref_cxcywh, atol=2e-3,
                               rtol=1e-5)
