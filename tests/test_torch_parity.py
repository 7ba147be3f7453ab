"""Forward-parity vs the ACTUAL reference torch models (gated).

The yolox-drone model zoo is plain torch (no mmcv) and torch-cpu is in
the image, so the strongest possible architecture evidence is runnable
here: random-initialize the reference ``YoloBody``
(yolox-drone/models/base/yolox.py), transplant its weights into this
repo's flax ``YOLOXDetector`` via utils/torch_import.py, and require the
two forwards to agree to float tolerance.  That pins, in one shot:

- CSPDarknet topology incl. Focus slice order, SPP pools, CSP splits
  (darknet.py:10-210),
- PAFPN wiring and concat order (yolox.py:95-238),
- decoupled-head towers and pred heads (yolox.py:11-93),
- BN semantics (eps=1e-3, eval-mode running stats) and weight layout
  conversion (OIHW->HWIO).

Losses (IOUloss, focal) are compared on random fixtures too.  Tests
skip when /root/reference or torch is unavailable.
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


@pytest.fixture(scope="module")
def ref_models():
    sys.path.insert(0, REF)
    try:
        import importlib

        yolox_mod = importlib.import_module("models.base.yolox")
        losses_mod = importlib.import_module(
            "models.losses.yolox_3assign")
        yield yolox_mod, losses_mod
    finally:
        sys.path.remove(REF)
        # drop the reference 'models' package so later imports in the
        # test session can't accidentally resolve to it
        for name in [n for n in sys.modules if n == "models"
                     or n.startswith("models.")]:
            del sys.modules[name]


def _randomize_bn_stats(module, seed):
    """Non-trivial running stats so eval-mode BN is actually exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.rand(m.running_mean.shape, generator=g) - 0.5)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) * 0.8 + 0.4)


@pytest.mark.parametrize("phi", ["nano", "s"])
def test_yolox_forward_parity(ref_models, phi):
    """Weight-transplanted YoloBody == YOLOXDetector, per level+branch.

    'nano' exercises the depthwise (DWConv) paths, 's' the plain convs.
    """
    import jax
    import jax.numpy as jnp

    from glsdet_tpu.models import YOLOXDetector
    from glsdet_tpu.utils.torch_import import convert_yolox_drone

    yolox_mod, _ = ref_models
    num_classes = 7
    torch.manual_seed(42)
    ref = yolox_mod.YoloBody(num_classes, phi).eval()
    _randomize_bn_stats(ref, seed=7)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = YOLOXDetector(num_classes=num_classes, phi=phi)
    template = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 3)), train=False))(jax.random.PRNGKey(0))
    variables, report = convert_yolox_drone(state, template)
    assert not report.unmatched and not report.missing, report.summary()
    assert len(report.converted) > 100  # every conv/bn actually mapped

    rs = np.random.RandomState(3)
    x = rs.rand(2, 64, 64, 3).astype(np.float32)
    cls_out, reg_out, obj_out = jax.jit(
        lambda v, im: model.apply(v, im, train=False))(
            variables, jnp.asarray(x))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    assert len(ref_out) == 3
    for lvl, r in enumerate(ref_out):
        r = r.numpy().transpose(0, 2, 3, 1)  # -> NHWC, channels 4+1+C
        np.testing.assert_allclose(
            np.asarray(reg_out[lvl]), r[..., :4], atol=2e-3, rtol=1e-3,
            err_msg=f"reg level {lvl}")
        np.testing.assert_allclose(
            np.asarray(obj_out[lvl]), r[..., 4:5], atol=2e-3, rtol=1e-3,
            err_msg=f"obj level {lvl}")
        np.testing.assert_allclose(
            np.asarray(cls_out[lvl]), r[..., 5:], atol=2e-3, rtol=1e-3,
            err_msg=f"cls level {lvl}")


def test_import_report_counts(ref_models):
    """Every torch tensor is consumed: converted + skipped == len(state)."""
    import jax
    import jax.numpy as jnp

    from glsdet_tpu.models import YOLOXDetector
    from glsdet_tpu.utils.torch_import import convert_yolox_drone

    yolox_mod, _ = ref_models
    torch.manual_seed(0)
    ref = yolox_mod.YoloBody(3, "nano")
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model = YOLOXDetector(num_classes=3, phi="nano")
    template = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 3)), train=False))(jax.random.PRNGKey(0))
    _, report = convert_yolox_drone(state, template)
    assert len(report.converted) + len(report.skipped) == len(state)
    # the only skipped keys are BN bookkeeping counters
    assert all(k.endswith("num_batches_tracked") for k in report.skipped)


def test_iou_loss_parity(ref_models):
    """IOUloss (losses/yolox_3assign.py:11) == this repo's losses.

    The reference takes cxcywh pairs; 'iou' mode is 1 - iou^2 (our
    iou_loss mode='square'), 'giou' is 1 - giou (our giou_loss).  Ours
    take xyxy, so convert the same fixtures.
    """
    import jax.numpy as jnp

    from glsdet_tpu.losses import giou_loss, iou_loss
    from glsdet_tpu.ops.boxes import box_cxcywh_to_xyxy

    _, losses_mod = ref_models
    rs = np.random.RandomState(11)
    n = 64
    pred = np.stack([
        rs.uniform(10, 90, n), rs.uniform(10, 90, n),
        rs.uniform(2, 40, n), rs.uniform(2, 40, n)], axis=1).astype(
        np.float32)
    tgt = np.stack([
        rs.uniform(10, 90, n), rs.uniform(10, 90, n),
        rs.uniform(2, 40, n), rs.uniform(2, 40, n)], axis=1).astype(
        np.float32)
    pred_xyxy = box_cxcywh_to_xyxy(jnp.asarray(pred))
    tgt_xyxy = box_cxcywh_to_xyxy(jnp.asarray(tgt))

    ref_iou = losses_mod.IOUloss(reduction="none", loss_type="iou")(
        torch.from_numpy(pred), torch.from_numpy(tgt)).numpy()
    np.testing.assert_allclose(
        np.asarray(iou_loss(pred_xyxy, tgt_xyxy, mode="square")),
        ref_iou, atol=1e-5, rtol=1e-5, err_msg="iou")

    ref_giou = losses_mod.IOUloss(reduction="none", loss_type="giou")(
        torch.from_numpy(pred), torch.from_numpy(tgt)).numpy()
    np.testing.assert_allclose(
        np.asarray(giou_loss(pred_xyxy, tgt_xyxy)),
        ref_giou, atol=1e-5, rtol=1e-5, err_msg="giou")


def test_mpdet_key_mapping_roundtrip():
    """convert_mpdet covers the full MPDet tree from mmdet-style keys.

    No mmcv in the image, so the mmdet model itself can't run; instead
    a state dict with mmdet's documented naming (resnet.py layer/bn,
    fpn lateral_convs/fpn_convs, mp_head.py gfl_cls_conv/proxies/
    scales/_embedding) is synthesized shape-for-shape and must land on
    every template leaf.
    """
    import jax
    import jax.numpy as jnp

    from glsdet_tpu.models import MPDet
    from glsdet_tpu.utils.torch_import import convert_mpdet

    model = MPDet(num_classes=2, depth=50, proxies_list=(2, 3))
    template = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 3)), train=False))(jax.random.PRNGKey(0))

    # synthesize mmdet-named tensors from the template's own shapes
    rs = np.random.RandomState(0)
    state = {}

    def conv(mm_key, tpl):  # flax (kh,kw,I,O) -> torch (O,I,kh,kw)
        k = np.asarray(tpl["kernel"])
        state[mm_key + ".weight"] = rs.randn(
            *np.transpose(k, (3, 2, 0, 1)).shape).astype(np.float32)
        if "bias" in tpl:
            state[mm_key + ".bias"] = rs.randn(
                *np.shape(tpl["bias"])).astype(np.float32)

    def bn(mm_key, tpl_p, tpl_s):
        c = np.shape(tpl_p["scale"])[0]
        state[mm_key + ".weight"] = rs.randn(c).astype(np.float32)
        state[mm_key + ".bias"] = rs.randn(c).astype(np.float32)
        state[mm_key + ".running_mean"] = rs.randn(c).astype(np.float32)
        state[mm_key + ".running_var"] = np.abs(
            rs.randn(c)).astype(np.float32)
        state[mm_key + ".num_batches_tracked"] = np.asarray(0)

    p, s = template["params"], template["batch_stats"]
    bb, bbs = p["backbone"], s["backbone"]
    conv("backbone.conv1", bb["stem"]["conv"])
    bn("backbone.bn1", bb["stem"]["bn"], bbs["stem"]["bn"])
    blocks = {1: 3, 2: 4, 3: 6, 4: 3}  # R50
    for st, n in blocks.items():
        for i in range(n):
            blk = bb[f"layer{st}_{i}"]
            blks = bbs[f"layer{st}_{i}"]
            for k in (1, 2, 3):
                conv(f"backbone.layer{st}.{i}.conv{k}", blk[f"conv{k}"]["conv"])
                bn(f"backbone.layer{st}.{i}.bn{k}", blk[f"conv{k}"]["bn"],
                   blks[f"conv{k}"]["bn"])
            if "down" in blk:
                conv(f"backbone.layer{st}.{i}.downsample.0",
                     blk["down"]["conv"])
                bn(f"backbone.layer{st}.{i}.downsample.1",
                   blk["down"]["bn"], blks["down"]["bn"])
    nk = p["neck"]
    for i in range(3):
        conv(f"neck.lateral_convs.{i}.conv", nk[f"lateral{i}"])
        conv(f"neck.fpn_convs.{i}.conv", nk[f"fpn_conv{i}"])
    for i in range(2):
        conv(f"neck.fpn_convs.{3 + i}.conv", nk[f"extra_conv{i}"])
    hd = p["head"]
    for i in range(4):
        for br in ("cls", "reg"):
            conv(f"bbox_head.{br}_convs.{i}.conv",
                 hd[f"{br}_conv{i}"]["conv"])
            c = np.shape(hd[f"{br}_conv{i}"]["gn"]["scale"])[0]
            state[f"bbox_head.{br}_convs.{i}.gn.weight"] = rs.randn(
                c).astype(np.float32)
            state[f"bbox_head.{br}_convs.{i}.gn.bias"] = rs.randn(
                c).astype(np.float32)
    conv("bbox_head.gfl_cls_conv", hd["gfl_cls_conv"])
    conv("bbox_head.gfl_reg", hd["gfl_reg"])
    for i in range(5):
        state[f"bbox_head.scales.{i}.scale"] = np.asarray(
            1.0, np.float32)
    state["bbox_head.proxies"] = rs.randn(
        *np.shape(hd["proxies"])).astype(np.float32)
    # BoIW buffers ride along in reference checkpoints (mp_head.py:80-92)
    state["bbox_head._embedding"] = rs.randn(3, 10, 256).astype(np.float32)
    state["bbox_head._pos_embedding_ptr"] = np.zeros(3, np.int64)
    state["bbox_head._proxies_prob"] = rs.rand(5).astype(np.float32)

    variables, report = convert_mpdet(state, template)
    assert not report.missing and not report.unmatched, report.summary()
    skipped_ok = ("num_batches_tracked", "_embedding",
                  "_pos_embedding_ptr", "_proxies_prob")
    assert all(k.endswith(skipped_ok) for k in report.skipped)
    # transpose sanity: one conv kernel round-trips exactly
    got = np.asarray(variables["params"]["backbone"]["stem"]["conv"]["kernel"])
    want = state["backbone.conv1.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)
