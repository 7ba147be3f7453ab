"""Load the ACTUAL reference mmdet GFL/MPHead loss code with mmcv stubbed.

The reference snapshot ships the full mmdet python tree but mmcv is not in
this image (and the snapshot's ``mmdet/core/__init__.py`` is empty), so the
package cannot be imported wholesale.  This loader builds a synthetic
``mmdet`` package hierarchy whose sub-packages point at the REAL reference
directories, pre-registers stub modules only for names that live in mmcv
(ConvModule/Scale/Registry/force_fp32/...) or that the loss path never
touches (``dense_test_mixins``), and then imports the genuine files:

  - ``mmdet/core/bbox/assigners/atss_assigner.py``   (the real ATSS)
  - ``mmdet/core/bbox/coder/distance_point_bbox_coder.py``
  - ``mmdet/core/anchor/anchor_generator.py``
  - ``mmdet/models/losses/gfocal_loss.py``           (QFL + DFL)
  - ``mmdet/models/losses/iou_loss.py``              (GIoULoss)
  - ``mmdet/models/dense_heads/{base_dense_head,anchor_head,gfl_head,mp_head}.py``

so every line of target/loss math executed by the parity tests is the
reference's own code (gfl_head.py:218-648, mp_head.py:105-503).

The mmcv stubs replicate only documented mmcv-1.x semantics the loss path
relies on:
  - ``ConvModule(conv_cfg=None, norm_cfg=GN)``: Conv2d(bias=False when a
    norm is present) -> GroupNorm(num_groups, eps=1e-5) named ``gn`` ->
    ReLU(inplace) in conv/norm/act order;
  - ``Scale``: a single learnable scalar multiplier;
  - ``force_fp32``: identity (fp16 is never enabled here);
  - ``Registry``/``build_from_cfg``: type-keyed constructor dispatch.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

REF_MMDET = "/root/reference/yolox-ufp/mmdet"

_LOADED = {}


class ConfigDict(dict):
    """dict with attribute access (mmcv.ConfigDict for train_cfg trees)."""

    def __getattr__(self, key):
        try:
            val = self[key]
        except KeyError:
            raise AttributeError(key)
        if isinstance(val, dict) and not isinstance(val, ConfigDict):
            val = ConfigDict(val)
        return val


def _build_mmcv_stub():
    import torch
    import torch.nn as nn

    class Registry:
        def __init__(self, name, **kw):
            self.name = name
            self._module_dict = {}

        def register_module(self, name=None, force=False, module=None):
            def _register(cls):
                key = name if isinstance(name, str) else cls.__name__
                self._module_dict[key] = cls
                return cls

            if module is not None:
                return _register(module)
            return _register

        def get(self, key):
            return self._module_dict.get(key)

    def build_from_cfg(cfg, registry, default_args=None):
        args = dict(cfg)
        obj_type = args.pop("type")
        cls = registry.get(obj_type) if isinstance(obj_type, str) else obj_type
        if cls is None:
            raise KeyError(f"{obj_type} not in {registry.name} registry")
        if default_args is not None:
            for k, v in default_args.items():
                args.setdefault(k, v)
        return cls(**args)

    class ConvModule(nn.Module):
        """conv -> GN -> ReLU with mmcv naming (.conv / .gn)."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, bias="auto",
                     conv_cfg=None, norm_cfg=None, act_cfg=None, **kw):
            super().__init__()
            assert conv_cfg is None, "loss-path ConvModule is plain Conv2d"
            self.with_norm = norm_cfg is not None
            if bias == "auto":
                bias = not self.with_norm
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                                  stride=stride, padding=padding,
                                  dilation=dilation, groups=groups, bias=bias)
            if self.with_norm:
                assert norm_cfg["type"] == "GN", norm_cfg
                self.gn = nn.GroupNorm(norm_cfg["num_groups"], out_channels)
                self.norm_name = "gn"
            self.activate = nn.ReLU(inplace=True)

        @property
        def norm(self):
            return getattr(self, self.norm_name) if self.with_norm else None

        def forward(self, x):
            x = self.conv(x)
            if self.with_norm:
                x = self.gn(x)
            return self.activate(x)

    class Scale(nn.Module):
        def __init__(self, scale=1.0):
            super().__init__()
            self.scale = nn.Parameter(torch.tensor(scale, dtype=torch.float))

        def forward(self, x):
            return x * self.scale

    def normal_init(module, mean=0, std=1, bias=0):
        if hasattr(module, "weight") and module.weight is not None:
            nn.init.normal_(module.weight, mean, std)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def constant_init(module, val, bias=0):
        if hasattr(module, "weight") and module.weight is not None:
            nn.init.constant_(module.weight, val)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def bias_init_with_prob(prior_prob):
        import numpy as np
        return float(-np.log((1 - prior_prob) / prior_prob))

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg
            self._is_init = False

        def init_weights(self):
            self._is_init = True

    def force_fp32(apply_to=None, out_fp16=False):
        def deco(fn):
            return fn
        return deco

    def _jit(*a, **k):
        # mmcv.jit(derivate=..., coderize=...) is an identity outside parrots
        if a and callable(a[0]) and not k:
            return a[0]

        def deco(fn):
            return fn
        return deco

    mmcv = types.ModuleType("mmcv")
    mmcv.__version__ = "1.4.0"
    mmcv.jit = _jit
    mmcv.is_tuple_of = lambda seq, t: isinstance(seq, tuple) and all(
        isinstance(s, t) for s in seq)

    m_utils = types.ModuleType("mmcv.utils")
    m_utils.Registry = Registry
    m_utils.build_from_cfg = build_from_cfg
    m_utils.ConfigDict = ConfigDict

    m_cnn = types.ModuleType("mmcv.cnn")
    m_cnn.ConvModule = ConvModule
    m_cnn.Scale = Scale
    m_cnn.normal_init = normal_init
    m_cnn.constant_init = constant_init
    m_cnn.bias_init_with_prob = bias_init_with_prob
    m_cnn.MODELS = Registry("mmcv models")

    m_cnn_utils = types.ModuleType("mmcv.cnn.utils")
    m_cnn_wi = types.ModuleType("mmcv.cnn.utils.weight_init")
    m_cnn_wi.constant_init = constant_init
    m_cnn_wi.normal_init = normal_init
    m_cnn_utils.weight_init = m_cnn_wi
    m_cnn.utils = m_cnn_utils

    m_runner = types.ModuleType("mmcv.runner")
    m_runner.force_fp32 = force_fp32
    m_runner.BaseModule = BaseModule
    m_runner.OptimizerHook = object
    m_runner.get_dist_info = lambda: (0, 1)

    def _no_ops(*a, **k):
        raise RuntimeError("mmcv.ops is stubbed; the loss path must not hit it")

    m_ops = types.ModuleType("mmcv.ops")
    m_ops.batched_nms = _no_ops

    mmcv.utils = m_utils
    mmcv.cnn = m_cnn
    mmcv.runner = m_runner
    mmcv.ops = m_ops
    return {
        "mmcv": mmcv,
        "mmcv.utils": m_utils,
        "mmcv.cnn": m_cnn,
        "mmcv.cnn.utils": m_cnn_utils,
        "mmcv.cnn.utils.weight_init": m_cnn_wi,
        "mmcv.runner": m_runner,
        "mmcv.ops": m_ops,
    }


def _pkg(name, path=None):
    mod = types.ModuleType(name)
    if path is not None:
        mod.__path__ = [path]
    sys.modules[name] = mod
    return mod


def load_ref_mmdet():
    """Import the reference loss stack; returns the synthetic mmdet module.

    Idempotent per process.  Leaves the stub modules in sys.modules (the
    test image has no real mmcv/mmdet to clash with).
    """
    if "mmdet" in _LOADED:
        return _LOADED["mmdet"]
    assert os.path.isdir(REF_MMDET), "reference snapshot not mounted"

    # mp_head.py:393,394 hardcodes ``torch.tensor(0).cuda()`` on levels
    # with no positives; this image is torch-cpu, so .cuda() becomes a
    # no-op for the parity process (keeps the reference file untouched).
    import torch as _torch
    if not _torch.cuda.is_available():
        _torch.Tensor.cuda = lambda self, *a, **k: self

    sys.modules.update(_build_mmcv_stub())

    mmdet = _pkg("mmdet", REF_MMDET)
    _pkg("mmdet.utils", os.path.join(REF_MMDET, "utils"))
    core = _pkg("mmdet.core", os.path.join(REF_MMDET, "core"))
    _pkg("mmdet.core.utils", os.path.join(REF_MMDET, "core/utils"))
    _pkg("mmdet.core.anchor", os.path.join(REF_MMDET, "core/anchor"))
    bbox = _pkg("mmdet.core.bbox", os.path.join(REF_MMDET, "core/bbox"))
    _pkg("mmdet.core.bbox.iou_calculators",
         os.path.join(REF_MMDET, "core/bbox/iou_calculators"))
    _pkg("mmdet.core.bbox.assigners",
         os.path.join(REF_MMDET, "core/bbox/assigners"))
    _pkg("mmdet.core.bbox.samplers",
         os.path.join(REF_MMDET, "core/bbox/samplers"))
    _pkg("mmdet.core.bbox.coder",
         os.path.join(REF_MMDET, "core/bbox/coder"))
    models = _pkg("mmdet.models", os.path.join(REF_MMDET, "models"))
    _pkg("mmdet.models.losses", os.path.join(REF_MMDET, "models/losses"))
    _pkg("mmdet.models.dense_heads",
         os.path.join(REF_MMDET, "models/dense_heads"))

    # core/utils/misc.py imports mask structures it never uses here
    mask_pkg = _pkg("mmdet.core.mask")
    mask_structs = types.ModuleType("mmdet.core.mask.structures")
    mask_structs.BitmapMasks = type("BitmapMasks", (), {})
    mask_structs.PolygonMasks = type("PolygonMasks", (), {})
    sys.modules["mmdet.core.mask.structures"] = mask_structs
    mask_pkg.structures = mask_structs

    # models/builder.py pulls the mmcv MODELS registry tree; a local stub
    # registry keeps HEADS/LOSSES dispatch identical without it.
    from importlib import import_module
    mmcv_utils = sys.modules["mmcv.utils"]
    builder = types.ModuleType("mmdet.models.builder")
    builder.HEADS = mmcv_utils.Registry("head")
    builder.LOSSES = mmcv_utils.Registry("loss")
    builder.build_loss = lambda cfg: mmcv_utils.build_from_cfg(
        cfg, builder.LOSSES)
    sys.modules["mmdet.models.builder"] = builder
    models.builder = builder

    # the loss path never touches test-time aug mixins
    dtm = types.ModuleType("mmdet.models.dense_heads.dense_test_mixins")
    dtm.BBoxTestMixin = type("BBoxTestMixin", (), {})
    sys.modules["mmdet.models.dense_heads.dense_test_mixins"] = dtm

    # --- genuine reference modules, dependency order -----------------------
    util_mixins = import_module("mmdet.utils.util_mixins")
    sys.modules["mmdet.utils"].util_mixins = util_mixins

    misc = import_module("mmdet.core.utils.misc")
    dist_utils = import_module("mmdet.core.utils.dist_utils")
    cu = sys.modules["mmdet.core.utils"]
    for m in (misc, dist_utils):
        for name in getattr(m, "__all__", None) or [
                n for n in dir(m) if not n.startswith("_")]:
            setattr(cu, name, getattr(m, name))

    iou_builder = import_module(
        "mmdet.core.bbox.iou_calculators.builder")
    iou2d = import_module("mmdet.core.bbox.iou_calculators.iou2d_calculator")
    iou_pkg = sys.modules["mmdet.core.bbox.iou_calculators"]
    iou_pkg.build_iou_calculator = iou_builder.build_iou_calculator
    iou_pkg.bbox_overlaps = iou2d.bbox_overlaps
    iou_pkg.BboxOverlaps2D = iou2d.BboxOverlaps2D
    transforms = import_module("mmdet.core.bbox.transforms")
    bbox_builder = import_module("mmdet.core.bbox.builder")
    import_module("mmdet.core.bbox.coder.base_bbox_coder")
    import_module("mmdet.core.bbox.coder.distance_point_bbox_coder")
    import_module("mmdet.core.bbox.assigners.assign_result")
    import_module("mmdet.core.bbox.assigners.base_assigner")
    atss = import_module("mmdet.core.bbox.assigners.atss_assigner")
    import_module("mmdet.core.bbox.samplers.sampling_result")
    import_module("mmdet.core.bbox.samplers.base_sampler")
    import_module("mmdet.core.bbox.samplers.pseudo_sampler")
    anchor_utils = import_module("mmdet.core.anchor.utils")
    anchor_builder = import_module("mmdet.core.anchor.builder")
    anchor_gen = import_module("mmdet.core.anchor.anchor_generator")

    # synthesize the (empty-in-snapshot) mmdet.core namespace the heads
    # `from mmdet.core import ...` against
    core.bbox = bbox
    core.anchor_inside_flags = anchor_utils.anchor_inside_flags
    core.images_to_levels = anchor_utils.images_to_levels
    core.bbox_overlaps = iou2d.bbox_overlaps
    core.build_assigner = bbox_builder.build_assigner
    core.build_sampler = bbox_builder.build_sampler
    core.build_bbox_coder = bbox_builder.build_bbox_coder
    core.build_prior_generator = anchor_builder.build_prior_generator
    core.multi_apply = misc.multi_apply
    core.unmap = misc.unmap
    core.reduce_mean = dist_utils.reduce_mean
    core.bbox_mapping_back = transforms.bbox_mapping_back
    core.distance2bbox = transforms.distance2bbox
    core.bbox2distance = transforms.bbox2distance

    loss_utils = import_module("mmdet.models.losses.utils")
    gfocal = import_module("mmdet.models.losses.gfocal_loss")
    iou_loss = import_module("mmdet.models.losses.iou_loss")
    import_module("mmdet.models.dense_heads.base_dense_head")
    import_module("mmdet.models.dense_heads.anchor_head")
    gfl_head = import_module("mmdet.models.dense_heads.gfl_head")
    mp_head = import_module("mmdet.models.dense_heads.mp_head")

    mmdet.core = core
    mmdet.models = models
    mmdet.gfl_head = gfl_head
    mmdet.mp_head = mp_head
    mmdet.atss = atss
    mmdet.gfocal = gfocal
    mmdet.iou_loss = iou_loss
    mmdet.loss_utils = loss_utils
    mmdet.ConfigDict = ConfigDict
    _LOADED["mmdet"] = mmdet
    return mmdet


# ---------------------------------------------------------------------------
# head factories with the MP-Det training config (SURVEY §2.1: GFL recipe —
# single square anchor octave_base_scale=8, strides 8..128, ATSS topk=9,
# QFL beta=2 w1.0 / DFL w0.25 / GIoU w2.0)
# ---------------------------------------------------------------------------

GFL_STRIDES = (8, 16, 32, 64, 128)


def _head_cfg(num_classes=10, in_channels=256, feat_channels=256,
              stacked_convs=4):
    return dict(
        num_classes=num_classes,
        in_channels=in_channels,
        feat_channels=feat_channels,
        stacked_convs=stacked_convs,
        anchor_generator=dict(
            type="AnchorGenerator",
            ratios=[1.0],
            octave_base_scale=8,
            scales_per_octave=1,
            strides=list(GFL_STRIDES)),
        loss_cls=dict(type="QualityFocalLoss", use_sigmoid=True,
                      beta=2.0, loss_weight=1.0),
        loss_dfl=dict(type="DistributionFocalLoss", loss_weight=0.25),
        loss_bbox=dict(type="GIoULoss", loss_weight=2.0),
        reg_max=16,
        train_cfg=ConfigDict(
            assigner=dict(type="ATSSAssigner", topk=9),
            allowed_border=-1,
            pos_weight=-1,
            debug=False),
        test_cfg=ConfigDict(nms_pre=1000, score_thr=0.05,
                            max_per_img=100),
    )


def make_gfl_head(num_classes=10, in_channels=256, **kw):
    ref = load_ref_mmdet()
    head = ref.gfl_head.GFLHead(**_head_cfg(num_classes, in_channels, **kw))
    head.train()
    return head


def make_mp_head(num_classes=10, in_channels=256, num_words=20, beta=1.0,
                 gamma=10, proxies_list=(2, 3, 2, 5, 4, 8, 8, 4, 3, 3), **kw):
    ref = load_ref_mmdet()
    head = ref.mp_head.MPHead(
        num_words=num_words, beta=beta, gamma=gamma,
        proxies_list=list(proxies_list),
        **_head_cfg(num_classes, in_channels, **kw))
    head.train()
    return head
