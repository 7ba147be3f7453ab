"""Torch checkpoint import: reference state_dicts -> flax variables.

A user of the reference repos holds torch ``.pth`` files in one of two
naming families:

- **yolox-drone** ``YoloBody`` (models/base/yolox.py: YOLOPAFPN backbone
  wrapping CSPDarknet + decoupled YOLOXHead) — the coarse detector.
- **mmdet-style GFL / MP-Det** (yolox-ufp: ResNet ``backbone.*``, FPN
  ``neck.*``, GFL/MP head ``bbox_head.*``) — the stage-2 detector.

This module rewrites those dotted torch keys into this repo's flax
variable tree so reference-trained weights drop into the TPU models.
It is pure numpy: callers pass ``{key: np.ndarray}`` (the CLI,
tools/import_torch_weights.py, does the ``torch.load`` and detaches).

Layout conversions applied per leaf:

- Conv2d weight ``(O, I/g, kh, kw)`` -> flax kernel ``(kh, kw, I/g, O)``
  (works unchanged for depthwise convs: ``(C,1,k,k)`` -> ``(k,k,1,C)``).
- Linear weight ``(O, I)`` -> kernel ``(I, O)``.
- BatchNorm weight/bias -> params ``scale``/``bias``; running_mean/var ->
  ``batch_stats`` ``mean``/``var``; ``num_batches_tracked`` dropped.
- GroupNorm weight/bias -> ``scale``/``bias``.

Forward parity of the converted weights is proven by the gated tests in
tests/test_torch_parity.py, which build the actual reference torch
modules (plain-torch, importable in-image) and compare outputs.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Mapping, Tuple, Union

import numpy as np

__all__ = [
    "convert_yolox_drone",
    "convert_mpdet",
    "ImportReport",
]

MapResult = Union[None, str, Tuple[str, ...]]


class ImportReport:
    """What a conversion consumed and produced."""

    def __init__(self):
        self.converted: List[Tuple[str, str]] = []  # (torch key, flax path)
        self.skipped: List[str] = []                # e.g. num_batches_tracked
        self.unmatched: List[str] = []              # torch keys with no rule
        self.missing: List[str] = []                # template leaves not fed

    def summary(self) -> str:
        return (f"converted={len(self.converted)} skipped={len(self.skipped)} "
                f"unmatched={len(self.unmatched)} missing={len(self.missing)}")


# ---------------------------------------------------------------------------
# torch key -> flax dotted path (last component = torch leaf name)
# ---------------------------------------------------------------------------

def _csp_inner(rest: str) -> str:
    """CSPLayer children: conv1/conv2/conv3/m.{i} -> repo names.

    Reference layout (yolox-drone darknet.py:66): conv1 = main branch
    1x1, conv2 = shortcut 1x1, conv3 = final merge 1x1, m = Sequential
    of Bottlenecks (conv1 1x1 + conv2 3x3; depthwise conv2 = DWConv with
    dconv/pconv children).
    """
    rest = re.sub(r"^conv1\.", "main_conv.", rest)
    rest = re.sub(r"^conv2\.", "short_conv.", rest)
    rest = re.sub(r"^conv3\.", "final_conv.", rest)
    rest = re.sub(r"^m\.(\d+)\.conv2\.dconv\.", r"block\1.conv2_dw.dw.", rest)
    rest = re.sub(r"^m\.(\d+)\.conv2\.pconv\.", r"block\1.conv2_dw.pw.", rest)
    rest = re.sub(r"^m\.(\d+)\.", r"block\1.", rest)
    return rest


def _dw(rest: str) -> str:
    """DWConv children (darknet.py DWConv: dconv/pconv) -> dw/pw."""
    rest = re.sub(r"^dconv\.", "dw.", rest)
    rest = re.sub(r"^pconv\.", "pw.", rest)
    return rest


def _map_yolox_drone(key: str) -> MapResult:
    """Rewrite one yolox-drone ``YoloBody`` torch key to a flax path."""
    # --- CSPDarknet (inside YOLOPAFPN.backbone) ---
    m = re.match(r"^backbone\.backbone\.stem\.conv\.(.*)$", key)
    if m:
        return f"backbone.stem.conv.{m.group(1)}"
    m = re.match(r"^backbone\.backbone\.dark(\d)\.(\d+)\.(.*)$", key)
    if m:
        stage, idx, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        if stage == 5:
            slot = {0: "down", 1: "spp", 2: "csp"}[idx]
        else:
            slot = {0: "down", 1: "csp"}[idx]
        if slot == "down":
            return f"backbone.dark{stage}_down.{_dw(rest)}"
        if slot == "spp":
            return f"backbone.spp.{rest}"
        return f"backbone.dark{stage}_csp.{_csp_inner(rest)}"

    # --- PAFPN (YOLOPAFPN, yolox.py:95) ---
    pafpn = {
        "lateral_conv0": ("reduce5", False),
        "reduce_conv1": ("reduce4", False),
        "C3_p4": ("td_csp4", True),
        "C3_p3": ("td_csp3", True),
        "bu_conv2": ("bu_down3", False),
        "C3_n3": ("bu_csp4", True),
        "bu_conv1": ("bu_down4", False),
        "C3_n4": ("bu_csp5", True),
    }
    m = re.match(r"^backbone\.([A-Za-z0-9_]+)\.(.*)$", key)
    if m and m.group(1) in pafpn:
        name, is_csp = pafpn[m.group(1)]
        rest = _csp_inner(m.group(2)) if is_csp else _dw(m.group(2))
        return f"neck.{name}.{rest}"

    # --- decoupled head (yolox.py:11) ---
    m = re.match(r"^head\.stems\.(\d+)\.(.*)$", key)
    if m:
        return f"head.stem{m.group(1)}.{m.group(2)}"
    m = re.match(r"^head\.(cls|reg)_convs\.(\d+)\.(\d+)\.(.*)$", key)
    if m:
        branch, lvl, i, rest = m.groups()
        return f"head.{branch}{lvl}_{i}.{_dw(rest)}"
    m = re.match(r"^head\.(cls|reg|obj)_preds\.(\d+)\.(.*)$", key)
    if m:
        branch, lvl, rest = m.groups()
        return f"head.{branch}_pred{lvl}.{rest}"
    return None


def _map_mpdet(key: str) -> MapResult:
    """Rewrite one mmdet-style GFL/MP-Det torch key to a flax path.

    Naming source: mmdet ResNet (``backbone.conv1/bn1/layer{s}.{i}``),
    FPN (``neck.lateral_convs/fpn_convs``, extra levels appended to
    fpn_convs per add_extra_convs='on_output'), GFL/MP head
    (``bbox_head.cls_convs.{i}.conv/gn``, ``gfl_cls``/``gfl_reg``,
    ``scales.{i}.scale``, MPHead ``proxies``).
    """
    m = re.match(r"^backbone\.conv1\.(.*)$", key)
    if m:
        return f"backbone.stem.conv.{m.group(1)}"
    m = re.match(r"^backbone\.bn1\.(.*)$", key)
    if m:
        return f"backbone.stem.bn.{m.group(1)}"
    m = re.match(r"^backbone\.layer(\d)\.(\d+)\.conv(\d)\.(.*)$", key)
    if m:
        s, i, k, rest = m.groups()
        return f"backbone.layer{s}_{i}.conv{k}.conv.{rest}"
    m = re.match(r"^backbone\.layer(\d)\.(\d+)\.bn(\d)\.(.*)$", key)
    if m:
        s, i, k, rest = m.groups()
        return f"backbone.layer{s}_{i}.conv{k}.bn.{rest}"
    m = re.match(r"^backbone\.layer(\d)\.(\d+)\.downsample\.0\.(.*)$", key)
    if m:
        s, i, rest = m.groups()
        return f"backbone.layer{s}_{i}.down.conv.{rest}"
    m = re.match(r"^backbone\.layer(\d)\.(\d+)\.downsample\.1\.(.*)$", key)
    if m:
        s, i, rest = m.groups()
        return f"backbone.layer{s}_{i}.down.bn.{rest}"
    m = re.match(r"^neck\.lateral_convs\.(\d+)\.conv\.(.*)$", key)
    if m:
        return f"neck.lateral{m.group(1)}.{m.group(2)}"
    m = re.match(r"^neck\.fpn_convs\.(\d+)\.conv\.(.*)$", key)
    if m:
        i = int(m.group(1))
        # mmdet appends the extra-level stride-2 convs to fpn_convs
        # after the per-lateral 3x3s; start_level=1 -> 3 laterals
        if i < 3:
            return f"neck.fpn_conv{i}.{m.group(2)}"
        return f"neck.extra_conv{i - 3}.{m.group(2)}"
    m = re.match(r"^bbox_head\.(cls|reg)_convs\.(\d+)\.(conv|gn)\.(.*)$", key)
    if m:
        branch, i, child, rest = m.groups()
        return f"head.{branch}_conv{i}.{child}.{rest}"
    m = re.match(r"^bbox_head\.(gfl_cls(?:_conv)?)\.(.*)$", key)
    if m:
        # GFLHead names it gfl_cls; MPHead's proxy-logit conv is
        # gfl_cls_conv (mp_head.py:68) — offer both, the template decides
        return (f"head.gfl_cls.{m.group(2)}",
                f"head.gfl_cls_conv.{m.group(2)}")
    m = re.match(r"^bbox_head\.gfl_reg\.(.*)$", key)
    if m:
        return f"head.gfl_reg.{m.group(1)}"
    m = re.match(r"^bbox_head\.scales\.(\d+)\.scale$", key)
    if m:
        return f"head.scale{m.group(1)}.scale"
    if key == "bbox_head.proxies":
        return "head.proxies"
    if re.match(r"^bbox_head\._(embedding|pos_embedding_ptr|proxies_prob)$",
                key):
        # BoIW dictionary buffers (mp_head.py:80-92) live in this repo's
        # TrainState.boiw, not in model params — the CLI extracts them
        return "SKIP"
    if key == "bbox_head.integral.project":
        # the Integral layer's fixed linspace(0, reg_max) buffer
        # (gfl_head.py:31) — a constant, rebuilt by integral_decode
        return "SKIP"
    return None


# ---------------------------------------------------------------------------
# leaf conversion into a flax template
# ---------------------------------------------------------------------------

def _tree_paths(tree: Mapping, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_tree_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _leaf_target(flax_path: str, arr: np.ndarray):
    """-> (collection, path tuple, converted array) or None to skip.

    ``flax_path``'s last component is the torch leaf name.
    """
    *parent, leaf = flax_path.split(".")
    parts = tuple(parent)
    if leaf == "num_batches_tracked":
        return None
    if leaf == "running_mean":
        return ("batch_stats", parts + ("mean",), arr)
    if leaf == "running_var":
        return ("batch_stats", parts + ("var",), arr)
    if leaf == "weight":
        if arr.ndim == 4:
            return ("params", parts + ("kernel",), arr.transpose(2, 3, 1, 0))
        if arr.ndim == 2:
            return ("params", parts + ("kernel",), arr.transpose(1, 0))
        return ("params", parts + ("scale",), arr)  # BN/GN gamma
    if leaf == "bias":
        return ("params", parts + ("bias",), arr)
    # bare parameters keep their name (e.g. Scale.scale, MPHead.proxies)
    return ("params", parts + (leaf,), arr)


def _set(tree: dict, path: Tuple[str, ...], val) -> None:
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = val


def _convert(state: Mapping[str, np.ndarray],
             template: Mapping[str, Any],
             mapper: Callable[[str], MapResult],
             strict: bool = True):
    """Shared driver: rewrite keys, convert leaves, fill the template."""
    tpl = {
        "params": _tree_paths(template.get("params", {})),
        "batch_stats": _tree_paths(template.get("batch_stats", {})),
    }
    out: Dict[str, dict] = {"params": {}, "batch_stats": {}}
    report = ImportReport()

    for key, arr in state.items():
        arr = np.asarray(arr)
        mapped = mapper(key)
        if mapped is None:
            report.unmatched.append(key)
            if strict:
                raise KeyError(f"no rewrite rule for torch key {key!r}")
            continue
        if mapped == "SKIP":
            report.skipped.append(key)
            continue
        candidates = (mapped,) if isinstance(mapped, str) else mapped
        targets = [_leaf_target(c, arr) for c in candidates]
        if targets[0] is None:  # e.g. num_batches_tracked
            report.skipped.append(key)
            continue
        hit = next((t for t in targets if t and t[1] in tpl[t[0]]), None)
        if hit is None:
            miss = "/".join(targets[0][1])
            if strict:
                raise KeyError(f"{key} -> {miss}: not in template")
            report.unmatched.append(key)
            continue
        coll, path, val = hit
        want = np.shape(tpl[coll][path])
        if tuple(val.shape) != tuple(want):
            raise ValueError(f"{key} -> {'/'.join(path)}: shape "
                             f"{val.shape} != template {want}")
        _set(out[coll], path, val.astype(np.float32))
        report.converted.append((key, coll + "/" + "/".join(path)))

    fed = {("params",) + p for p in _tree_paths(out["params"])}
    fed |= {("batch_stats",) + p for p in _tree_paths(out["batch_stats"])}
    for coll in ("params", "batch_stats"):
        for p in tpl[coll]:
            if (coll,) + p not in fed:
                report.missing.append(coll + "/" + "/".join(p))
    if strict and report.missing:
        head = ", ".join(report.missing[:8])
        more = " ..." if len(report.missing) > 8 else ""
        raise KeyError(f"template leaves not covered: {head}{more}")
    if not out["batch_stats"]:
        out.pop("batch_stats")
    return out, report


def convert_yolox_drone(state: Mapping[str, np.ndarray],
                        template: Mapping[str, Any],
                        strict: bool = True):
    """yolox-drone ``YoloBody.state_dict()`` -> YOLOXDetector variables.

    ``template`` is ``model.init(...)`` output (params [+ batch_stats]);
    returns ``(variables, ImportReport)``.  With ``strict=False``,
    unmatched keys and uncovered template leaves are recorded in the
    report instead of raising (the reference's shape-matched partial
    load, yolox-drone/train.py:139-165).
    """
    return _convert(state, template, _map_yolox_drone, strict)


def convert_mpdet(state: Mapping[str, np.ndarray],
                  template: Mapping[str, Any],
                  strict: bool = True):
    """mmdet-style GFL/MP-Det state_dict -> MPDet/GFL variables."""
    return _convert(state, template, _map_mpdet, strict)
