"""Static-scale W8A8 inference with int8-resident activations (PTQ).

The dynamic int8 mode (``ops/quant.py``) computes activation scales with
a data-dependent max reduction — an extra HBM pass per conv that makes
the bandwidth-bound layers a net loss.  This module replaces it with the
classic post-training-quantization recipe, laid out for XLA:TPU:

1. **Calibrate**: run a few batches with a recording interceptor that
   returns each eligible module's input/output absmax as jitted scalar
   outputs (no eager replay, no big readbacks).  Host-side max over
   batches -> ``{module_path: scale}``.
2. **Serve**: a second interceptor rewrites every eligible
   conv+norm+act module (``ResNetConv``, ``ConvNormAct``) to
   ``int8 x int8 -> int32`` convolution with per-output-channel weight
   scales and the *static* input scale, BN folded at trace time (GN
   cannot fold — it runs in f32 between the int8 convs), and
   **fake-quantizes module outputs** (round to the int8 grid, keep the
   float dtype).  Block boundaries (``Bottleneck``/``BasicBlock``) are
   fake-quantized too, so XLA fuses the quantize into each producer's
   epilogue and the dequantize into each consumer's prologue — the
   tensor MATERIALIZED in HBM between blocks is int8, halving the
   bandwidth-bound backbone traffic, while the MXU runs at 2x bf16
   peak.  Measured on the ResNet-50 identity-bottleneck chain
   (scripts/bench_int8_chain.py, v5e b8): 1.56x / 1.06x / 1.18x / 1.64x
   over bf16 at stages 2/3/4/5.

Prediction convs (bare ``nn.Conv``: gfl_cls/gfl_reg, YOLOX heads' final
preds) are never touched — they are not ``ConvNormAct`` modules.  Tiny
gates and depthwise convs are excluded by policy (``min_channels``,
groups == 1).

Inference only.  Reference analog: none (the reference serves f32 CUDA
models); exposed as ``quant8="static"`` on the serving surfaces.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.layers import ACTIVATIONS, BN_EPS

__all__ = ["calibrate_scales", "static_quant_inference",
           "wrap_apply_quant8_static", "save_scales", "load_scales"]

SCALES_FORMAT = "glsdet-int8-scales-v1"


def save_scales(path: str, scales) -> str:
    """Persist calibrated activation scales as JSON: a single
    ``{module_path: scale}`` dict (one model) or a ``(coarse, mp)``
    pair (two-stage pipeline).  Scales are tiny (a few KB) — persisting
    them means a served model never re-calibrates on boot."""
    import json
    import os

    if isinstance(scales, dict):
        payload = {"format": SCALES_FORMAT, "scales": scales}
    else:
        coarse, mp = scales
        payload = {"format": SCALES_FORMAT, "coarse": dict(coarse),
                   "mp": dict(mp)}
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    return path


def load_scales(path: str):
    """Inverse of :func:`save_scales`: returns the dict or the
    ``(coarse, mp)`` tuple."""
    import json

    with open(path) as f:
        payload = json.load(f)
    if payload.get("format") != SCALES_FORMAT:
        raise ValueError(f"{path}: not a {SCALES_FORMAT} file")
    if "scales" in payload:
        return payload["scales"]
    return payload["coarse"], payload["mp"]

_RECORDS: contextvars.ContextVar[Optional[dict]] = contextvars.ContextVar(
    "glsdet_quant_records", default=None)


# --------------------------------------------------------------------------
# module introspection helpers
# --------------------------------------------------------------------------

def _module_kinds():
    from glsdet_tpu.models.layers import ConvNormAct
    from glsdet_tpu.models.resnet import BasicBlock, Bottleneck, ResNetConv
    return (ResNetConv, ConvNormAct), (Bottleneck, BasicBlock)


def _conv_attrs(m) -> Optional[dict]:
    """Normalize ResNetConv/ConvNormAct attributes into one conv spec."""
    from glsdet_tpu.models.layers import ConvNormAct
    from glsdet_tpu.models.resnet import ResNetConv

    k = int(m.kernel_size)
    pad = k // 2
    if type(m) is ResNetConv:
        return dict(kernel=(k, k), stride=(m.stride, m.stride),
                    pad=[(pad, pad)] * 2, groups=1, norm="bn",
                    act="relu" if m.act else None, bias=False)
    if type(m) is ConvNormAct:
        bias = (m.use_bias if m.use_bias is not None else m.norm is None)
        return dict(kernel=(k, k), stride=(m.stride, m.stride),
                    pad=[(pad, pad)] * 2, groups=m.groups, norm=m.norm,
                    act=m.act, bias=bias)
    return None


def _eligible(m, x, min_channels: int) -> bool:
    spec = _conv_attrs(m)
    if spec is None or not isinstance(x, jnp.ndarray) or x.ndim != 4:
        return False
    if spec["groups"] != 1:
        return False  # depthwise: VPU-bound, int8 gains nothing
    return x.shape[-1] >= min_channels and m.out_channels >= min_channels


# Bare nn.Conv (FPN laterals/outputs) joins the int8 path only at >=128
# in AND out channels: this keeps every prediction conv (gfl_cls 10,
# gfl_reg 68, yolox cls/reg/obj <= num_classes) in full precision by
# construction while covering the 256-channel neck convs.  Convs whose
# PARENT is a conv+norm+act module are excluded: the parent interceptor
# owns them (and sees the ``train`` flag bare nn.Conv cannot), and
# embedding/prediction convs named ``*cls*``/``*reg*`` stay f32 — they
# feed cosine-similarity / distribution decoding where int8 error is
# disproportionate.
BARE_CONV_MIN_CHANNELS = 128


def _bare_conv_eligible(m, x) -> bool:
    if (type(m) is not nn.Conv or not isinstance(x, jnp.ndarray)
            or x.ndim != 4):
        return False
    rewrite_kinds, _ = _module_kinds()
    if m.parent is not None and type(m.parent) in rewrite_kinds:
        return False
    name = m.name or ""
    if "cls" in name or "reg" in name or "pred" in name or "obj" in name:
        return False
    if m.feature_group_count != 1:
        return False
    if m.input_dilation not in (None, 1, (1, 1)):
        return False
    if not (isinstance(m.padding, str) and m.padding in ("SAME", "VALID")):
        if not isinstance(m.padding, (int, list, tuple)):
            return False
    return (x.shape[-1] >= BARE_CONV_MIN_CHANNELS
            and m.features >= BARE_CONV_MIN_CHANNELS)


def _bare_conv_spec(m):
    k = m.kernel_size
    kernel = (k, k) if isinstance(k, int) else tuple(k)
    pad = m.padding
    if isinstance(pad, int):
        pad = [(pad, pad)] * len(kernel)
    elif isinstance(pad, (list, tuple)):
        pad = [(p, p) if isinstance(p, int) else tuple(p) for p in pad]
    s = m.strides
    strides = ((1, 1) if s is None
               else (s, s) if isinstance(s, int) else tuple(s))
    return kernel, pad, strides


def _quant_bare_conv(m, x, s_in: float):
    v = m.variables.get("params", {})
    if "kernel" not in v:
        return None
    kernel = v["kernel"].astype(jnp.float32)
    _, pad, strides = _bare_conv_spec(m)
    s_w = jnp.maximum(
        jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8) / 127.0
    q_w = jnp.round(kernel / s_w).astype(jnp.int8)
    q_x = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in),
                   -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        q_x, q_w, strides, pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_in * s_w)
    if m.use_bias and "bias" in v:
        y = y + v["bias"].astype(jnp.float32)
    return y.astype(m.dtype or x.dtype)


def _path_key(context) -> str:
    return "/".join(context.module.path)


def _fq(x, scale):
    """Fake-quantize to the symmetric int8 grid, keep dtype."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return (q * scale).astype(x.dtype)


# --------------------------------------------------------------------------
# calibration
# --------------------------------------------------------------------------

def _make_recording_interceptor(min_channels: int):
    rewrite_kinds, boundary_kinds = _module_kinds()

    def interceptor(next_fun, args, kwargs, context):
        records = _RECORDS.get()
        m = context.module
        if (records is None or context.method_name != "__call__"
                or not args):
            return next_fun(*args, **kwargs)
        x = args[0]
        if ((type(m) in rewrite_kinds and _eligible(m, x, min_channels))
                or _bare_conv_eligible(m, x)):
            key = _path_key(context) + ".in"
            mx = jnp.max(jnp.abs(x.astype(jnp.float32)))
            records[key] = jnp.maximum(records.get(key, 0.0), mx)
        out = next_fun(*args, **kwargs)
        if (type(m) in rewrite_kinds + boundary_kinds
                and isinstance(out, jnp.ndarray) and out.ndim == 4
                and out.shape[-1] >= min_channels):
            key = _path_key(context) + ".out"
            mx = jnp.max(jnp.abs(out.astype(jnp.float32)))
            records[key] = jnp.maximum(records.get(key, 0.0), mx)
        return out

    return interceptor


def calibrate_scales(apply_fn: Callable, variables, batches,
                     min_channels: int = 32) -> Dict[str, float]:
    """Run ``apply_fn(variables, batch)`` over ``batches`` recording each
    eligible module's input/output absmax; returns {path_key: scale}
    with scale = absmax / 127 (symmetric int8).

    The recording runs inside jit — each batch costs one forward plus a
    dict of scalar readbacks (tunnel-friendly).  Models trace with remat
    disabled: the recorded absmax values must cross module boundaries,
    which ``nn.remat`` scopes forbid (remat is a backward-pass memory
    optimization — skipping it changes nothing in a forward).
    """
    from glsdet_tpu.models.layers import disable_remat

    interceptor = _make_recording_interceptor(min_channels)

    def _rec(variables, batch):
        records: dict = {}
        tok = _RECORDS.set(records)
        try:
            with disable_remat(), nn.intercept_methods(interceptor):
                apply_fn(variables, batch)
        finally:
            _RECORDS.reset(tok)
        return records

    rec_jit = jax.jit(_rec)
    acc: Dict[str, float] = {}
    for batch in batches:
        rec = jax.device_get(rec_jit(variables, batch))
        for k, v in rec.items():
            acc[k] = max(acc.get(k, 0.0), float(v))
    return {k: max(v, 1e-6) / 127.0 for k, v in acc.items()}


# --------------------------------------------------------------------------
# serving rewrite
# --------------------------------------------------------------------------

def _folded_weights(m, spec):
    """(kernel, bias) in f32 with inference-BN folded; None if params
    are missing (fall through to full precision)."""
    v = m.variables
    params = v.get("params", {})
    try:
        kernel = params["conv"]["kernel"].astype(jnp.float32)
    except (KeyError, TypeError):
        return None
    bias = (params["conv"]["bias"].astype(jnp.float32)
            if spec["bias"] else jnp.zeros((m.out_channels,), jnp.float32))
    if spec["norm"] == "bn":
        try:
            bn_p = params["bn"]
            bn_s = v["batch_stats"]["bn"]
        except (KeyError, TypeError):
            return None
        s = (bn_p["scale"].astype(jnp.float32)
             / jnp.sqrt(bn_s["var"].astype(jnp.float32) + BN_EPS))
        kernel = kernel * s
        bias = (bias - bn_s["mean"].astype(jnp.float32)) * s \
            + bn_p["bias"].astype(jnp.float32)
    return kernel, bias


def _group_norm(y, m, dtype):
    """flax nn.GroupNorm equivalent: ``dtype`` (bf16) storage with f32
    reductions — the f32-everywhere version doubles the head towers'
    normalize traffic and eats the int8 conv gains."""
    p = m.variables["params"]["gn"]
    g = min(m.gn_groups, m.out_channels)
    B, H, W, C = y.shape
    yg = y.astype(dtype).reshape(B, H, W, g, C // g)
    yf = yg.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(yf), axis=(1, 2, 4), keepdims=True) \
        - jnp.square(mean)
    scale = (jax.lax.rsqrt(var + 1e-6)
             * p["scale"].astype(jnp.float32).reshape(g, C // g))
    bias = p["bias"].astype(jnp.float32).reshape(g, C // g) - mean * scale
    y = yg * scale.astype(dtype) + bias.astype(dtype)
    return y.reshape(B, H, W, C)


def _quant_module_call(m, x, spec, s_in: float, s_out: Optional[float]):
    folded = _folded_weights(m, spec)
    if folded is None:
        return None
    kernel, bias = folded

    s_w = jnp.maximum(
        jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8) / 127.0
    q_w = jnp.round(kernel / s_w).astype(jnp.int8)
    q_x = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in),
                   -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        q_x, q_w, spec["stride"], spec["pad"],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_in * s_w)
    out_dtype = m.dtype or x.dtype
    if spec["norm"] == "gn":
        y = _group_norm(y + bias, m, out_dtype)
    else:
        y = y + bias  # BN already folded into (kernel, bias)
    if spec["act"]:
        y = ACTIVATIONS[spec["act"]](y)
    if s_out is not None:
        y = _fq(y, s_out)
    return y.astype(out_dtype)


# --------------------------------------------------------------------------
# explicit int8 ResNet backbone
# --------------------------------------------------------------------------
# The interceptor-level rewrite keeps block boundaries in the float
# domain (fake-quant), trusting XLA to materialize int8 — measured, it
# does not: backbone-only gains ~1.02x while the SAME math written as an
# explicit int8 dataflow (int8 tensors between blocks) gains 1.2-1.6x
# per stage (scripts/bench_int8_chain.py).  So the whole ResNet-50
# inference forward is reimplemented here as explicit int8: activations
# LIVE as int8 arrays between convs and blocks (half the HBM bytes of
# bf16 — the backbone's bound), with f32 only inside conv epilogues and
# the residual adds.  Parameters are read from the intercepted module's
# bound variables; BN is folded at trace time.


def _qconv(q_x, s_x, kernel, bias, stride, pad, act, s_out):
    """int8 conv -> f32 epilogue (+bias, relu) -> requant (or f32 out
    when ``s_out`` is None)."""
    s_w = jnp.maximum(
        jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-8) / 127.0
    q_w = jnp.round(kernel / s_w).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        q_x, q_w, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_x * s_w) + bias
    if act:
        y = jax.nn.relu(y)
    if s_out is None:
        return y
    return jnp.clip(jnp.round(y / s_out), -127, 127).astype(jnp.int8)


def _int8_resnet_forward(m, x, scales: Dict[str, float]):
    """Explicit int8 inference forward of a bound ``ResNet`` (depth>=50).
    Returns stage features in the module dtype, or None when any needed
    parameter/scale is missing (caller falls back)."""
    from glsdet_tpu.models.resnet import STAGE_BLOCKS

    if m.depth < 50:
        return None
    prefix = "/".join(m.path)
    v = m.variables
    params = v.get("params", {})
    stats = v.get("batch_stats", {})
    out_dtype = m.dtype or x.dtype

    def fold(name):
        node, snode = params, stats
        for part in name.split("/"):
            node, snode = node[part], snode[part]
        kernel = node["conv"]["kernel"].astype(jnp.float32)
        bn_p, bn_s = node["bn"], snode["bn"]
        s = (bn_p["scale"].astype(jnp.float32)
             / jnp.sqrt(bn_s["var"].astype(jnp.float32) + BN_EPS))
        bias = (bn_p["bias"].astype(jnp.float32)
                - bn_s["mean"].astype(jnp.float32) * s)
        return kernel * s, bias

    def s_of(key):
        return scales[f"{prefix}/{key}" if prefix else key]

    try:
        # stem (3 input channels): bf16 conv, then enter the int8 domain
        k, b = fold("stem")
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (2, 2),
            [(3, 3)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jax.nn.relu(y + b)
        s_cur = s_of("stem.out")
        q = jnp.clip(jnp.round(y / s_cur), -127, 127).astype(jnp.int8)
        # 3x3/2 maxpool stays in int8 (monotone; relu output >= 0 keeps
        # the absmax, so the scale carries through unchanged)
        q = jax.lax.reduce_window(
            q, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])

        outs = []
        for stage, n in enumerate(STAGE_BLOCKS[m.depth]):
            for i in range(n):
                blk = f"layer{stage + 1}_{i}"
                stride = 2 if (i == 0 and stage > 0) else 1
                k1, b1 = fold(f"{blk}/conv1")
                k2, b2 = fold(f"{blk}/conv2")
                k3, b3 = fold(f"{blk}/conv3")
                y1 = _qconv(q, s_cur, k1, b1, 1, 0, True,
                            s_of(f"{blk}/conv1.out"))
                y2 = _qconv(y1, s_of(f"{blk}/conv1.out"), k2, b2,
                            stride, 1, True, s_of(f"{blk}/conv2.out"))
                y3 = _qconv(y2, s_of(f"{blk}/conv2.out"), k3, b3,
                            1, 0, False, None)           # f32
                if "down" in params.get(blk, {}):
                    kd, bd = fold(f"{blk}/down")
                    idt = _qconv(q, s_cur, kd, bd, stride, 0, False,
                                 None)                   # f32
                else:
                    idt = q.astype(jnp.float32) * s_cur
                y = jax.nn.relu(y3 + idt)
                s_cur = s_of(f"{blk}.out")
                q = jnp.clip(jnp.round(y / s_cur),
                             -127, 127).astype(jnp.int8)
            if stage in m.out_indices:
                outs.append((q.astype(jnp.float32)
                             * s_cur).astype(out_dtype))
        return tuple(outs)
    except KeyError:
        return None


# --------------------------------------------------------------------------
# explicit int8 GFL/MP head towers
# --------------------------------------------------------------------------
# Same lesson as the backbone: the per-module fake-quant rewrite keeps
# the stacked towers' boundaries in the float domain — every ConvNormAct
# re-reads a bf16 tensor, re-quantizes it, and fake-quantizes its output
# back to bf16.  Measured 0.94 ms/img at 1024^2 (b16, v5e) against a
# ~0.3 ms/img byte/flop bound (scripts/profile_mpdet_split.py).  Here
# the towers run as an explicit int8 dataflow: activations LIVE as int8
# arrays between tower convs, GN + relu run on the f32 conv epilogue and
# write int8 directly.  Numerics match the fake-quant path exactly: the
# int8 values are the same rounds (module i's .out scale equals module
# i+1's .in scale — the calibration recorded the same tensor).  The
# predictor convs (gfl_cls / gfl_reg / gfl_cls_conv) and the proxy
# classifier stay full precision by policy (they feed cosine similarity
# and distribution decoding).


def _gn_relu(y, gn_params, groups, dtype):
    """GroupNorm (f32 reductions, ``dtype`` storage — see _group_norm)
    followed by relu, from explicit params."""
    B, H, W, C = y.shape
    g = min(groups, C)
    yg = y.astype(dtype).reshape(B, H, W, g, C // g)
    yf = yg.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(yf), axis=(1, 2, 4), keepdims=True) \
        - jnp.square(mean)
    scale = (jax.lax.rsqrt(var + 1e-6)
             * gn_params["scale"].astype(jnp.float32).reshape(g, C // g))
    bias = (gn_params["bias"].astype(jnp.float32).reshape(g, C // g)
            - mean * scale)
    yg = yg * scale.astype(dtype) + bias.astype(dtype)
    return jax.nn.relu(yg.reshape(B, H, W, C))


def _pred_conv(x, p, dtype):
    """Full-precision 3x3 predictor conv (bias, SAME padding)."""
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype), (1, 1),
        [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(dtype)


def _int8_head_forward(m, feats, scales: Dict[str, float]):
    """Explicit int8 inference forward of a bound GFLHead or MPHead.

    Returns (cls_out, bbox_preds) with the module's inference contract,
    or None when any parameter/scale is missing (caller falls back to
    the per-module rewrite).
    """
    from glsdet_tpu.models.gfl_head import GFLHead
    from glsdet_tpu.models.mp_head import (MPHead, proxy_class_matrix,
                                           proxy_scores)

    is_mp = type(m) is MPHead
    prefix = "/".join(m.path)
    params = m.variables.get("params", {})
    out_dtype = m.dtype or feats[0].dtype
    nst = m.stacked_convs
    gn_groups = 32  # ConvNormAct default (layers.py:87)

    def s_of(key):
        return scales[f"{prefix}/{key}" if prefix else key]

    try:
        towers = {}
        for t in ("cls", "reg"):
            ks, gns, s_in0, s_outs = [], [], None, []
            for i in range(nst):
                node = params[f"{t}_conv{i}"]
                ks.append(node["conv"]["kernel"].astype(jnp.float32))
                gns.append(node["gn"])
                if i == 0:
                    s_in0 = s_of(f"{t}_conv{i}.in")
                s_outs.append(s_of(f"{t}_conv{i}.out"))
            towers[t] = (ks, gns, s_in0, s_outs)
        if is_mp:
            p_cls = params["gfl_cls_conv"]
            proxies = params["proxies"].astype(jnp.float32)
            membership = jnp.asarray(proxy_class_matrix(m.proxies_list))
        else:
            p_cls = params["gfl_cls"]
        p_reg = params["gfl_reg"]
        lvl_scales = [params[f"scale{i}"]["scale"]
                      for i in range(m.num_levels)]
    except KeyError:
        return None

    from glsdet_tpu.ops.pallas_gn import (gn_eligible, gn_enabled,
                                          gn_relu_quant)

    use_pallas_gn = gn_enabled() and out_dtype == jnp.bfloat16

    def run_tower(x, t):
        ks, gns, s_in0, s_outs = towers[t]
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in0),
                     -127, 127).astype(jnp.int8)
        s_cur = s_in0
        for k, gn, s_out in zip(ks, gns, s_outs):
            s_w = jnp.maximum(
                jnp.max(jnp.abs(k), axis=(0, 1, 2)), 1e-8) / 127.0
            q_w = jnp.round(k / s_w).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                q, q_w, (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            if use_pallas_gn and gn_eligible(y.shape, gn_groups):
                # fused GN+relu+requant: the dequant folds into the conv
                # epilogue's bf16 store and the activation is read from
                # HBM once instead of twice (pallas_gn.py)
                yq = (y.astype(jnp.float32)
                      * (s_cur * s_w)).astype(jnp.bfloat16)
                q = gn_relu_quant(yq, gn["scale"], gn["bias"], s_out,
                                  groups=gn_groups)
            else:
                y = y.astype(jnp.float32) * (s_cur * s_w)
                y = _gn_relu(y, gn, gn_groups, out_dtype)
                q = jnp.clip(jnp.round(y.astype(jnp.float32) / s_out),
                             -127, 127).astype(jnp.int8)
            s_cur = s_out
        return (q.astype(jnp.float32) * s_cur).astype(out_dtype)

    cls_out, bbox_preds = [], []
    for lvl, x in enumerate(feats):
        cls_feat = run_tower(x, "cls")
        reg_feat = run_tower(x, "reg")
        bp = _pred_conv(reg_feat, p_reg, out_dtype)
        bp = (bp * lvl_scales[lvl].astype(bp.dtype)).astype(jnp.float32)
        bbox_preds.append(bp)
        cf = _pred_conv(cls_feat, p_cls, out_dtype)
        if is_mp:
            b, h, w, c = cf.shape
            sc = proxy_scores(cf.reshape(-1, c).astype(jnp.float32),
                              proxies, membership, m.gamma)
            cls_out.append(sc.reshape(b, h, w, m.num_classes))
        else:
            cls_out.append(cf)
    return cls_out, bbox_preds


def _make_static_interceptor(scales: Dict[str, float], min_channels: int):
    rewrite_kinds, boundary_kinds = _module_kinds()

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if (context.method_name != "__call__" or not args
                or kwargs.get("train", False)):
            return next_fun(*args, **kwargs)
        x = args[0]
        key = _path_key(context)
        from glsdet_tpu.models.gfl_head import GFLHead
        from glsdet_tpu.models.mp_head import MPHead
        if type(m) in (GFLHead, MPHead) and isinstance(x, (list, tuple)):
            out = _int8_head_forward(m, x, scales)
            if out is not None:
                return out
        from glsdet_tpu.models.resnet import ResNet
        if (type(m) is ResNet and isinstance(x, jnp.ndarray)
                and x.ndim == 4):
            out = _int8_resnet_forward(m, x, scales)
            if out is not None:
                return out
        if type(m) in rewrite_kinds and _eligible(m, x, min_channels):
            s_in = scales.get(key + ".in")
            if s_in is not None:
                out = _quant_module_call(m, x, _conv_attrs(m), s_in,
                                         scales.get(key + ".out"))
                if out is not None:
                    return out
        elif _bare_conv_eligible(m, x):
            s_in = scales.get(key + ".in")
            if s_in is not None:
                out = _quant_bare_conv(m, x, s_in)
                if out is not None:
                    return out
        out = next_fun(*args, **kwargs)
        if (type(m) in boundary_kinds and isinstance(out, jnp.ndarray)):
            s_out = scales.get(key + ".out")
            if s_out is not None:
                out = _fq(out, s_out)
        return out

    return interceptor


@contextlib.contextmanager
def static_quant_inference(scales: Dict[str, float],
                           min_channels: int = 32):
    """Context manager: eligible conv modules applied (or traced) inside
    run the static-W8A8 path with int8-resident boundaries.  ``scales``
    comes from :func:`calibrate_scales` over the SAME apply fn (module
    paths must match).  Inference only."""
    with nn.intercept_methods(
            _make_static_interceptor(scales, min_channels)):
        yield


def wrap_apply_quant8_static(apply_fn: Callable[..., Any],
                             scales: Dict[str, float],
                             min_channels: int = 32) -> Callable[..., Any]:
    """Return ``apply_fn`` wrapped so its trace runs under
    :func:`static_quant_inference` (pipeline/facade plumbing helper)."""
    def wrapped(*args, **kwargs):
        with static_quant_inference(scales, min_channels):
            return apply_fn(*args, **kwargs)
    return wrapped
