"""Shared NN building blocks (flax.linen, NHWC, bf16-friendly).

Behavioral reference: mmcv ``ConvModule`` (conv + norm + act) as used across
the GLSDet model zoo, and the YOLOX blocks in
``yolox-ufp/mmdet/models/backbones/csp_darknet.py`` /
``yolox-drone/models/base/darknet.py``.  All modules here are new JAX code,
laid out TPU-first:

- NHWC activations (XLA:TPU native conv layout), channels padded by the
  compiler to lane width; we keep channel counts as the reference does.
- Parameters live in float32; compute dtype is configurable (bfloat16 by
  default in training configs) so convs hit the MXU at full rate.
- BatchNorm uses flax's cross-replica ``axis_name`` support — the TPU-native
  replacement for the reference's ``SyncNormHook`` NCCL all-reduce
  (yolox-ufp/mmdet/core/hook/sync_norm_hook.py:34).
"""

from __future__ import annotations

import contextlib
import contextvars
import os
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_REMAT_DISABLED: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "glsdet_remat_disabled", default=False)


def remat_active(flag: bool) -> bool:
    """Whether a module's ``remat`` flag takes effect for this trace.
    Remat is a backward-pass memory optimization; forward-only tooling
    that needs values to cross module boundaries (e.g. int8 calibration
    recording, ops/quant_static.py) turns it off via
    :func:`disable_remat` — a no-op numerically."""
    return bool(flag) and not _REMAT_DISABLED.get()


@contextlib.contextmanager
def disable_remat():
    """Context manager: models traced inside skip their ``nn.remat``
    wrapping (must be active at *trace* time)."""
    tok = _REMAT_DISABLED.set(True)
    try:
        yield
    finally:
        _REMAT_DISABLED.reset(tok)


def remat_policy():
    """The ``jax.checkpoint`` rematerialization policy for this process.

    ``GLSDET_REMAT_POLICY`` selects what the checkpointed blocks SAVE
    instead of recomputing (default: nothing — classic full remat):

      - ``none``            save nothing (recompute everything)
      - ``dots``            ``dots_saveable`` — keep matmul/conv outputs,
                            recompute only the cheap elementwise chains
      - ``dots_no_batch``   ``dots_with_no_batch_dims_saveable``
      - ``offload_dots``    save matmul outputs to HOST memory
                            (``save_and_offload_only_these_names`` class
                            of policies; falls back to ``dots`` if the
                            offload policy is unavailable)

    A per-call knob would thread through every model field for what is
    a process-level tuning experiment; env scope matches how the bench
    sweeps it (scripts/bench_train.py).
    """
    name = os.environ.get("GLSDET_REMAT_POLICY", "none")
    if name in ("", "none"):
        return None
    import jax

    if name == "dots":
        return jax.checkpoint_policies.dots_saveable
    if name == "dots_no_batch":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "offload_dots":
        try:
            return jax.checkpoint_policies.offload_dot_with_no_batch_dims(
                "device", "pinned_host")
        except Exception:
            return jax.checkpoint_policies.dots_saveable
    raise ValueError(f"unknown GLSDET_REMAT_POLICY {name!r}")

# torch BN(momentum=0.03, eps=0.001) from yolox configs → flax momentum 0.97.
BN_MOMENTUM = 0.97
BN_EPS = 1e-3


def silu(x):
    return jax.nn.silu(x)


ACTIVATIONS: dict[str, Callable] = {
    "silu": silu,
    "swish": silu,
    "relu": jax.nn.relu,
    "lrelu": lambda x: jax.nn.leaky_relu(x, 0.1),
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
}


class ConvNormAct(nn.Module):
    """conv -> norm -> act, the mmcv ``ConvModule`` contract.

    norm: "bn" (cross-replica batch norm), "gn" (32 groups), or None.
    """

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    groups: int = 1
    norm: Optional[str] = "bn"
    act: Optional[str] = "silu"
    use_bias: Optional[bool] = None  # default: bias iff no norm
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None  # cross-replica BN axis (sync-BN analog)
    gn_groups: int = 32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bias = self.use_bias if self.use_bias is not None else self.norm is None
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"
            ),
            name="conv",
        )(x)
        if self.norm == "bn":
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                axis_name=self.axis_name if train else None,
                name="bn",
            )(x)
        elif self.norm == "gn":
            x = nn.GroupNorm(
                num_groups=min(self.gn_groups, self.out_channels),
                # torch nn.GroupNorm eps (mmcv ConvModule GN); the flax
                # default is 1e-6, a ~5e-6-relative transplant-parity gap
                epsilon=1e-5,
                dtype=self.dtype,
                name="gn",
            )(x)
        if self.act is not None:
            x = ACTIVATIONS[self.act](x)
        return x


class DWConvBlock(nn.Module):
    """Depthwise-separable conv: DW 3x3/kxk + PW 1x1, each with norm+act."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        x = ConvNormAct(
            in_ch,
            self.kernel_size,
            self.stride,
            groups=in_ch,
            act=self.act,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="dw",
        )(x, train=train)
        x = ConvNormAct(
            self.out_channels,
            1,
            1,
            act=self.act,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="pw",
        )(x, train=train)
        return x


class Focus(nn.Module):
    """Focus stem: space-to-depth (2x2 patches -> 4x channels) + conv.

    Matches the stem of csp_darknet.py:14 — on TPU the slice/concat lowers
    to a single reshape-transpose, and the following conv runs on the MXU.
    """

    out_channels: int
    kernel_size: int = 3
    act: str = "silu"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # NHWC space-to-depth. Order matches the reference's concat order
        # (top-left, bottom-left, top-right, bottom-right) so weights are
        # comparable channel-for-channel.
        tl = x[:, ::2, ::2, :]
        bl = x[:, 1::2, ::2, :]
        tr = x[:, ::2, 1::2, :]
        br = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return ConvNormAct(
            self.out_channels,
            self.kernel_size,
            1,
            act=self.act,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="conv",
        )(x, train=train)


class Bottleneck(nn.Module):
    """CSP bottleneck: 1x1 reduce -> 3x3 -> optional residual."""

    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        y = ConvNormAct(
            hidden, 1, 1, act=self.act, dtype=self.dtype,
            axis_name=self.axis_name, name="conv1",
        )(x, train=train)
        conv2 = (
            DWConvBlock(self.out_channels, 3, 1, act=self.act,
                        dtype=self.dtype, axis_name=self.axis_name,
                        name="conv2_dw")
            if self.depthwise
            else ConvNormAct(self.out_channels, 3, 1, act=self.act,
                             dtype=self.dtype, axis_name=self.axis_name,
                             name="conv2")
        )
        y = conv2(y, train=train)
        if self.shortcut and x.shape[-1] == self.out_channels:
            y = y + x
        return y


class CSPLayer(nn.Module):
    """Cross-stage-partial layer (C3): split -> n bottlenecks -> merge."""

    out_channels: int
    num_blocks: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        main = ConvNormAct(hidden, 1, 1, act=self.act, dtype=self.dtype,
                           axis_name=self.axis_name, name="main_conv")(
            x, train=train)
        short = ConvNormAct(hidden, 1, 1, act=self.act, dtype=self.dtype,
                            axis_name=self.axis_name, name="short_conv")(
            x, train=train)
        for i in range(self.num_blocks):
            main = Bottleneck(
                hidden,
                shortcut=self.shortcut,
                expansion=1.0,
                depthwise=self.depthwise,
                act=self.act,
                dtype=self.dtype,
                axis_name=self.axis_name,
                name=f"block{i}",
            )(main, train=train)
        x = jnp.concatenate([main, short], axis=-1)
        return ConvNormAct(self.out_channels, 1, 1, act=self.act,
                           dtype=self.dtype, axis_name=self.axis_name,
                           name="final_conv")(x, train=train)


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling (5/9/13 max-pool concat), csp_darknet.py:67."""

    out_channels: int
    pool_sizes: Sequence[int] = (5, 9, 13)
    act: str = "silu"
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvNormAct(hidden, 1, 1, act=self.act, dtype=self.dtype,
                        axis_name=self.axis_name, name="conv1")(x, train=train)
        pools = [x]
        for k in self.pool_sizes:
            pad = k // 2
            pools.append(
                nn.max_pool(
                    x, (k, k), strides=(1, 1),
                    padding=[(pad, pad), (pad, pad)],
                )
            )
        x = jnp.concatenate(pools, axis=-1)
        return ConvNormAct(self.out_channels, 1, 1, act=self.act,
                           dtype=self.dtype, axis_name=self.axis_name,
                           name="conv2")(x, train=train)


class Scale(nn.Module):
    """Learnable scalar multiplier (mmcv Scale), one per FPN level."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(self.init_value), ())
        return x * s.astype(x.dtype)


def upsample2x(x):
    """Nearest 2x upsample in NHWC — lowers to a cheap broadcast on TPU."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
