"""Serving-time fused-bottleneck rewrite (flax method interceptor).

Pairs with ``ops/pallas_bottleneck.py``: every *identity* ResNet
``Bottleneck`` (stride 1, in == out channels — 12 of 16 blocks in
ResNet-50) applied inside the ``fused_bottleneck_inference()`` context
runs as ONE pallas kernel that keeps the 1x1 -> 3x3 -> 1x1 -> +residual
chain VMEM-resident, instead of XLA's three HBM-round-tripping convs.
The backbone is the MP-Det forward's bandwidth bound
(docs/ARCHITECTURE.md roofline), so this targets the serving hot path
directly.

BN folding happens inline at trace time: the interceptor reads the
block's child conv kernels and BN params/stats from the bound module's
variables and folds them into per-conv (kernel, bias) pairs — the same
math as ``models/fuse.py``, but without rewriting the checkpoint, so
the rewrite composes with plain (unfused) variables.  Projection blocks
(stride 2 / channel change), training mode, and BasicBlock depths fall
through to the stock flax path untouched.

Like ``ops/quant.py`` this is applied through ``nn.intercept_methods``
so the whole model zoo gets it without touching model code.  Inference
only (the kernel has no VJP).  Reference analog: none — cuDNN does this
scheduling for the reference; on TPU it is ours to write.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from glsdet_tpu.models.layers import BN_EPS

__all__ = ["fused_bottleneck_inference", "wrap_apply_fused"]


def _fold(params: dict, stats: dict, name: str):
    """conv+BN of child block ``name`` -> (folded kernel, bias) in f32."""
    kernel = params[name]["conv"]["kernel"].astype(jnp.float32)
    bn_p = params[name]["bn"]
    bn_s = stats[name]["bn"]
    s = (bn_p["scale"].astype(jnp.float32)
         / jnp.sqrt(bn_s["var"].astype(jnp.float32) + BN_EPS))
    return kernel * s, (bn_p["bias"].astype(jnp.float32)
                        - bn_s["mean"].astype(jnp.float32) * s)


def _interceptor(next_fun, args, kwargs, context):
    from glsdet_tpu.models.resnet import Bottleneck
    from glsdet_tpu.ops.pallas_bottleneck import fused_bottleneck

    m = context.module
    if (type(m) is not Bottleneck or context.method_name != "__call__"
            or kwargs.get("train", False) or not args):
        return next_fun(*args, **kwargs)
    x = args[0]
    cin = m.channels * 4
    if (not isinstance(x, jnp.ndarray) or x.ndim != 4
            or m.stride != 1 or x.shape[-1] != cin):
        return next_fun(*args, **kwargs)
    if x.shape[1] % 2 or x.shape[2] < 8:
        # band tiling wants an even H; tiny W has nothing to gain
        return next_fun(*args, **kwargs)
    v = m.variables
    params = v.get("params", {})
    stats = v.get("batch_stats", {})
    try:
        w1, b1 = _fold(params, stats, "conv1")
        w2, b2 = _fold(params, stats, "conv2")
        w3, b3 = _fold(params, stats, "conv3")
    except (KeyError, TypeError):
        return next_fun(*args, **kwargs)
    band_cap = 4 if cin >= 2048 else 8
    return fused_bottleneck(
        x, w1.reshape(cin, m.channels), b1, w2, b2,
        w3.reshape(m.channels, cin), b3, band_cap=band_cap,
        # Mosaic-compiled on TPU; interpreter elsewhere (CPU tests).
        interpret=jax.default_backend() != "tpu")


@contextlib.contextmanager
def fused_bottleneck_inference():
    """Context manager: identity Bottlenecks applied (or traced) inside
    run as the fused pallas kernel.  Must be active while the forward is
    *traced*; never enable for training or ``init``."""
    with nn.intercept_methods(_interceptor):
        yield


def wrap_apply_fused(apply_fn: Callable[..., Any]) -> Callable[..., Any]:
    """Return ``apply_fn`` wrapped so its trace runs under
    ``fused_bottleneck_inference`` (pipeline/facade plumbing helper)."""
    def wrapped(*args, **kwargs):
        with fused_bottleneck_inference():
            return apply_fn(*args, **kwargs)
    return wrapped
