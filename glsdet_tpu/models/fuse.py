"""Conv+BN folding for inference (mmdet ``--fuse-conv-bn`` analog).

Behavioral reference: ``yolox-ufp/tools/test.py`` exposes
``--fuse-conv-bn`` ("fuse conv and bn, this will slightly increase the
inference speed"); mmcv's ``fuse_conv_bn`` rewrites each Conv->BN pair
into a single biased conv.

TPU-native form: a pure function over the variables pytree.  Every
scope holding sibling ``conv`` params and ``bn`` params/stats (the
``ConvNormAct`` / ResNet block contract, models/layers.py:47) is folded:

    s        = bn.scale / sqrt(var + eps)
    kernel'  = kernel * s            (per output channel)
    bn'      = identity-normalization with bias (bias - mean*s)

The BN module stays in the graph (flax param structure is fixed at init)
but degenerates to a single bias add, which XLA fuses into the conv —
inference outputs are mathematically identical.  Under jit this is a
wash (XLA folds inference BN anyway); the transform exists for CLI
parity and for exported StableHLO graphs consumed outside XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

from glsdet_tpu.models.layers import BN_EPS


def _fold(params_node: dict, stats_node: dict, eps: float) -> int:
    """Recursively fold conv+bn pairs in-place; returns #pairs fused."""
    fused = 0
    for key, child in list(params_node.items()):
        if not isinstance(child, dict):
            continue
        stats_child = stats_node.get(key) if isinstance(stats_node, dict) \
            else None
        if (key == "bn" and "scale" in child and stats_child
                and "mean" in stats_child and "conv" in params_node
                and "kernel" in params_node["conv"]):
            kernel = params_node["conv"]["kernel"]
            scale, bias = child["scale"], child["bias"]
            mean, var = stats_child["mean"], stats_child["var"]
            s = (scale / jnp.sqrt(var + eps)).astype(kernel.dtype)
            params_node["conv"]["kernel"] = kernel * s
            child["scale"] = jnp.ones_like(scale)
            child["bias"] = (bias - mean * (scale
                                            / jnp.sqrt(var + eps)))
            stats_child["mean"] = jnp.zeros_like(mean)
            stats_child["var"] = jnp.full_like(var, 1.0 - eps)
            fused += 1
        elif isinstance(child, dict):
            fused += _fold(child, stats_child or {}, eps)
    return fused


def fuse_conv_bn(variables: dict, eps: float = BN_EPS):
    """Fold every conv+bn pair; returns (new variables, #pairs fused).

    ``variables``: {"params": ..., "batch_stats": ...} as produced by
    ``model.init``/training.  Inference outputs are identical (up to
    float association); training must NOT resume from fused variables.
    """
    def mutable_copy(node):
        if isinstance(node, dict):
            return {k: mutable_copy(v) for k, v in node.items()}
        return node  # leaves (arrays) are replaced, never mutated

    out = {
        "params": mutable_copy(dict(variables["params"])),
        "batch_stats": mutable_copy(dict(variables.get("batch_stats", {}))),
    }
    n = _fold(out["params"], out["batch_stats"], eps)
    return out, n
