"""Exact small-k top-k as k masked argmax passes.

``jax.lax.top_k`` lowers to a full variadic sort of the trailing axis on
TPU; for the assignment-sized problems here (rows of ~8400 anchors,
k = 10) the sort costs ~1 ms per call while k reduce+mask passes cost
~0.4 ms for the pair (measured on v5e via the scalar-readback harness,
see CLAUDE.md benchmarks notes).  Semantics are bit-identical to
``lax.top_k`` including tie order (argmax returns the first maximum, and
``lax.top_k`` breaks ties by lower index first) — pinned by
tests/test_assign.py::test_topk_small_k_matches_lax.

Only use for small k: cost scales linearly with k (the NMS decode
prefilter with k=1000 stays on ``lax.top_k``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def topk_small_k(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (values, indices) of the k largest along the last axis.

    Drop-in for ``jax.lax.top_k(x, k)`` (descending values, ties by
    ascending index), implemented as k iterations of argmax + mask so it
    runs as cheap full-lane VPU reductions instead of a sort.
    """
    if k >= x.shape[-1]:
        return jax.lax.top_k(x, k)
    iota = jnp.arange(x.shape[-1])
    neg_inf = (jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating)
               else jnp.iinfo(x.dtype).min)

    def body(carry, _):
        idx = jnp.argmax(carry, axis=-1)
        val = jnp.take_along_axis(carry, idx[..., None], -1)[..., 0]
        nxt = jnp.where(iota == idx[..., None], neg_inf, carry)
        return nxt, (val, idx)

    _, (vals, idxs) = jax.lax.scan(body, x, None, length=k)
    return (jnp.moveaxis(vals, 0, -1),
            jnp.moveaxis(idxs, 0, -1).astype(jnp.int32))
