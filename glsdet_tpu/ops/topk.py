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

    Caveat: extracted positions are masked to the dtype minimum, so if
    the INPUT already contains values at the exact dtype minimum the
    tie order among those entries can differ from ``lax.top_k`` (all
    in-repo call sites — assignment costs, IoUs, ring-buffer scores —
    are bounded far above it).  NaN inputs are likewise NOT drop-in:
    ``jnp.max``/``argmax`` propagate NaN and order it differently from
    the TPU sort's total order, so only feed bounded finite values.
    """
    if k >= x.shape[-1]:
        return jax.lax.top_k(x, k)
    iota = jnp.arange(x.shape[-1])
    neg_inf = (jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating)
               else jnp.iinfo(x.dtype).min)

    def body(carry, _):
        idx = jnp.argmax(carry, axis=-1)
        val = jnp.max(carry, axis=-1)  # == carry[idx], without a gather
        nxt = jnp.where(iota == idx[..., None], neg_inf, carry)
        return nxt, (val, idx)

    _, (vals, idxs) = jax.lax.scan(body, x, None, length=k)
    return (jnp.moveaxis(vals, 0, -1),
            jnp.moveaxis(idxs, 0, -1).astype(jnp.int32))


def first_k_true(mask: jnp.ndarray, k: int):
    """Indices of the first k set bits along the last axis, plus a
    validity mask.

    Replaces the ``lax.top_k(mask.astype(f32), k)`` idiom for selecting
    up to k elements by a boolean predicate: on 0/1 scores top_k's
    stable tie order returns exactly the first k set bits ascending, but
    pays a full sort of the axis. One cumsum + scatter is O(N).

    Returns ``(idx (..., k) int32, valid (..., k) bool)`` where
    ``idx[..., j]`` for ``valid`` slots equals the ``lax.top_k`` result
    bit-for-bit; invalid slots hold an unspecified index and MUST be
    masked with ``valid`` (top_k instead returns ascending indices of
    zero entries there — callers that re-gathered the mask to build
    their own validity get the identical mask from ``valid``).
    """
    n = mask.shape[-1]
    batch_shape = mask.shape[:-1]
    flat = mask.reshape(-1, n)

    # index of the (j+1)-th set bit == searchsorted(cumsum, j+1): k
    # binary searches (k·log n gathers) — a scatter formulation measured
    # 3x SLOWER than the top_k sort on TPU (serialized scatter unit);
    # this one is ~2.2x faster than the sort
    def one(m):
        cs = jnp.cumsum(m.astype(jnp.int32), -1)
        idx = jnp.searchsorted(cs, jnp.arange(1, k + 1), side="left")
        return (jnp.minimum(idx, n - 1).astype(jnp.int32),
                jnp.arange(k) < cs[-1])

    idx, valid = jax.vmap(one)(flat)
    return (idx.reshape(*batch_shape, k),
            valid.reshape(*batch_shape, k))
