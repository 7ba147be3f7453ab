"""Sinkhorn optimal transport as a jittable fixed-point loop.

Reproduces the numerics of the reference MPHead's ``sink`` routine
(yolox-ufp/mmdet/models/dense_heads/mp_head.py:156): uniform source
marginal, optional target marginal, ``K = exp(-M / reg)``, alternating
scaling updates with an L1 convergence check, capped iterations.  Here the
loop is a ``lax.while_loop`` so it compiles into the training step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sinkhorn(cost: jnp.ndarray,
             target_marginal: jnp.ndarray | None = None,
             reg: float = 0.1,
             num_iters: int = 100,
             stop_thr: float = 1e-8,
             row_mask: jnp.ndarray | None = None,
             differentiable: bool = False) -> jnp.ndarray:
    """Entropy-regularized OT plan between uniform rows and given columns.

    Args:
        cost: (N, M) cost matrix.
        target_marginal: (M,) column marginal; uniform if None.
        row_mask: optional (N,) bool — masked-out rows get zero marginal
            mass, which lets callers pad the feature set to a fixed N
            (padding rows then receive a zero transport plan).
        differentiable: run the fixed ``num_iters`` scaling updates as a
            reverse-differentiable ``lax.scan`` (no early-stop check)
            instead of the ``lax.while_loop``.  The reference's torch
            loop (mp_head.py:156-182) backprops through the scaling
            iterations, and that loop gradient is NOT the envelope
            gradient: d<P*(C), C>/dC = P* + <dP*/dC, C>, where the
            second term is ~30% of the first on small fixtures
            (tests/test_sinkhorn_grad.py pins this against central
            finite differences).  Forward values agree with the
            while_loop to the convergence threshold; use this from
            losses, the while_loop elsewhere.

    Returns:
        (N, M) transport plan ``diag(alpha) K diag(beta)``.
    """
    n, m = cost.shape
    if row_mask is None:
        us = jnp.full((n, 1), 1.0 / n, dtype=cost.dtype)
    else:
        cnt = jnp.maximum(jnp.sum(row_mask), 1)
        us = (row_mask.astype(cost.dtype) / cnt)[:, None]
    if target_marginal is None:
        ut = jnp.full((m, 1), 1.0 / m, dtype=cost.dtype)
    else:
        ut = target_marginal.reshape(m, 1).astype(cost.dtype)

    kmat = jnp.exp(-cost / reg)
    if row_mask is not None:
        kmat = kmat * row_mask[:, None].astype(cost.dtype)

    eps = jnp.asarray(1e-16, cost.dtype)
    alpha0 = jnp.ones((n, 1), dtype=cost.dtype)
    beta0 = jnp.ones((m, 1), dtype=cost.dtype)

    if differentiable:
        def scan_body(carry, _):
            alpha, beta = carry
            alpha = us / jnp.maximum(kmat @ beta, eps)
            beta = ut / jnp.maximum(kmat.T @ alpha, eps)
            return (alpha, beta), None

        (alpha, beta), _ = jax.lax.scan(
            scan_body, (alpha0, beta0), None, length=num_iters)
        return alpha * kmat * beta.T

    def cond(state):
        it, err, _, _ = state
        return (it < num_iters) & (err >= stop_thr)

    def body(state):
        it, _, alpha, beta = state
        new_alpha = us / jnp.maximum(kmat @ beta, eps)
        new_beta = ut / jnp.maximum(kmat.T @ new_alpha, eps)
        err = jnp.mean(jnp.sum(jnp.abs(alpha - new_alpha), axis=-1))
        return it + 1, err, new_alpha, new_beta

    _, _, alpha, beta = jax.lax.while_loop(
        cond, body, (jnp.array(0), jnp.asarray(jnp.inf, cost.dtype),
                     alpha0, beta0))
    return alpha * kmat * beta.T
