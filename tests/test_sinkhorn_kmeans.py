"""Sinkhorn fixed points and cosine k-means sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from glsdet_tpu.ops.sinkhorn import sinkhorn
from glsdet_tpu.ops.kmeans import cosine_kmeans, cluster_size_probs


def np_sink(M, ut=None, reg=0.1, num_iters=100, stop_thr=1e-8):
    """Numpy oracle with the reference's update order (mp_head.py:156-182)."""
    n, m = M.shape
    us = np.full((n, 1), 1.0 / n)
    ut = np.full((m, 1), 1.0 / m) if ut is None else ut.reshape(m, 1)
    alpha, beta = np.ones((n, 1)), np.ones((m, 1))
    K = np.exp(-M / reg)
    for _ in range(num_iters):
        alpha_bak = alpha
        alpha = us / (K @ beta)
        beta = ut / (K.T @ alpha)
        if np.abs(alpha_bak - alpha).sum(-1).mean() < stop_thr:
            break
    return alpha * K * beta.T


def test_sinkhorn_matches_reference_numerics():
    rng = np.random.RandomState(0)
    M = rng.uniform(0, 1, (12, 5)).astype(np.float32)
    got = np.asarray(sinkhorn(jnp.asarray(M), reg=0.1))
    want = np_sink(M.astype(np.float64), reg=0.1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)


def test_sinkhorn_marginals():
    rng = np.random.RandomState(1)
    M = jnp.asarray(rng.uniform(0, 1, (20, 4)).astype(np.float32))
    ut = jnp.asarray([0.1, 0.2, 0.3, 0.4], jnp.float32)
    P = np.asarray(sinkhorn(M, target_marginal=ut, reg=0.1, num_iters=500))
    np.testing.assert_allclose(P.sum(axis=1), np.full(20, 1 / 20), atol=1e-4)
    np.testing.assert_allclose(P.sum(axis=0), np.asarray(ut), atol=1e-4)


def test_sinkhorn_row_mask_pads_to_zero():
    rng = np.random.RandomState(2)
    M = rng.uniform(0, 1, (10, 3)).astype(np.float32)
    mask = np.array([True] * 6 + [False] * 4)
    P = np.asarray(sinkhorn(jnp.asarray(M), row_mask=jnp.asarray(mask), num_iters=300))
    assert np.all(P[6:] < 1e-6)
    P_dense = np.asarray(sinkhorn(jnp.asarray(M[:6]), num_iters=300))
    np.testing.assert_allclose(P[:6], P_dense, atol=1e-4)


def test_cosine_kmeans_separates_clusters():
    rng = np.random.RandomState(3)
    a = rng.normal(0, 0.05, (30, 8)) + np.eye(8)[0]
    b = rng.normal(0, 0.05, (30, 8)) + np.eye(8)[3]
    data = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    _, assign, _ = cosine_kmeans(jax.random.PRNGKey(0), data, 2, restarts=4)
    assign = np.asarray(assign)
    assert len(set(assign[:30])) == 1 and len(set(assign[30:])) == 1
    assert assign[0] != assign[30]


def test_cluster_size_probs_sorted_and_normalized():
    assign = jnp.asarray([0, 0, 0, 1, 1, 2])
    probs = np.asarray(cluster_size_probs(assign, 3, 6))
    np.testing.assert_allclose(probs, [1 / 6, 2 / 6, 3 / 6], atol=1e-6)
