"""Cosine k-means on device.

The reference estimates per-proxy marginal probabilities by running nltk's
``KMeansClusterer`` (cosine distance, 25 restarts, avoid-empty-clusters)
over each class's BoIW dictionary on the CPU every 2000 iterations
(mp_head.py:480-499, optimal_transport_hook.py:31).  Here the same
computation is a jittable Lloyd iteration over L2-normalized vectors with
k-means++-style seeding per restart, so the OT schedule hook can run it on
the TPU without host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def _one_run(key, data_n, k, num_iters):
    n = data_n.shape[0]

    # k-means++ style seeding on cosine distance.
    def seed_body(i, state):
        key, centers = state
        key, sub = jax.random.split(key)
        sims = data_n @ centers.T  # (n, k); empty slots are zero rows
        filled = jnp.arange(k) < i
        d = 1.0 - jnp.max(jnp.where(filled[None, :], sims, -1.0), axis=1)
        probs = jnp.maximum(d, 1e-6)
        idx = jax.random.categorical(sub, jnp.log(probs))
        centers = centers.at[i].set(data_n[idx])
        return key, centers

    key, sub = jax.random.split(key)
    first = data_n[jax.random.randint(sub, (), 0, n)]
    centers0 = jnp.zeros((k, data_n.shape[1]), data_n.dtype).at[0].set(first)
    _, centers = jax.lax.fori_loop(1, k, seed_body, (key, centers0))
    return _lloyd_from(data_n, centers, k, num_iters)


def _lloyd_from(data_n, centers, k, num_iters):
    """Lloyd iterations from given (k, d) centers (no seeding)."""

    def lloyd(_, centers):
        sims = data_n @ centers.T
        assign = jnp.argmax(sims, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=data_n.dtype)
        counts = onehot.sum(axis=0)
        sums = onehot.T @ data_n
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0), centers)
        best_sim = jnp.max(sims, axis=1)
        worst = jnp.argmin(best_sim)
        new = jnp.where((counts[:, None] == 0), data_n[worst][None, :], new)
        return _normalize(new)

    centers = jax.lax.fori_loop(0, num_iters, lloyd, _normalize(centers))
    sims = data_n @ centers.T
    assign = jnp.argmax(sims, axis=1)
    inertia = jnp.sum(1.0 - jnp.max(sims, axis=1))
    return centers, assign, inertia


def cosine_kmeans(key: jax.Array, data: jnp.ndarray, k: int,
                  num_iters: int = 20, restarts: int = 8,
                  init_centers: jnp.ndarray | None = None):
    """Cluster rows of ``data`` into ``k`` groups by cosine distance.

    Returns (centers (k, d), assignments (n,), inertia scalar) of the best
    restart.  ``restarts`` mirrors the reference's ``repeats=25`` (kept
    smaller — each restart vmaps, and the downstream use only needs the
    cluster-size histogram).

    ``init_centers`` (k, d) runs ONE deterministic Lloyd pass from the
    given centers instead of seeded restarts — the analog of nltk's
    ``initial_means`` (which likewise forces ``repeats=1``); used for
    warm starts across OT-hook invocations and for parity testing.
    Note nltk's ``avoid_empty_clusters`` centroid is the damped mean
    ``(old + sum(cluster)) / (1 + n)``; its fixed points coincide with
    the plain Lloyd mean used here, so converged assignments agree even
    though trajectories differ.
    """
    data_n = _normalize(data.astype(jnp.float32))
    if init_centers is not None:
        return _lloyd_from(data_n, init_centers.astype(jnp.float32),
                           k, num_iters)
    keys = jax.random.split(key, restarts)
    centers, assigns, inertias = jax.vmap(
        lambda kk: _one_run(kk, data_n, k, num_iters))(keys)
    best = jnp.argmin(inertias)
    return centers[best], assigns[best], inertias[best]


def cluster_size_probs(assignments: jnp.ndarray, k: int,
                       num_points: int) -> jnp.ndarray:
    """Sorted cluster-occupancy probabilities.

    The reference's OT hook converts cluster sizes to sorted probabilities
    used as the Sinkhorn target marginal (mp_head.py:489-498).
    """
    counts = jnp.sum(
        jax.nn.one_hot(assignments, k, dtype=jnp.float32), axis=0)
    probs = counts / num_points
    return jnp.sort(probs)
