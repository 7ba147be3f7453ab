"""BoIW (Bag-of-Instance-Words) dictionary as functional train state.

Behavioral reference: mp_head.py:78-81 (buffers), :184-201
(``_update_dictionary`` ring-buffer write of up to 10 randomly sampled
features per class per step), :480-499 (``update_ot`` — cosine k-means
over each class's dictionary -> sorted cluster-size probabilities as the
Sinkhorn target marginal).

The reference mutates registered buffers under ``torch.no_grad``; here the
dictionary is an explicit pytree threaded through the train step, updated
with pure ops, checkpointed with the rest of the state (orbax), and — in
the sharded setting — updated identically on every replica from
all-gathered features, the deterministic replacement for the reference's
rank-local mutation.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from glsdet_tpu.ops.topk import topk_small_k

from glsdet_tpu.ops.kmeans import cosine_kmeans


class BoIWState(NamedTuple):
    embedding: jnp.ndarray     # (num_classes+1, num_words, C)
    ptr: jnp.ndarray           # (num_classes+1,) int32 ring pointers
    proxies_prob: jnp.ndarray  # (P,) Sinkhorn target marginals
    beta: jnp.ndarray          # () float — 0 until epoch 2, then 1


def init_boiw(key: jax.Array, num_classes: int, num_words: int,
              feat_channels: int,
              proxies_list: Sequence[int]) -> BoIWState:
    emb = jax.random.normal(
        key, (num_classes + 1, num_words, feat_channels), jnp.float32)
    prob = jnp.concatenate(
        [jnp.full((n,), 1.0 / n, jnp.float32) for n in proxies_list])
    return BoIWState(
        embedding=emb,
        ptr=jnp.zeros((num_classes + 1,), jnp.int32),
        proxies_prob=prob,
        beta=jnp.zeros((), jnp.float32),
    )


def update_dictionary(state: BoIWState, key: jax.Array,
                      features: jnp.ndarray, labels: jnp.ndarray,
                      max_step: int = 10) -> BoIWState:
    """Ring-buffer write of up to ``max_step`` random features per class.

    features: (N, C); labels: (N,) in [0, num_classes] (num_classes = bg).
    Pure-functional equivalent of mp_head.py:184-201; the random subset is
    drawn with the PRNG key instead of python ``random.sample``.
    """
    num_slots, num_words, c = state.embedding.shape
    n = features.shape[0]
    max_step = min(max_step, n)

    # batched over classes: one (C, N) top-k + one scatter (the per-class
    # python/fori loop is a chain of sequential top-k dispatches).
    class_ids = jnp.arange(num_slots)[:, None]
    masks = labels[None, :] == class_ids                      # (C, N)
    cnt = jnp.sum(masks.astype(jnp.int32), axis=1)            # (C,)
    step = jnp.minimum(max_step, cnt)
    noise = jax.random.uniform(key, (num_slots, n))
    scores = noise + masks.astype(jnp.float32) * 10.0
    # bit-identical lax.top_k drop-in for small k (ops/topk.py):
    # 10 argmax passes instead of a full sort of the (C, N) rows
    _, idx = topk_small_k(scores, max_step)                   # (C, S)
    ranks = jnp.arange(max_step)[None, :]                     # (1, S)
    slots = (state.ptr[:, None] + ranks) % num_words          # (C, S)
    # ranks beyond each class's `step` write out-of-bounds -> dropped
    slots = jnp.where(ranks < step[:, None], slots, num_words)
    rows = jnp.repeat(jnp.arange(num_slots)[:, None], max_step, axis=1)
    emb = state.embedding.at[rows, slots].set(
        features[idx].astype(state.embedding.dtype), mode="drop")
    ptr = (state.ptr + step) % num_words
    return state._replace(embedding=emb, ptr=ptr.astype(jnp.int32))


def update_ot(state: BoIWState, key: jax.Array,
              proxies_list: Sequence[int],
              kmeans_iters: int = 20, restarts: int = 8) -> BoIWState:
    """Re-estimate the per-proxy Sinkhorn marginals (mp_head.py:480-499).

    For each foreground class: cosine k-means with k = its proxy count over
    the class's dictionary, cluster-size histogram -> sorted probabilities.
    """
    _, num_words, _ = state.embedding.shape
    probs = []
    for cls_id, k in enumerate(proxies_list):
        key, sub = jax.random.split(key)
        _, assign, _ = cosine_kmeans(
            sub, state.embedding[cls_id], k,
            num_iters=kmeans_iters, restarts=restarts)
        counts = jnp.sum(jax.nn.one_hot(assign, k, dtype=jnp.float32), axis=0)
        probs.append(jnp.sort(counts / num_words))
    return state._replace(proxies_prob=jnp.concatenate(probs))


def enable_emd_training(state: BoIWState) -> BoIWState:
    """Epoch-2 switch (optimal_transport_hook.py:25-29): beta 0 -> 1."""
    return state._replace(beta=jnp.ones((), jnp.float32))
