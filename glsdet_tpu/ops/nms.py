"""Fixed-shape greedy NMS for XLA:TPU.

The reference uses three NMS implementations (mmcv CUDA ``batched_nms``,
``torchvision.ops.boxes.batched_nms`` at yolox-drone/merge_results.py:153,
and a pure-python loop at yolox-ufp/ufpmp_det_eval.py:149).  All are
greedy class-wise NMS; this module reproduces those semantics as a single
fixed-shape XLA program:

1. sort candidates by score (descending) once,
2. precompute the dense IoU matrix (one big batched op),
3. run an O(K) ``lax.fori_loop`` of cheap vector steps that walks the
   sorted order maintaining a keep mask — the only sequential part.

Padding rows carry ``score = -inf`` and are never kept.  Class-wise
behavior uses the coordinate-offset trick: each class's boxes are
translated to a disjoint region so a single NMS pass is class-wise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from glsdet_tpu.ops.boxes import pairwise_iou

NEG_INF = -1e9


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        offset: float = 0.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over a fixed-size candidate set (fixpoint iteration).

    Exact greedy semantics, computed without a K-step sequential walk:
    greedy NMS is the unique solution of

        keep[j] = valid[j] and no kept higher-ranked i overlaps j

    which this evaluates by fixpoint iteration — start from
    ``keep = valid`` and repeat the full-vector update

        keep <- valid & ~any_i(keep[i] & i<j & iou[i,j] > thr)

    until nothing changes.  Each pass is one masked (K, K) reduction on
    the VPU; the kept prefix of the suppression-dependency chain grows
    by at least one level per pass, so the loop runs depth(chain) + 1
    times (a handful in practice) instead of K scalar steps — on TPU
    this is 20-50x faster than the sequential ``fori_loop``/Pallas walk
    for K in the hundreds-to-thousands this framework uses.

    Args:
        boxes: (K, 4) xyxy.
        scores: (K,).  Padding rows should have ``-inf`` (any kept-mask
            consumers must also check score validity).
        iou_threshold: suppress j if IoU(i, j) > threshold for a kept,
            higher-scoring i.  Strictly-greater comparison matches the
            reference (``ovr <= thresh`` survives, ufpmp_det_eval.py:175).
        offset: 1.0 reproduces the legacy +1 pixel-area convention of the
            reference's python NMS; 0.0 matches torchvision/mmcv.

    Returns:
        keep: (K,) bool mask over the *input* order.
        order: (K,) indices sorting scores descending (for ranked output).
    """
    k = scores.shape[0]
    order = jnp.argsort(-scores)
    # f32 IoU regardless of input dtype — keeps this path bit-identical
    # to ``nms_tiled`` (which upcasts for its tile math) for bf16 boxes
    sorted_boxes = boxes[order].astype(jnp.float32)
    valid = scores[order] > NEG_INF / 2

    iou_mat = pairwise_iou(sorted_boxes, sorted_boxes, offset=offset)
    earlier = jnp.arange(k)[:, None] < jnp.arange(k)[None, :]  # i < j
    suppressor = (iou_mat > iou_threshold) & earlier           # (i, j)

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < k)

    def body(state):
        keep, _, it = state
        new = valid & ~jnp.any(keep[:, None] & suppressor, axis=0)
        return new, keep, it + 1

    keep_sorted, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.int32(0)))
    # Scatter back to input order.
    keep = jnp.zeros((k,), dtype=bool).at[order].set(keep_sorted)
    return keep, order


def nms_tiled(boxes: jnp.ndarray, scores: jnp.ndarray,
              iou_threshold: float, offset: float = 0.0,
              tile: int = 256) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS as a scan over score-sorted tiles.

    The fixpoint iteration in :func:`nms` re-reads the full (K, K)
    suppressor every pass, so its cost is K^2 x chain-depth.  Greedy
    suppression only flows from higher to lower scores, so candidates
    can instead be finalized a TILE at a time in sorted order:

      for each tile t (size T, descending scores):
        1. mask candidates already suppressed by earlier tiles,
        2. fixpoint WITHIN the (T, T) tile (depth is the tile's own
           chain depth — cheap),
        3. propagate: mark every later candidate overlapped by a kept
           member of this tile as suppressed (one (T, K) pass, touched
           exactly once per tile).

    Work: K^2 one-off propagation + T^2 x depth per tile, vs
    K^2 x global-depth for the fixpoint — ~an order of magnitude less
    VPU work at K ~ 2000 (the stage-2 serving budget, where NMS is
    ~0.4 ms/img of the mosaic program).  Output is bit-identical to
    :func:`nms` (same greedy solution; pinned by tests/test_nms.py).
    The scan has a static trip count, so under vmap each tile's inner
    while_loop lock-steps at the BATCH max of the tile's chain depth
    instead of the global chain depth.

    Returns: as :func:`nms` — (keep mask over input order, descending
    score order).
    """
    k = scores.shape[0]
    pad = (-k) % tile
    kp = k + pad
    nt = kp // tile

    order = jnp.argsort(-scores)
    sb = boxes[order].astype(jnp.float32)
    valid = scores[order] > NEG_INF / 2
    if pad:
        sb = jnp.concatenate([sb, jnp.zeros((pad, 4), sb.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    tri = jnp.arange(tile)[:, None] < jnp.arange(tile)[None, :]
    pos = jnp.arange(kp)

    def step(suppressed, t):
        tb = jax.lax.dynamic_slice(sb, (t * tile, 0), (tile, 4))
        cand = (jax.lax.dynamic_slice(valid, (t * tile,), (tile,))
                & ~jax.lax.dynamic_slice(suppressed, (t * tile,), (tile,)))
        sup_tt = (pairwise_iou(tb, tb, offset=offset)
                  > iou_threshold) & tri
        def cond(state):
            keep, prev, it = state
            return jnp.any(keep != prev) & (it < tile)
        def body(state):
            keep, _, it = state
            new = cand & ~jnp.any(keep[:, None] & sup_tt, axis=0)
            return new, keep, it + 1
        keep_t, _, _ = jax.lax.while_loop(
            cond, body, (cand, jnp.zeros_like(cand), jnp.int32(0)))
        # one-off forward propagation to strictly later candidates
        hit = jnp.any(
            keep_t[:, None] & (pairwise_iou(tb, sb, offset=offset)
                               > iou_threshold), axis=0)
        later = pos >= (t + 1) * tile
        return suppressed | (hit & later), keep_t

    suppressed, keeps = jax.lax.scan(
        step, jnp.zeros((kp,), bool), jnp.arange(nt))
    keep_sorted = keeps.reshape(kp)[:k]
    keep = jnp.zeros((k,), dtype=bool).at[order].set(keep_sorted)
    return keep, order


def tiled_nms_tile() -> int:
    """Tile size for the opt-in tile-scanned NMS in :func:`batched_nms`
    (0 = disabled, the default).  GLSDET_TILED_NMS=1 selects 256;
    any other positive integer is used as the tile directly.  Exactness
    is pinned by tests/test_nms.py; whether it beats the fixpoint
    depends on K and the suppression-chain depth, so it stays opt-in
    until measured ahead on the serving shapes.

    Trace-time knob (same convention as GLSDET_PALLAS_NMS): it is read
    when ``batched_nms`` TRACES, so it must be set before the first
    jit/compile — and before the persistent compile cache is populated;
    flipping it mid-process has no effect on already-compiled programs.
    Negative or unparsable values warn and disable rather than error.
    """
    import os
    import warnings

    v = os.environ.get("GLSDET_TILED_NMS", "0").strip()
    try:
        t = int(v or "0")
    except ValueError:
        warnings.warn(f"GLSDET_TILED_NMS={v!r} is not an integer; "
                      "tiled NMS disabled")
        return 0
    if t < 0:
        warnings.warn(f"GLSDET_TILED_NMS={t} is negative; tiled NMS "
                      "disabled")
        return 0
    return 256 if t == 1 else t


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                class_ids: jnp.ndarray, iou_threshold: float,
                offset: float = 0.0,
                coord_bound: float = 8192.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Class-wise greedy NMS via the coordinate-offset trick.

    Matches torchvision ``batched_nms`` semantics (merge_results.py:153)
    and mmcv ``batched_nms`` with ``class_agnostic=False``.

    Args:
        boxes: (K, 4); scores: (K,); class_ids: (K,) int.
        coord_bound: any value larger than the max image dimension.

    Returns:
        (keep mask over input order, descending-score order indices).
    """
    offsets = class_ids.astype(boxes.dtype)[:, None] * coord_bound
    shifted = boxes + offsets
    # Default path is the vectorized fixpoint iteration in ``nms`` (a few
    # (K, K) VPU passes).  The fused Pallas kernel (K *sequential* VMEM
    # steps) is available via GLSDET_PALLAS_NMS=1; it wins only for very
    # large K where the K x K IoU matrix would blow HBM traffic.  The
    # tile-scanned exact variant (``nms_tiled``, ~T^2-per-tile fixpoint
    # work instead of K^2 per pass) is opt-in via GLSDET_TILED_NMS=<tile>
    # (=1 selects the default tile of 256).
    from glsdet_tpu.ops.pallas_nms import nms_pallas, use_pallas_nms

    if use_pallas_nms():
        return nms_pallas(shifted, scores, iou_threshold, offset=offset)
    tile = tiled_nms_tile()
    if tile and scores.shape[0] > tile:
        return nms_tiled(shifted, scores, iou_threshold, offset=offset,
                         tile=tile)
    return nms(shifted, scores, iou_threshold, offset=offset)


def soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_threshold: float = 0.3, sigma: float = 0.5,
             score_threshold: float = 0.001,
             method: str = "gaussian") -> jnp.ndarray:
    """Soft-NMS (gaussian / linear), the alternative offered by the
    reference fusion script (yolox-drone/merge_results.py:41 ``py_cpu_softnms``).

    Returns re-weighted scores (same order as input); the caller filters by
    ``score_threshold``.
    """
    k = scores.shape[0]
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]
    sorted_scores = scores[order]
    iou_mat = pairwise_iou(sorted_boxes, sorted_boxes)

    def body(i, s):
        # The current highest remaining is taken greedily in sorted order;
        # decay all later boxes by their overlap with it.
        ious = iou_mat[i]
        if method == "gaussian":
            decay = jnp.exp(-(ious ** 2) / sigma)
        else:
            decay = jnp.where(ious > iou_threshold, 1.0 - ious, 1.0)
        later = jnp.arange(k) > i
        alive = s[i] >= score_threshold
        factor = jnp.where(later & alive, decay, 1.0)
        return s * factor

    new_sorted = jax.lax.fori_loop(0, k, body, sorted_scores)
    return jnp.zeros_like(scores).at[order].set(new_sorted)


def multiclass_nms(mlvl_boxes: jnp.ndarray, mlvl_scores: jnp.ndarray,
                   score_thr: float, iou_threshold: float,
                   max_per_img: int) -> tuple[jnp.ndarray, jnp.ndarray,
                                              jnp.ndarray, jnp.ndarray]:
    """mmdet ``multiclass_nms`` analog (mmdet/core/post_processing/bbox_nms.py:8)
    with fixed output size.

    Args:
        mlvl_boxes: (N, 4) shared boxes per anchor.
        mlvl_scores: (N, C) per-class scores (sigmoid, no bg column).

    Returns:
        (max_per_img, 4) boxes, (max_per_img,) scores, (max_per_img,)
        labels, (max_per_img,) validity mask.  Ranked by score descending.
    """
    n, c = mlvl_scores.shape
    scores2d = jnp.where(mlvl_scores > score_thr, mlvl_scores, NEG_INF)
    budget = min(n * c, 4 * max_per_img if max_per_img > 0 else n * c)

    # Anchor prefilter: any (anchor, class) pair in the global top-K
    # has an anchor whose max class score is >= that pair's score, so
    # the top-K anchors by max score contain every top-K pair — taking
    # top-K anchors first is EXACTLY equivalent to top-K over all N*C
    # pairs, and shrinks the expensive top_k from N*C rows to N
    # (84k -> 8.4k for the 640^2 YOLOX decode).
    if n > budget:
        a_idx = jax.lax.top_k(scores2d.max(axis=1), budget)[1]
        scores2d = scores2d[a_idx]
        mlvl_boxes = mlvl_boxes[a_idx]
        n = budget

    boxes = jnp.repeat(mlvl_boxes, c, axis=0)            # (n*C, 4)
    scores = scores2d.reshape(-1)                        # (n*C,)
    labels = jnp.tile(jnp.arange(c), (n,))               # (n*C,)

    # Cap candidates to a fixed budget before the O(K^2) IoU matrix.
    top_scores, top_idx = jax.lax.top_k(scores, budget)
    top_boxes = boxes[top_idx]
    top_labels = labels[top_idx]

    keep, _ = batched_nms(top_boxes, top_scores, top_labels, iou_threshold)
    kept_scores = jnp.where(keep, top_scores, NEG_INF)
    out_scores, out_idx = jax.lax.top_k(kept_scores, max_per_img)
    out_boxes = top_boxes[out_idx]
    out_labels = top_labels[out_idx]
    valid = out_scores > NEG_INF / 2
    out_scores = jnp.where(valid, out_scores, 0.0)
    return out_boxes, out_scores, out_labels, valid


def multiclass_nms_batched(boxes: jnp.ndarray, scores: jnp.ndarray,
                           score_thr: float, iou_threshold: float,
                           max_per_img: int,
                           small_budget: int = 512):
    """Batched ``multiclass_nms`` with an adaptive candidate ladder.

    ``multiclass_nms``'s cost is quadratic in its candidate budget
    (4 * max_per_img): at max_per_img=500 the (2000, 2000) IoU/suppressor
    matrices dominate the whole decode+NMS stage (~0.4 ms/img at b128 on
    v5e) even when almost every row is ``-inf`` padding.  This wrapper
    counts the above-threshold candidates per image, takes the batch
    max (a scalar), and ``lax.cond``-dispatches between the full-budget
    NMS and an output-identical small-K NMS over the top
    ``small_budget`` rows.  The small path is EXACT whenever every
    image's real candidate count fits it: the top-K prefix then
    contains all real candidates, dead (-inf) rows can never be kept,
    and jnp's stable sort gives the prefix the same relative order —
    so kept set, scores and ranking match the full path bit-for-bit
    (pinned by tests/test_nms.py).

    The predicate is a batch-level scalar, NOT per-image, so the cond
    stays a real branch under jit (a vmapped per-image cond would lower
    to lax.select and execute BOTH branches).

    GLSDET_NMS_LADDER=0 disables the ladder (always the full-budget
    path, no cond) — a trace-time knob like GLSDET_TILED_NMS: set it
    before the first compile / compile-cache population.

    Args/returns: as ``multiclass_nms`` with a leading batch dim.
    """
    import os
    if os.environ.get("GLSDET_NMS_LADDER", "1").strip() == "0":
        small_budget = 0
    b, n, c = scores.shape
    budget = min(n * c, 4 * max_per_img if max_per_img > 0 else n * c)
    # the small tier must still hold max_per_img outputs
    small = (0 if small_budget <= 0
             else min(max(small_budget, max_per_img), budget))

    def prep(bx, sc):
        scores2d = jnp.where(sc > score_thr, sc, NEG_INF)
        nb = n
        if nb > budget:
            a_idx = jax.lax.top_k(scores2d.max(axis=1), budget)[1]
            scores2d = scores2d[a_idx]
            bx = bx[a_idx]
            nb = budget
        flat_boxes = jnp.repeat(bx, c, axis=0)
        flat_scores = scores2d.reshape(-1)
        flat_labels = jnp.tile(jnp.arange(c), (nb,))
        top_scores, top_idx = jax.lax.top_k(flat_scores, budget)
        return flat_boxes[top_idx], top_scores, flat_labels[top_idx]

    top_boxes, top_scores, top_labels = jax.vmap(prep)(boxes, scores)

    def tail(keep, sc, bx, lb):
        kept = jnp.where(keep, sc, NEG_INF)
        out_s, oi = jax.lax.top_k(kept, max_per_img)
        valid = out_s > NEG_INF / 2
        return (bx[oi], jnp.where(valid, out_s, 0.0), lb[oi], valid)

    def run(k):
        def one(bx, sc, lb):
            keep, _ = batched_nms(bx[:k], sc[:k], lb[:k], iou_threshold)
            return tail(keep, sc[:k], bx[:k], lb[:k])
        return jax.vmap(one)(top_boxes, top_scores, top_labels)

    if small <= 0 or small >= budget:
        return run(budget)
    n_real = jnp.sum(top_scores > NEG_INF / 2, axis=1).max()
    return jax.lax.cond(n_real <= small,
                        lambda: run(small), lambda: run(budget))


def diou_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_threshold: float = 0.7) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DIoU-NMS (yolox-drone/models/core/utils_bbox.py:309
    ``diou_box_nms``): suppression criterion is IoU minus the normalized
    center-distance penalty, keeping far-apart overlapping boxes."""
    k = scores.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    valid = scores[order] > NEG_INF / 2
    iou_mat = pairwise_iou(b, b)
    cx = (b[:, 0] + b[:, 2]) / 2
    cy = (b[:, 1] + b[:, 3]) / 2
    d2 = (cx[:, None] - cx[None, :]) ** 2 + (cy[:, None] - cy[None, :]) ** 2
    ex1 = jnp.minimum(b[:, None, 0], b[None, :, 0])
    ey1 = jnp.minimum(b[:, None, 1], b[None, :, 1])
    ex2 = jnp.maximum(b[:, None, 2], b[None, :, 2])
    ey2 = jnp.maximum(b[:, None, 3], b[None, :, 3])
    c2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
    diou = iou_mat - d2 / jnp.maximum(c2, 1e-9)

    def body(i, keep):
        alive_i = keep[i]
        suppress = (diou[i] > iou_threshold) & alive_i
        suppress = suppress.at[i].set(False)
        later = jnp.arange(k) > i
        return keep & ~(suppress & later)

    keep_sorted = jax.lax.fori_loop(0, k, body, valid)
    keep = jnp.zeros((k,), dtype=bool).at[order].set(keep_sorted)
    return keep, order


def nms_match(boxes: jnp.ndarray, scores: jnp.ndarray,
              iou_threshold: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """mmcv ``nms_match`` semantics as a fixed-shape XLA op.

    Greedy NMS, but instead of discarding suppressed boxes each one is
    assigned to the kept box that suppressed it (the highest-scoring
    kept box with IoU > threshold) — mmcv returns a list of index
    groups; here the same information is a fixed-shape mapping.

    Returns:
        keep: (K,) bool — group leaders (greedy-NMS survivors).
        group: (K,) int32 — for every box, the input index of its group
            leader (leaders map to themselves; padding rows with
            ``score <= NEG_INF/2`` map to -1).
    """
    k = scores.shape[0]
    keep, order = nms(boxes, scores, iou_threshold)
    valid = scores > NEG_INF / 2
    iou_mat = pairwise_iou(boxes, boxes)
    # leader of j = argmax score over kept i with IoU(i, j) > thr
    cand = keep[:, None] & (iou_mat > iou_threshold)       # (i, j)
    cand_scores = jnp.where(cand, scores[:, None], NEG_INF)
    leader = jnp.argmax(cand_scores, axis=0).astype(jnp.int32)
    has_leader = jnp.max(cand_scores, axis=0) > NEG_INF / 2
    self_idx = jnp.arange(k, dtype=jnp.int32)
    group = jnp.where(keep, self_idx,
                      jnp.where(has_leader, leader, self_idx))
    group = jnp.where(valid, group, -1)
    return keep, group
