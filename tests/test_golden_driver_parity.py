"""Composed golden-driver equivalence vs the ACTUAL reference driver.

The piecewise parities (UFP bit-match, IoF semantics, NMS oracle,
COCOeval sweep) are composed here into one end-to-end check that runs
the reference's REAL code — ``ufpmp_det_eval.py`` imported from the
snapshot with only its mmdet/mmcv imports stubbed — next to our stack:

  shared synthetic coarse detections
    -> reference ``UnifiedForegroundPacking`` + ``display_merge_result``
       (real ``cv2.imread``/``cv2.resize``) vs our packing + painters
       (pixel compare against the genuine cv2 output, not a hand oracle)
    -> shared synthetic stage-2 detections
    -> the driver's unmap loop (ufpmp_det_eval.py:282-296, replicated
       statement-for-statement since it is inline in ``main``) with its
       ``compute_iof``/``py_cpu_nms`` vs our ``_unmap_and_nms``
    -> pycocotools ``COCOeval`` (maxDets=[10,100,500], :333-338) vs our
       ``CocoEvaluator`` — asserting IDENTICAL stats.

Gated on the reference snapshot being mounted (dev image only).
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/yolox-ufp"
REF_DRIVER = os.path.join(REF_ROOT, "ufpmp_det_eval.py")
REF_UFP_DIR = os.path.join(REF_ROOT, "mmdet/core/ufp")

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_DRIVER),
    reason="reference snapshot not mounted")


# ---------------------------------------------------------------------------
# reference import scaffolding
# ---------------------------------------------------------------------------

def _load_ref_module(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref(request):
    """Import the reference driver module with mmdet/mmcv stubbed.

    Only the *imported names* are stubbed; every function exercised here
    (``compute_iof``, ``py_cpu_nms``, ``display_merge_result``) runs the
    reference's genuine code, and ``UnifiedForegroundPacking`` is the
    genuine reference implementation loaded from ``mmdet/core/ufp``.
    """
    ufp_pkg = types.ModuleType("_golden_ref_ufp")
    ufp_pkg.__path__ = [REF_UFP_DIR]
    sys.modules["_golden_ref_ufp"] = ufp_pkg
    for name in ("spp", "unified_foreground_packing"):
        _load_ref_module(f"_golden_ref_ufp.{name}",
                         os.path.join(REF_UFP_DIR, f"{name}.py"))
    ref_ufp = sys.modules["_golden_ref_ufp.unified_foreground_packing"]

    stubs = {}

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        stubs[name] = m

    missing = lambda *a, **k: (_ for _ in ()).throw(  # noqa: E731
        RuntimeError("stubbed mmdet/mmcv API called"))
    stub("mmdet")
    stub("mmdet.apis", init_detector=missing, show_result_pyplot=missing,
         inference_detector=missing)
    stub("mmdet.datasets")
    stub("mmdet.datasets.pipelines", Compose=missing)
    stub("mmdet.core",
         UnifiedForegroundPacking=ref_ufp.UnifiedForegroundPacking)
    stub("mmcv", imread=cv2.imread)
    stub("mmcv.parallel", collate=missing, scatter=missing)
    # pycocotools is absent from this image; the driver imports it at
    # module top.  Its eval protocol is exercised below through the
    # reference's own vendored copy (yolox-drone/models/core/cocoeval.py)
    stub("pycocotools")
    stub("pycocotools.coco", COCO=missing)
    stub("pycocotools.cocoeval", COCOeval=missing)

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        drv = _load_ref_module("_golden_ref_driver", REF_DRIVER)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    drv._ufp = ref_ufp
    return drv


# ---------------------------------------------------------------------------
# shared synthetic scene
# ---------------------------------------------------------------------------

IMG_W, IMG_H = 1360, 765
NUM_CLASSES = 10


def _scene(seed: int, n_boxes: int = 14):
    """A synthetic frame + plausible coarse boxes (small-object sizes)."""
    rs = np.random.RandomState(seed)
    img = rs.randint(0, 255, (IMG_H, IMG_W, 3), np.uint8)
    w = rs.uniform(8, 90, n_boxes)
    h = rs.uniform(8, 90, n_boxes)
    x1 = rs.uniform(0, IMG_W - 100, n_boxes)
    y1 = rs.uniform(0, IMG_H - 100, n_boxes)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], 1)
    return rs, img, boxes


def _floored_rows(rec, max_regions: int = 32) -> np.ndarray:
    """Reference regions -> the (R, 7) integer rows every consumer of the
    driver floors them to (display_merge_result:188, unmap :283)."""
    rows = np.zeros((max_regions, 7), np.float32)
    for i, r in enumerate(rec):
        rows[i] = [math.floor(v) for v in r]
    rows[len(rec):, 6] = 0.0
    return rows


# ---------------------------------------------------------------------------
# 1. mosaic pixel parity against REAL cv2 crop/resize/paste
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 3, 11])
def test_mosaic_matches_reference_cv2(ref, tmp_path, seed):
    import jax.numpy as jnp

    from glsdet_tpu.ufp.assembly import assemble_mosaic

    _, img, boxes = _scene(seed)
    rec, mw, mh = ref._ufp.UnifiedForegroundPacking(
        boxes.astype(np.float64), 1.5, input_shape=[IMG_W, IMG_H])
    path = tmp_path / f"frame_{seed}.png"
    assert cv2.imwrite(str(path), img)

    ref_mosaic = ref.display_merge_result(rec, str(path), "x", mw, mh)
    out_h, out_w = ref_mosaic.shape[:2]

    rows = _floored_rows(rec)
    ours = np.asarray(assemble_mosaic(jnp.asarray(img.astype(np.float32)),
                                      jnp.asarray(rows), out_h, out_w))

    # cv2.resize on uint8 rounds to uint8 and runs fixed-point bilinear;
    # our painter keeps float32 taps.  1 LSB bounds both effects.
    diff = np.abs(ours - ref_mosaic)
    assert diff.max() <= 1.0, f"max pixel diff {diff.max()}"
    # cv2's uint8 INTER_LINEAR runs 11-bit fixed-point weights, so ~5%
    # of upscaled pixels land just past the 0.5 rounding boundary
    assert (diff <= 0.5 + 1e-4).mean() > 0.90
    # factor-1 chips are pure crops on both sides -> bit-exact there
    for r in rows:
        x1, y1, w, h, nx, ny, f = (int(v) for v in r)
        if f == 1 and w > 0 and h > 0:
            np.testing.assert_array_equal(
                ours[ny:ny + h, nx:nx + w], ref_mosaic[ny:ny + h, nx:nx + w])
    # background stays zero on both sides
    covered = np.zeros((out_h, out_w), bool)
    for r in rows:
        x1, y1, w, h, nx, ny, f = (int(v) for v in r)
        if f > 0 and w > 0 and h > 0:
            covered[ny:ny + h * f, nx:nx + w * f] = True
    assert (ours[~covered] == 0).all() and (ref_mosaic[~covered] == 0).all()


@pytest.mark.parametrize("seed", [0, 3])
def test_tiled_painter_matches_cv2_off_ring(ref, tmp_path, seed):
    """The serving painter (tiled batch) vs real cv2, excluding the
    f-wide chip-border ring (its documented deviation class: slice-based
    resize taps bleed 1 source pixel past the crop edge there)."""
    import jax.numpy as jnp

    from glsdet_tpu.ufp.assembly import (assemble_mosaic_tiled_batch,
                                         split_rows_for_tile)

    _, img, boxes = _scene(seed)
    rec, mw, mh = ref._ufp.UnifiedForegroundPacking(
        boxes.astype(np.float64), 1.5, input_shape=[IMG_W, IMG_H])
    path = tmp_path / f"frame_{seed}.png"
    assert cv2.imwrite(str(path), img)
    ref_mosaic = ref.display_merge_result(rec, str(path), "x", mw, mh)

    out = 32 * math.ceil(max(ref_mosaic.shape[:2]) / 32)
    tile = 128
    rows = _floored_rows(rec)[:len(rec)]
    split7 = split_rows_for_tile(rows, tile, max_rows=128)
    split = np.concatenate(
        [split7, np.zeros((split7.shape[0], 1), np.float32)], axis=1)
    ours = np.asarray(assemble_mosaic_tiled_batch(
        jnp.asarray(img.astype(np.float32))[None], jnp.asarray(split),
        out, out, tile=tile))[0]

    # the deviation class hugs SUB-chip borders (split_rows_for_tile
    # re-crops per tile window, so each sub-chip has its own f-wide
    # edge-tap band) — mask the ring of every split row, not just the
    # original chips
    ring = np.zeros((out, out), bool)
    interior = np.zeros((out, out), bool)
    for r in split7:
        x1, y1, w, h, nx, ny, f = (int(v) for v in r)
        if f <= 0 or w <= 0 or h <= 0:
            continue
        y2, x2 = min(ny + h * f, out), min(nx + w * f, out)
        interior[ny:y2, nx:x2] = True
        ring[ny:y2, nx:x2] = True
        iy1, ix1 = ny + f, nx + f
        iy2, ix2 = max(y2 - f, iy1), max(x2 - f, ix1)
        ring[iy1:iy2, ix1:ix2] = False
    ref_pad = np.zeros((out, out, 3))
    ref_pad[:ref_mosaic.shape[0], :ref_mosaic.shape[1]] = ref_mosaic
    ok = interior & ~ring
    diff = np.abs(ours - ref_pad)[ok]
    assert diff.size and diff.max() <= 1.0, f"off-ring diff {diff.max()}"


# ---------------------------------------------------------------------------
# 2. unmap + NMS + COCO eval: identical stats vs the driver's own code
# ---------------------------------------------------------------------------

def _ref_unmap_nms_results(drv, rec, second_results, image_id: int):
    """ufpmp_det_eval.py:275-322 replicated statement-for-statement (the
    loop is inline in ``main`` so it cannot be imported); every callee
    (``compute_iof``, ``py_cpu_nms``) is the imported reference code."""
    new_second_result = []
    for i in range(10):
        new_second_result.append([])

    for chips in rec:                                          # :282
        o_x1, o_y1, w, h, n_x, n_y, scale_factor = [
            math.floor(_) for _ in chips]                      # :283
        chip_bbox = [n_x, n_y, n_x + w * scale_factor,
                     n_y + h * scale_factor]                   # :284
        for idx, _results in enumerate(second_results):        # :285
            for _result in _results:                           # :286
                x1, y1, x2, y2, score = _result                # :287
                t_bbox = [x1, y1, x2, y2]                      # :289
                if drv.compute_iof(t_bbox, chip_bbox) > 0.9:   # :290
                    new_w = (x2 - x1) / scale_factor
                    new_h = (y2 - y1) / scale_factor
                    new_x = (x1 - n_x) / scale_factor + o_x1
                    new_y = (y1 - n_y) / scale_factor + o_y1
                    new_second_result[idx].append(
                        [new_x, new_y, new_x + new_w, new_y + new_h,
                         score])                               # :291-296

    results = []
    finale_results = [np.array(r) for r in new_second_result]  # :298-300
    for idx, result in enumerate(finale_results):              # :302
        result = np.array(result)
        if result.shape[0] == 0:                               # :304
            continue
        keep = drv.py_cpu_nms(result, 0.6)                     # :306
        for bbox in result[keep]:                              # :307
            x1, y1, x2, y2, score = bbox
            x1, x2, y1, y2 = int(x1), int(x2), int(y1), int(y2)  # :311-314
            results.append({
                "image_id": image_id,
                "category_id": idx,
                "score": float(score),
                "bbox": [x1, y1, x2 - x1, y2 - y1],
            })                                                 # :316-322
    return results


def _synthetic_stage2(rs, rows) -> list:
    """Per-class stage-2 detections in mosaic coords: boxes inside chips
    (transfer), straddling the chip border (gate decides), and on the
    mosaic background (dropped). Distinct scores avoid NMS order ties."""
    per_class = [[] for _ in range(NUM_CLASSES)]
    score_pool = iter(rs.permutation(np.linspace(0.05, 0.95, 4096)))
    for r in rows:
        x1, y1, w, h, nx, ny, f = (int(v) for v in r)
        if f <= 0 or w <= 0 or h <= 0:
            continue
        cw, ch = w * f, h * f
        for _ in range(rs.randint(2, 5)):
            cls = rs.randint(NUM_CLASSES)
            bw = rs.uniform(4, max(5, 0.8 * cw))
            bh = rs.uniform(4, max(5, 0.8 * ch))
            # jitter the center so some boxes straddle the chip border
            cx = nx + rs.uniform(-0.1, 1.1) * cw
            cy = ny + rs.uniform(-0.1, 1.1) * ch
            per_class[cls].append([cx - bw / 2, cy - bh / 2,
                                   cx + bw / 2, cy + bh / 2,
                                   next(score_pool)])
    # background noise boxes far from any chip (top-right corner is
    # outside the strip-packed area for these scenes)
    for _ in range(6):
        cls = rs.randint(NUM_CLASSES)
        x = rs.uniform(3000, 3500)
        y = rs.uniform(3000, 3500)
        per_class[cls].append([x, y, x + rs.uniform(5, 40),
                               y + rs.uniform(5, 40), next(score_pool)])
    return [np.array(c, np.float64) if c else np.zeros((0, 5))
            for c in per_class]


def _ref_coco_stats(gt_boxes, gt_labels, det_rows):
    """The driver's COCOeval call (:333-338) on its detection rows, run
    through the reference's own vendored pycocotools copy
    (yolox-drone/models/core/cocoeval.py; parity scaffolding reused from
    test_cocoeval_reference_parity — pycocotools itself is absent from
    this image)."""
    import test_cocoeval_reference_parity as cep

    ref_mod = cep.ref_cocoeval.__wrapped__()
    gts = {0: (np.stack([gt_boxes[:, 0], gt_boxes[:, 1],
                         gt_boxes[:, 2] - gt_boxes[:, 0],
                         gt_boxes[:, 3] - gt_boxes[:, 1]], 1),
               gt_labels.astype(np.int64))}
    if det_rows:
        db = np.array([r["bbox"] for r in det_rows], np.float64)
        ds = np.array([r["score"] for r in det_rows], np.float64)
        dl = np.array([r["category_id"] for r in det_rows], np.int64)
    else:
        db, ds, dl = np.zeros((0, 4)), np.zeros((0,)), np.zeros((0,), int)
    ev = cep._run_reference(ref_mod, [0], NUM_CLASSES, gts,
                            {0: (db, ds, dl)},
                            max_dets=(10, 100, 500))           # :335
    return np.array(ev.stats)


@pytest.mark.parametrize("seed", [0, 7, 21])
def test_unmap_nms_cocoeval_identical(ref, tmp_path, seed):
    import jax.numpy as jnp

    from glsdet_tpu.eval.coco_eval import CocoEvaluator
    from glsdet_tpu.eval.two_stage import _unmap_and_nms

    rs, _, coarse_boxes = _scene(seed)
    rec, mw, mh = ref._ufp.UnifiedForegroundPacking(
        coarse_boxes.astype(np.float64), 1.5, input_shape=[IMG_W, IMG_H])
    rows = _floored_rows(rec)

    # GT in original coords; stage-2 dets shared by both sides
    n_gt = 10
    gw = rs.uniform(8, 60, n_gt)
    gh = rs.uniform(8, 60, n_gt)
    gx = rs.uniform(0, IMG_W - 80, n_gt)
    gy = rs.uniform(0, IMG_H - 80, n_gt)
    gt_boxes = np.stack([gx, gy, gx + gw, gy + gh], 1)
    gt_labels = rs.randint(0, NUM_CLASSES, n_gt)
    second_results = _synthetic_stage2(rs, rows)

    # ---- reference side: the driver's own loop + py_cpu_nms + COCOeval
    ref_rows = _ref_unmap_nms_results(ref, rec, second_results, 0)
    assert ref_rows, "degenerate scene — nothing transferred"
    ref_stats = _ref_coco_stats(gt_boxes, gt_labels, ref_rows)

    # ---- our side: fixed-shape _unmap_and_nms + CocoEvaluator
    flat = [(b, c) for c, arr in enumerate(second_results) for b in arr]
    K = 512
    boxes = np.zeros((K, 4), np.float32)
    scores = np.full((K,), -1e9, np.float32)
    labels = np.zeros((K,), np.int32)
    valid = np.zeros((K,), bool)
    for i, (b, c) in enumerate(flat):
        boxes[i] = b[:4]
        scores[i] = b[4]
        labels[i] = c
        valid[i] = True
    ob, osc, ol, ov = (np.asarray(a) for a in _unmap_and_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        jnp.asarray(valid), jnp.asarray(rows), iou_thr=0.6, max_out=500))
    ov = ov.astype(bool)
    # the driver int-casts boxes when writing COCO rows (:311-314, :320)
    ib = ob[ov].astype(np.int64)
    det_xywh = np.stack([ib[:, 0], ib[:, 1],
                         ib[:, 2] - ib[:, 0], ib[:, 3] - ib[:, 1]],
                        1).astype(np.float64)
    det_scores = osc[ov].astype(np.float64)
    det_labels = ol[ov].astype(np.int64)

    # same detection SET first (stronger than same AP): identical
    # (class, bbox) rows; scores to f32 tolerance (our pipeline carries
    # them as float32, the driver as float64)
    ref_set = sorted((r["category_id"], tuple(r["bbox"]), r["score"])
                     for r in ref_rows)
    our_set = sorted((int(l), tuple(int(v) for v in b), float(s))
                     for b, s, l in zip(det_xywh, det_scores, det_labels))
    assert [t[:2] for t in ref_set] == [t[:2] for t in our_set]
    np.testing.assert_allclose([t[2] for t in ref_set],
                               [t[2] for t in our_set], atol=1e-6)

    ours = CocoEvaluator(NUM_CLASSES, max_dets=(10, 100, 500))
    gts = {0: (np.stack([gt_boxes[:, 0], gt_boxes[:, 1],
                         gt_boxes[:, 2] - gt_boxes[:, 0],
                         gt_boxes[:, 3] - gt_boxes[:, 1]], 1), gt_labels)}
    dets = {0: (det_xywh, det_scores, det_labels)}
    res = ours.evaluate(gts, dets)
    np.testing.assert_allclose(res.stats, ref_stats, atol=1e-9)
