"""Randomized parity vs the reference's vendored COCOeval (gated).

The reference carries a dependency-light editable copy of pycocotools'
evaluator (``yolox-drone/models/core/cocoeval.py:10``).  Its only binary
dependency is ``maskUtils.iou`` which, for ``iouType='bbox'``, is plain
xywh IoU with crowd->IoF semantics — shimmed here in numpy — so the
whole accumulation protocol (greedy score-descending matching,
ignore-last GT ordering, maxDets truncation order, area-range in/out
rules, 101-point envelope interpolation, mergesort tie-breaking) runs
as-is in this image.  We sweep randomized det/gt populations with
``maxDets=[10,100,500]`` (ufpmp_det_eval.py:335) and require our
self-contained ``CocoEvaluator`` to reproduce the full precision/recall
tensors and all 12 summary stats.

Crowd semantics ARE in scope: GT tuples may carry an ``iscrowd``
flag (always-ignore GTs matched by IoF that absorb unlimited
detections) and the sweep below includes crowd populations.  Also
exercised: exact area-boundary GTs (32^2 px^2 sits in BOTH the small
and medium ranges) and heavy score ties.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_EVAL = "/root/reference/yolox-drone/models/core/cocoeval.py"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_EVAL),
    reason="reference snapshot not mounted")


def _bbox_iou_xywh(dts, gts, iscrowd):
    """maskUtils.iou bbox semantics: IoU, except IoF for crowd gts."""
    dts = np.asarray(dts, np.float64).reshape(-1, 4)
    gts = np.asarray(gts, np.float64).reshape(-1, 4)
    if len(dts) == 0 or len(gts) == 0:
        return np.zeros((len(dts), len(gts)))
    ix1 = np.maximum(dts[:, None, 0], gts[None, :, 0])
    iy1 = np.maximum(dts[:, None, 1], gts[None, :, 1])
    ix2 = np.minimum(dts[:, None, 0] + dts[:, None, 2],
                     gts[None, :, 0] + gts[None, :, 2])
    iy2 = np.minimum(dts[:, None, 1] + dts[:, None, 3],
                     gts[None, :, 1] + gts[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    d_area = (dts[:, 2] * dts[:, 3])[:, None]
    g_area = (gts[:, 2] * gts[:, 3])[None, :]
    crowd = np.asarray(iscrowd, bool)[None, :]
    union = np.where(crowd, d_area, d_area + g_area - inter)
    return inter / np.maximum(union, 1e-300)


@pytest.fixture(scope="module")
def ref_cocoeval():
    """Load the reference cocoeval with the mask import shimmed."""
    if not hasattr(np, "float"):      # np.float removed in numpy>=1.24
        np.float = float              # noqa: NPY001
    pkg = types.ModuleType("_glsdet_ref_core")
    pkg.__path__ = [os.path.dirname(REF_EVAL)]
    sys.modules["_glsdet_ref_core"] = pkg
    mask_mod = types.ModuleType("_glsdet_ref_core.mask")
    mask_mod.iou = _bbox_iou_xywh
    sys.modules["_glsdet_ref_core.mask"] = mask_mod
    spec = importlib.util.spec_from_file_location(
        "_glsdet_ref_core.cocoeval", REF_EVAL)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


class _FakeCOCO:
    """Minimal COCO-API surface COCOeval touches."""

    def __init__(self, img_ids, cat_ids, anns):
        self._img_ids = list(img_ids)
        self._cat_ids = list(cat_ids)
        self._anns = {a["id"]: a for a in anns}
        self._order = [a["id"] for a in anns]

    def getImgIds(self):
        return list(self._img_ids)

    def getCatIds(self):
        return list(self._cat_ids)

    def getAnnIds(self, imgIds=None, catIds=None):
        imgs = set(imgIds) if imgIds else None
        cats = set(catIds) if catIds else None
        out = []
        for i in self._order:
            a = self._anns[i]
            if imgs is not None and a["image_id"] not in imgs:
                continue
            if cats is not None and a["category_id"] not in cats:
                continue
            out.append(i)
        return out

    def loadAnns(self, ids):
        return [self._anns[i] for i in ids]


# standard pycocotools area ranges (ufpmp_det_eval.py evaluates with
# stock pycocotools defaults); the vendored drone copy overrides these
# at cocoeval.py:510 — see DRONE_AREA_RNG below.
COCO_AREA_RNG = [[0., 1e10], [0., 32. ** 2], [32. ** 2, 96. ** 2],
                 [96. ** 2, 1e10]]
# yolox-drone's vendored override: "medium" is everything >= 32^2 and
# "large" is the empty range [1e10, 1e10]
DRONE_AREA_RNG = [[0., 1e10], [0., 32. ** 2], [32. ** 2, 1e10],
                  [1e10, 1e10]]


def _run_reference(ref_mod, img_ids, num_classes, gts, dets,
                   max_dets=(10, 100, 500), area_rng=COCO_AREA_RNG):
    cat_ids = list(range(1, num_classes + 1))
    gt_anns, next_id = [], 1
    for img in img_ids:
        g = gts[img]
        crowd = g[2] if len(g) > 2 else np.zeros(len(g[0]), bool)
        for b, l, c in zip(g[0], g[1], crowd):
            gt_anns.append({
                "id": next_id, "image_id": img,
                "category_id": int(l) + 1,
                "bbox": [float(v) for v in b],
                "area": float(b[2] * b[3]), "iscrowd": int(c)})
            next_id += 1
    dt_anns = []
    for img in img_ids:
        if img not in dets:
            continue
        boxes, scores, labels = dets[img]
        for b, s, l in zip(boxes, scores, labels):
            dt_anns.append({
                "id": next_id, "image_id": img,
                "category_id": int(l) + 1,
                "bbox": [float(v) for v in b],
                "area": float(b[2] * b[3]),
                "score": float(s), "iscrowd": 0})
            next_id += 1

    coco_gt = _FakeCOCO(img_ids, cat_ids, gt_anns)
    coco_dt = _FakeCOCO(img_ids, cat_ids, dt_anns)
    ev = ref_mod.COCOeval(coco_gt, coco_dt, iouType="bbox")
    ev.params.maxDets = list(max_dets)
    ev.params.areaRng = [list(r) for r in area_rng]
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return ev


def _random_population(rng, n_imgs=4, num_classes=5, wh=(400, 300),
                       tie_quantize=None, boundary_gt=False,
                       crowd_frac=0.0):
    img_ids = list(range(1, n_imgs + 1))
    gts, dets = {}, {}
    for img in img_ids:
        ng = rng.randint(0, 12)
        gb = np.empty((ng, 4))
        gb[:, 0] = rng.uniform(0, wh[0] - 40, ng)
        gb[:, 1] = rng.uniform(0, wh[1] - 40, ng)
        gb[:, 2] = rng.uniform(4, 120, ng)
        gb[:, 3] = rng.uniform(4, 120, ng)
        gl = rng.randint(0, num_classes, ng)
        if boundary_gt and ng:
            # exactly 32x32 = 1024 px^2: in BOTH small and medium ranges
            gb[0, 2:] = 32.0
        if crowd_frac:
            crowd = rng.rand(ng) < crowd_frac
            if crowd.any():
                # crowd regions are typically large: inflate them so the
                # IoF-vs-IoU distinction actually bites
                gb[crowd, 2:] *= 3.0
            gts[img] = (gb, gl.astype(np.int64), crowd)
        else:
            gts[img] = (gb, gl.astype(np.int64))

        nd = rng.randint(0, 30)
        # half perturbed copies of gts (real matches), half noise
        db = np.empty((nd, 4))
        for i in range(nd):
            if ng and i % 2 == 0:
                src = gb[rng.randint(ng)]
                db[i] = src + rng.normal(0, 4, 4)
                db[i, 2:] = np.maximum(db[i, 2:], 2)
            else:
                db[i] = [rng.uniform(0, wh[0] - 40),
                         rng.uniform(0, wh[1] - 40),
                         rng.uniform(4, 120), rng.uniform(4, 120)]
        ds = rng.uniform(0.05, 1.0, nd)
        if tie_quantize:
            ds = np.round(ds, tie_quantize)
        dl = rng.randint(0, num_classes, nd)
        dets[img] = (db, ds, dl.astype(np.int64))
    return img_ids, gts, dets


def _assert_parity(ref_mod, img_ids, num_classes, gts, dets,
                   max_dets=(10, 100, 500), area_rng=COCO_AREA_RNG):
    from glsdet_tpu.eval.coco_eval import CocoEvaluator

    labels = ["all", "small", "medium", "large"]
    rngs = {n: tuple(r) for n, r in zip(labels, area_rng)}
    ours = CocoEvaluator(num_classes, max_dets=max_dets,
                         area_rngs=rngs).evaluate(gts, dets)
    ref = _run_reference(ref_mod, img_ids, num_classes, gts, dets,
                         max_dets, area_rng)
    np.testing.assert_allclose(ours.precision, ref.eval["precision"],
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(ours.recall, ref.eval["recall"],
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(ours.stats, ref.stats, rtol=1e-10,
                               atol=1e-12)


class TestCocoEvalParity:
    @pytest.mark.parametrize("seed", range(12))
    def test_randomized_sweep(self, ref_cocoeval, seed):
        rng = np.random.RandomState(seed)
        img_ids, gts, dets = _random_population(
            rng, n_imgs=3 + seed % 3, num_classes=4 + seed % 4)
        _assert_parity(ref_cocoeval, img_ids, len(
            set(range(4 + seed % 4))), gts, dets)

    @pytest.mark.parametrize("seed", range(4))
    def test_heavy_score_ties(self, ref_cocoeval, seed):
        # 1-decimal scores force many ties -> exercises mergesort
        # stability in both the per-image and global sorts
        rng = np.random.RandomState(100 + seed)
        img_ids, gts, dets = _random_population(
            rng, n_imgs=4, num_classes=3, tie_quantize=1)
        _assert_parity(ref_cocoeval, img_ids, 3, gts, dets)

    def test_area_boundary_gt(self, ref_cocoeval):
        # a gt of exactly 32^2 px^2 must count in small AND medium
        rng = np.random.RandomState(7)
        img_ids, gts, dets = _random_population(
            rng, n_imgs=3, num_classes=3, boundary_gt=True)
        _assert_parity(ref_cocoeval, img_ids, 3, gts, dets)

    def test_small_maxdets_truncation(self, ref_cocoeval):
        # maxDets=[1,3,5] with ~30 dets/img: truncation order matters
        rng = np.random.RandomState(21)
        img_ids, gts, dets = _random_population(rng, n_imgs=3,
                                                num_classes=3)
        _assert_parity(ref_cocoeval, img_ids, 3, gts, dets,
                       max_dets=(1, 3, 5))

    def test_absent_category_stays_minus_one(self, ref_cocoeval):
        rng = np.random.RandomState(3)
        img_ids, gts, dets = _random_population(rng, n_imgs=2,
                                                num_classes=2)
        # evaluate with an extra never-seen class
        _assert_parity(ref_cocoeval, img_ids, 5, gts, dets)

    @pytest.mark.parametrize("seed", range(3))
    def test_drone_area_ranges(self, ref_cocoeval, seed):
        # the vendored copy's own defaults (cocoeval.py:510): medium is
        # open-ended [32^2, 1e10] and large is the empty [1e10, 1e10]
        rng = np.random.RandomState(200 + seed)
        img_ids, gts, dets = _random_population(rng, n_imgs=4,
                                                num_classes=4)
        _assert_parity(ref_cocoeval, img_ids, 4, gts, dets,
                       area_rng=DRONE_AREA_RNG)

    @pytest.mark.parametrize("seed", range(6))
    def test_crowd_gts(self, ref_cocoeval, seed):
        # iscrowd GTs: always-ignore, IoF matching, unlimited matches —
        # the pycocotools crowd branch (cocoeval.py:106-109, :188-189
        # in the vendored copy) swept with ~1/3 crowd populations
        rng = np.random.RandomState(300 + seed)
        img_ids, gts, dets = _random_population(
            rng, n_imgs=3 + seed % 2, num_classes=3 + seed % 3,
            crowd_frac=0.35)
        assert any(len(g) > 2 and np.asarray(g[2]).any()
                   for g in gts.values()), "population drew no crowds"
        _assert_parity(ref_cocoeval, img_ids, 3 + seed % 3, gts, dets)

    def test_crowd_absorbs_multiple_dets(self, ref_cocoeval):
        # two dets fully inside one big crowd gt: both must match it
        # (and be ignored), not produce one TP+one FP
        gts = {1: (np.array([[0., 0., 200., 200.], [300., 0., 20., 20.]]),
                   np.array([0, 0]), np.array([True, False]))}
        dets = {1: (np.array([[10., 10., 30., 30.], [50., 50., 40., 40.],
                              [300., 0., 20., 20.]]),
                    np.array([0.9, 0.8, 0.7]), np.array([0, 0, 0]))}
        _assert_parity(ref_cocoeval, [1], 1, gts, dets)

    def test_image_with_no_detections(self, ref_cocoeval):
        rng = np.random.RandomState(11)
        img_ids, gts, dets = _random_population(rng, n_imgs=4,
                                                num_classes=3)
        dets.pop(img_ids[0])
        empty = (np.zeros((0, 4)), np.zeros((0,)), np.zeros((0,), np.int64))
        dets[img_ids[1]] = empty
        _assert_parity(ref_cocoeval, img_ids, 3, gts, dets)
