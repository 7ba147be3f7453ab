"""Bit-parity vs the ACTUAL reference UFP implementation (gated).

SURVEY.md §4 item (4) calls for golden bit-faithfulness checks against
reference outputs.  The packing stage is the one reference component that
is pure numpy and runnable as-is, so when the reference snapshot is
mounted (dev image only) we import
``yolox-ufp/mmdet/core/ufp/{spp,unified_foreground_packing}.py`` directly
and assert our ``glsdet_tpu.ufp.packing`` produces identical chip layouts
— same crops, same placements, same mosaic dims — across random box
populations and the reference's own __main__ fixture.  When the snapshot
is absent the module is skipped; the standalone oracle tests
(test_ufp.py, test_native_packing.py) keep covering the semantics.

The reference matches placed rectangles back to regions by (w, h), which
is ambiguous under duplicate sizes (unified_foreground_packing.py:170-177)
while we track identity by index, so rows are compared as sorted
multisets; under distinct sizes that is full row equality.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_UFP_DIR = "/root/reference/yolox-ufp/mmdet/core/ufp"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_UFP_DIR),
    reason="reference snapshot not mounted")


@pytest.fixture(scope="module")
def ref_ufp():
    """Import the reference packing module without touching mmdet."""
    pkg = types.ModuleType("_glsdet_ref_ufp")
    pkg.__path__ = [REF_UFP_DIR]
    sys.modules["_glsdet_ref_ufp"] = pkg
    for name in ("spp", "unified_foreground_packing"):
        spec = importlib.util.spec_from_file_location(
            f"_glsdet_ref_ufp.{name}", os.path.join(REF_UFP_DIR, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
    return sys.modules["_glsdet_ref_ufp.unified_foreground_packing"]


def _rows_ours(boxes, scale, input_wh):
    from glsdet_tpu.ufp.packing import unified_foreground_packing

    regions, w, h = unified_foreground_packing(boxes, scale, input_wh)
    return sorted(tuple(r.as_row()) for r in regions), w, h


def _rows_ref(ref_ufp, boxes, scale, input_wh):
    # the reference mutates scaled_bbox_list in place and aliases areas —
    # hand it its own float64 copy
    result, w, h = ref_ufp.UnifiedForegroundPacking(
        np.array(boxes, dtype=np.float64), scale, list(input_wh))
    return sorted(tuple(float(v) for v in row) for row in result), w, h


def _random_boxes(rs, n, img_w, img_h, min_side=2, max_side=140):
    w = rs.uniform(min_side, max_side, n)
    h = rs.uniform(min_side, max_side, n)
    x1 = rs.uniform(0, img_w - max_side, n)
    y1 = rs.uniform(0, img_h - max_side, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1)


@pytest.mark.parametrize("seed,n,scale,img_wh", [
    (0, 1, 1.5, (1360, 765)),
    (1, 2, 1.5, (1360, 765)),
    (2, 5, 2.0, (1333, 1333)),
    (3, 12, 1.5, (1360, 765)),
    (4, 40, 1.5, (2000, 1500)),
    (5, 40, 2.0, (1360, 765)),
    (6, 120, 1.5, (2000, 1500)),
    (7, 80, 1.5, (1333, 1333)),
])
def test_random_populations_bit_match(ref_ufp, seed, n, scale, img_wh):
    rs = np.random.RandomState(seed)
    boxes = _random_boxes(rs, n, *img_wh)
    ours, w0, h0 = _rows_ours(boxes, scale, img_wh)
    ref, w1, h1 = _rows_ref(ref_ufp, boxes, scale, img_wh)
    assert (w0, h0) == (w1, h1)
    np.testing.assert_array_equal(np.array(ours), np.array(ref))


def test_reference_main_fixture(ref_ufp):
    # the fixture at unified_foreground_packing.py:201-205, incl. its
    # degenerate 10x1000 box
    boxes = np.array([
        [5, 3, 10, 10], [5, 3, 10, 10], [2, 4, 10, 10], [30, 8, 10, 10],
        [10, 20, 10, 10], [20, 10, 10, 10], [5, 5, 10, 10], [5, 5, 10, 10],
        [10, 10, 10, 10], [10, 5, 10, 10], [6, 4, 10, 10], [1, 10, 10, 10],
        [8, 4, 10, 10], [6, 6, 10, 10], [20, 14, 10, 1000]], np.float64)
    ours, w0, h0 = _rows_ours(boxes, 1.5, (1333, 1333))
    ref, w1, h1 = _rows_ref(ref_ufp, boxes, 1.5, (1333, 1333))
    assert (w0, h0) == (w1, h1)
    np.testing.assert_array_equal(np.array(ours), np.array(ref))


def test_duplicate_sizes_deliberate_divergence(ref_ufp):
    # identical (w, h) regions expose a reference bug: its re-matching
    # loop (unified_foreground_packing.py:163-177) has no break, so the
    # FIRST placed rectangle consumes EVERY still-flagged same-size
    # region — all duplicates get stamped with one placement and overlap
    # in the mosaic.  Our index-tracked packing gives each region its own
    # strip-pack slot.  Crops and mosaic dims still agree; this test
    # pins both behaviors so the divergence stays documented.
    boxes = np.array([[100, 100, 140, 130], [600, 400, 640, 430],
                      [1000, 50, 1040, 80], [300, 600, 340, 630]],
                     np.float64)
    ours, w0, h0 = _rows_ours(boxes, 1.5, (1360, 765))
    ref, w1, h1 = _rows_ref(ref_ufp, boxes, 1.5, (1360, 765))
    assert (w0, h0) == (w1, h1)
    crops = lambda rows: sorted(r[:4] + (r[6],) for r in rows)
    assert crops(ours) == crops(ref)
    # reference: every duplicate collapses onto the first placement
    assert {r[4:6] for r in ref} == {(0.0, 0.0)}
    # ours: four distinct, disjoint slots covering the packed layout
    our_slots = sorted(r[4:6] for r in ours)
    assert our_slots == [(0.0, 0.0), (0.0, 90.0), (120.0, 0.0),
                         (120.0, 90.0)]


def test_scale_boxes_bit_match(ref_ufp):
    from glsdet_tpu.ufp.packing import scale_boxes

    rs = np.random.RandomState(11)
    boxes = _random_boxes(rs, 64, 1360, 765)
    ours = scale_boxes(boxes, 1.5, (1360, 765))
    ref = ref_ufp.scale_boxes(boxes.copy(), 1.5, [1360, 765])
    np.testing.assert_array_equal(np.asarray(ours, np.float64),
                                  np.asarray(ref, np.float64))
