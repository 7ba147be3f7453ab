"""Pallas NMS kernel parity vs the XLA-composed NMS (interpret mode on
the CPU test mesh; the real kernel path runs on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from glsdet_tpu.ops.nms import NEG_INF, batched_nms, nms
from glsdet_tpu.ops.pallas_nms import batched_nms_pallas, nms_pallas


def _random_case(seed, k=100, classes=None):
    rs = np.random.RandomState(seed)
    x1 = rs.uniform(0, 400, k)
    y1 = rs.uniform(0, 400, k)
    boxes = np.stack([x1, y1, x1 + rs.uniform(5, 80, k),
                      y1 + rs.uniform(5, 80, k)], 1).astype(np.float32)
    scores = rs.rand(k).astype(np.float32)
    # pad some invalid
    scores[-7:] = NEG_INF
    labels = (rs.randint(0, classes, k).astype(np.int32)
              if classes else None)
    return jnp.asarray(boxes), jnp.asarray(scores), (
        jnp.asarray(labels) if classes else None)


class TestPallasNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("thr", [0.3, 0.5, 0.7])
    def test_parity_with_xla_nms(self, seed, thr):
        boxes, scores, _ = _random_case(seed)
        keep_ref, _ = nms(boxes, scores, thr)
        keep_pal, _ = nms_pallas(boxes, scores, thr, interpret=True)
        np.testing.assert_array_equal(np.asarray(keep_ref),
                                      np.asarray(keep_pal))

    def test_batched_parity(self):
        boxes, scores, labels = _random_case(3, k=128, classes=5)
        keep_ref, _ = batched_nms(boxes, scores, labels, 0.5)
        keep_pal, _ = batched_nms_pallas(boxes, scores, labels, 0.5,
                                         interpret=True)
        np.testing.assert_array_equal(np.asarray(keep_ref),
                                      np.asarray(keep_pal))

    def test_legacy_offset_parity(self):
        boxes, scores, _ = _random_case(4, k=64)
        keep_ref, _ = nms(boxes, scores, 0.6, offset=1.0)
        keep_pal, _ = nms_pallas(boxes, scores, 0.6, offset=1.0,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(keep_ref),
                                      np.asarray(keep_pal))

    def test_all_invalid(self):
        boxes = jnp.zeros((16, 4))
        scores = jnp.full((16,), NEG_INF)
        keep, _ = nms_pallas(boxes, scores, 0.5, interpret=True)
        assert not bool(np.asarray(keep).any())

    def test_vmap_parity(self):
        """The batched mosaic stage vmaps batched_nms over the chunk
        axis; verify the kernel's vmap batching matches per-slice."""
        import jax

        cases = [_random_case(s, classes=5) for s in (10, 11, 12, 13)]
        boxes = jnp.stack([c[0] for c in cases])
        scores = jnp.stack([c[1] for c in cases])
        labels = jnp.stack([c[2] for c in cases])

        def one(b, s, l):
            keep, _ = batched_nms_pallas(b, s, l, 0.5, interpret=True)
            return keep

        batched = jax.vmap(one)(boxes, scores, labels)
        for i in range(4):
            np.testing.assert_array_equal(
                np.asarray(batched[i]), np.asarray(one(*cases[i])))
