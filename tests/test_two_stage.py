"""Two-stage pipeline integration tests (tiny models, CPU).

The analog of the reference's full-model forward tests
(tests/test_models/test_forward.py): build small real models, run the
complete UFPMP path end-to-end, assert structural invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glsdet_tpu.eval.two_stage import TwoStagePipeline, pick_bucket
from glsdet_tpu.models import MPDet, YOLOXDetector


@pytest.fixture(scope="module")
def pipeline():
    rng = jax.random.PRNGKey(0)
    coarse = YOLOXDetector(num_classes=10, phi="nano")
    cvars = coarse.init(rng, jnp.zeros((1, 128, 128, 3)), train=False)
    mp = MPDet(num_classes=10, depth=18)
    mvars = mp.init(rng, jnp.zeros((1, 128, 128, 3)), train=False)
    return TwoStagePipeline(
        lambda v, im: coarse.apply(v, im, train=False),
        lambda v, im: mp.apply(v, im, train=False),
        (128, 128), mosaic_buckets=(256, 512),
        coarse_score_thr=1e-4, max_regions=16,
        coarse_vars=cvars, mp_vars=mvars)


class TestPickBucket:
    def test_smallest_cover(self):
        assert pick_bucket(300, 500, (256, 512, 1024)) == 512
        assert pick_bucket(100, 100, (256, 512)) == 256
        assert pick_bucket(3000, 100, (256, 512)) == 512  # clipped


class TestTwoStage:
    def test_single_image(self, pipeline):
        img = np.random.RandomState(0).randint(
            0, 255, (200, 320, 3), np.uint8)
        out = pipeline(img)
        assert set(out) == {"boxes", "scores", "labels"}
        assert out["boxes"].shape[1:] == (4,)
        # detections land inside the original image bounds (+1px slack)
        if len(out["boxes"]):
            assert out["boxes"][:, 0].min() >= -1
            assert out["boxes"][:, 2].max() <= 321

    def test_batch_matches_single(self, pipeline):
        rs = np.random.RandomState(1)
        imgs = [rs.randint(0, 255, (200, 320, 3), np.uint8)
                for _ in range(2)]
        batch = pipeline.run_batch(imgs)
        singles = [pipeline(im) for im in imgs]
        for b, s in zip(batch, singles):
            np.testing.assert_allclose(b["boxes"], s["boxes"], atol=1e-4)
            np.testing.assert_allclose(b["scores"], s["scores"], atol=1e-6)

    def test_blank_image_no_crash(self, pipeline):
        out = pipeline(np.zeros((200, 320, 3), np.uint8))
        assert isinstance(out["boxes"], np.ndarray)

    def test_device_batch_matches_host_batch(self, pipeline):
        import jax.numpy as jnp

        rs = np.random.RandomState(3)
        imgs = [rs.randint(0, 255, (200, 320, 3), np.uint8)
                for _ in range(3)]
        staged = pipeline.run_device_batch(jnp.asarray(np.stack(imgs)))
        host = pipeline.run_batch(imgs)
        assert len(staged) == 3
        for a, b in zip(staged, host):
            assert a["boxes"].shape == b["boxes"].shape
            np.testing.assert_allclose(a["boxes"], b["boxes"], atol=1e-4)

    def test_chunked_mixed_shapes_preserve_order(self, pipeline):
        # 5 frames of one shape + 1 of another: exercises shape grouping,
        # pow2 chunk padding (5 -> chunks of 4+1) and order restoration.
        rs = np.random.RandomState(2)
        imgs = [rs.randint(0, 255, (200, 320, 3), np.uint8)
                for _ in range(5)]
        imgs.insert(2, rs.randint(0, 255, (160, 240, 3), np.uint8))
        batch = pipeline.run_batch(imgs)
        assert len(batch) == 6
        singles = [pipeline(im) for im in imgs]
        nonempty = 0
        for b, s in zip(batch, singles):
            assert b["boxes"].shape == s["boxes"].shape
            np.testing.assert_allclose(b["boxes"], s["boxes"], atol=1e-4)
            nonempty += int(len(b["boxes"]) > 0)
        # the untrained nano at thr=1e-4 must fire on noise — otherwise
        # this test is vacuously comparing empties
        assert nonempty > 0

    def test_pipelined_stacks_match_device_batch(self, pipeline):
        rs = np.random.RandomState(4)
        stacks_np = [np.stack([rs.randint(0, 255, (200, 320, 3), np.uint8)
                               for _ in range(2)]) for _ in range(2)]
        stacks = [jnp.asarray(s) for s in stacks_np]
        multi = pipeline.run_device_batches(stacks)
        assert len(multi) == 2 and all(len(m) == 2 for m in multi)
        for stack, got in zip(stacks, multi):
            want = pipeline.run_device_batch(stack)
            for a, b in zip(got, want):
                assert a["boxes"].shape == b["boxes"].shape
                np.testing.assert_allclose(a["boxes"], b["boxes"],
                                           atol=1e-4)
                np.testing.assert_allclose(a["scores"], b["scores"],
                                           atol=1e-6)
