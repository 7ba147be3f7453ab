"""Device-side color stage (data/device_color.py): cv2 parity envelopes,
host-pipeline equivalence, and the train-step integration.

The color stage (mixup blend + HSV jitter + normalize) moves on device
because it is the most expensive host work in the train pipeline after
decode (see ARCHITECTURE).  These tests pin:

- cv2 uint8 RGB<->HSV conversion parity to +/-1 code per stage and the
  composed-jitter envelope (an H-code +/-1 amplifies through HSV2RGB on
  saturated pixels — bounded and rare, both asserted);
- EXACT box/label/flip/rng equivalence between the host pipeline and
  the deferred (device_color=True) pipeline on the same seed;
- pixel closeness of the full rendered sample vs the host pipeline;
- the train step consuming the new batch keys (jit, finite loss) and
  ignoring them when absent (legacy contract).
"""

import json

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glsdet_tpu.data.coco import CocoDataset
from glsdet_tpu.data.device_color import (
    apply_color,
    hsv_jitter,
    hsv_to_rgb_u8,
    prep_batch_images,
    rgb_to_hsv_u8,
)
from glsdet_tpu.data.loader import TrainPipeline


@pytest.fixture(scope="module")
def rand_img():
    return np.random.RandomState(0).randint(0, 256, (48, 64, 3), np.uint8)


class TestHsvParity:
    def test_rgb2hsv_within_one_code(self, rand_img):
        ref = cv2.cvtColor(rand_img, cv2.COLOR_RGB2HSV).astype(np.int32)
        got = np.asarray(rgb_to_hsv_u8(
            jnp.asarray(rand_img, jnp.float32))).astype(np.int32)
        # H wraps at 180: 0 and 179 are adjacent codes
        dh = np.abs(ref[..., 0] - got[..., 0])
        dh = np.minimum(dh, 180 - dh)
        assert dh.max() <= 1
        assert np.abs(ref[..., 1:] - got[..., 1:]).max() <= 1

    def test_hsv2rgb_within_one_code(self, rand_img):
        hsv = cv2.cvtColor(rand_img, cv2.COLOR_RGB2HSV)
        ref = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.int32)
        got = np.asarray(hsv_to_rgb_u8(
            jnp.asarray(hsv, jnp.float32))).astype(np.int32)
        assert np.abs(ref - got).max() <= 1

    def test_jitter_envelope_vs_cv2(self, rand_img):
        rs = np.random.RandomState(1)
        for _ in range(3):
            d = np.array([rs.randint(-5, 6), rs.randint(-30, 31),
                          rs.randint(-30, 31)])
            hsv = cv2.cvtColor(rand_img, cv2.COLOR_RGB2HSV).astype(
                np.int16)
            hsv[..., 0] = (hsv[..., 0] + d[0]) % 180
            hsv[..., 1] = np.clip(hsv[..., 1] + d[1], 0, 255)
            hsv[..., 2] = np.clip(hsv[..., 2] + d[2], 0, 255)
            ref = cv2.cvtColor(hsv.astype(np.uint8),
                               cv2.COLOR_HSV2RGB).astype(np.int32)
            got = np.asarray(hsv_jitter(
                jnp.asarray(rand_img, jnp.float32),
                jnp.asarray(d, jnp.float32))).astype(np.int32)
            diff = np.abs(ref - got)
            # composed fixed-point-vs-float envelope: tiny on average,
            # bounded even on the rare saturated-pixel H amplification
            assert diff.max() <= 16
            assert diff.mean() < 1.0
            assert (diff > 2).mean() < 0.02

    def test_zero_deltas_matches_cv2_roundtrip(self, rand_img):
        # the uint8 HSV space quantizes H to 2-degree codes, so even
        # cv2's own roundtrip moves saturated pixels by several codes;
        # the device path must track cv2's roundtrip, not the original
        ref = cv2.cvtColor(cv2.cvtColor(rand_img, cv2.COLOR_RGB2HSV),
                           cv2.COLOR_HSV2RGB).astype(np.int32)
        got = np.asarray(hsv_jitter(jnp.asarray(rand_img, jnp.float32),
                                    jnp.zeros(3))).astype(np.int32)
        diff = np.abs(ref - got)
        assert diff.max() <= 16
        assert diff.mean() < 1.0
        assert (diff > 2).mean() < 0.02


class TestApplyColor:
    def test_blend_truncates_like_host(self, rand_img):
        a = rand_img[None]
        b = (255 - rand_img)[None]
        host = (a[0].astype(np.float32) * 0.5
                + b[0].astype(np.float32) * 0.5).astype(np.uint8)
        got = np.asarray(apply_color(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray([0.5]),
            jnp.zeros((1, 3))))[0]
        assert np.abs(got - host.astype(np.float32)).max() <= 2

    def test_weight_one_ignores_mix(self, rand_img):
        a = jnp.asarray(rand_img[None])
        garbage = jnp.asarray(
            np.random.RandomState(3).randint(0, 256, rand_img.shape,
                                             np.uint8)[None])
        got = np.asarray(apply_color(a, garbage, jnp.asarray([1.0]),
                                     jnp.zeros((1, 3))))
        ref = np.asarray(apply_color(a, jnp.zeros_like(a),
                                     jnp.asarray([1.0]),
                                     jnp.zeros((1, 3))))
        np.testing.assert_array_equal(got, ref)

    def test_prep_without_keys_is_legacy(self):
        x = jnp.ones((1, 4, 4, 3), jnp.float32) * 100
        out = prep_batch_images({"images": x}, normalize=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("dc_data")
    (root / "images").mkdir()
    rs = np.random.RandomState(7)
    images, annotations = [], []
    for i in range(6):
        img = rs.randint(0, 256, (80, 96, 3), np.uint8)
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
        images.append({"id": i + 1, "file_name": f"{i}.jpg",
                       "width": 96, "height": 80})
        annotations.append({
            "id": i + 1, "image_id": i + 1, "category_id": 1,
            "bbox": [10 + i, 10, 30, 24], "area": 720, "iscrowd": 0})
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 1, "name": "car"}]}
    (root / "train.json").write_text(json.dumps(ann))
    return CocoDataset(str(root / "train.json"), str(root / "images"))


class TestPipelineEquivalence:
    def _pair(self, tiny_ds, seed, **kw):
        host = TrainPipeline(tiny_ds, (96, 96), max_gt=20,
                             raw_uint8=True, **kw)
        dev = TrainPipeline(tiny_ds, (96, 96), max_gt=20,
                            device_color=True, **kw)
        s_h = host(0, np.random.RandomState(seed))
        s_d = dev(0, np.random.RandomState(seed))
        return s_h, s_d

    @pytest.mark.parametrize("seed", [0, 3, 11, 29])
    def test_boxes_exact_and_pixels_close(self, tiny_ds, seed):
        s_h, s_d = self._pair(tiny_ds, seed)
        # identical rng stream -> identical geometry
        np.testing.assert_array_equal(s_h["gt_boxes"], s_d["gt_boxes"])
        np.testing.assert_array_equal(s_h["gt_labels"], s_d["gt_labels"])
        np.testing.assert_array_equal(s_h["gt_valid"], s_d["gt_valid"])
        # device-rendered pixels vs the cv2 host pipeline
        rendered = np.asarray(apply_color(
            jnp.asarray(s_d["images"][None]),
            jnp.asarray(s_d["mix_images"][None]),
            jnp.asarray(s_d["mix_weight"][None]),
            jnp.asarray(s_d["hsv_deltas"][None])))[0]
        host_px = s_h["images"].astype(np.float32)  # raw_uint8=False...
        if s_h["images"].dtype != np.uint8:  # host normalized f32
            pytest.fail("fixture must use raw_uint8 host pipeline")
        diff = np.abs(rendered - host_px)
        assert diff.mean() < 1.0
        assert (diff > 2).mean() < 0.02

    def test_sample_shapes_and_dtypes(self, tiny_ds):
        _, s_d = self._pair(tiny_ds, 0)
        assert s_d["images"].dtype == np.uint8
        assert s_d["mix_images"].shape == (96, 96, 3)
        assert s_d["mix_weight"].dtype == np.float32
        assert s_d["hsv_deltas"].shape == (3,)

    def test_no_aug_mode_emits_no_color_keys(self, tiny_ds):
        """With mixup/hsv statically off the device path must not ship
        the zero mix canvas (double upload bytes) nor run the uint8 HSV
        round-trip (NOT a pixel no-op at zero deltas) — the color keys
        disappear and the stage compiles out."""
        dev = TrainPipeline(tiny_ds, (96, 96), max_gt=20, mosaic=False,
                            enable_mixup=False, hsv=False,
                            device_color=True)
        s = dev(0, np.random.RandomState(0))
        assert "mix_images" not in s and "mix_weight" not in s
        assert "hsv_deltas" not in s
        assert s["images"].dtype == np.uint8
        # and the batch prep is then a pure pass-through before normalize
        from glsdet_tpu.data.device_color import apply_batch_color
        img = jnp.asarray(s["images"])[None]
        np.testing.assert_array_equal(
            np.asarray(apply_batch_color({"images": img})),
            np.asarray(img))

    def test_pair_uses_raw_uint8_host(self, tiny_ds):
        host = TrainPipeline(tiny_ds, (96, 96), max_gt=20)
        s = host(0, np.random.RandomState(0))
        assert s["images"].dtype == np.float32  # default normalizes


class TestTrainStepIntegration:
    def test_yolox_step_consumes_color_keys(self):
        from glsdet_tpu.models import YOLOXDetector
        from glsdet_tpu.train import (TrainState, make_yolox_train_step,
                                      yolox_sgd)

        model = YOLOXDetector(num_classes=3, phi="nano")
        rng = jax.random.PRNGKey(0)
        variables = jax.jit(model.init, static_argnames="train")(
            rng, jnp.zeros((1, 64, 64, 3)), train=False)
        tx = yolox_sgd(lambda s: 0.01)
        rs = np.random.RandomState(0)
        batch = {
            "images": jnp.asarray(
                rs.randint(0, 256, (2, 64, 64, 3), np.uint8)),
            "mix_images": jnp.asarray(
                rs.randint(0, 256, (2, 64, 64, 3), np.uint8)),
            "mix_weight": jnp.asarray([1.0, 0.5], jnp.float32),
            "hsv_deltas": jnp.asarray([[2, -10, 5], [0, 0, 0]],
                                      jnp.float32),
            "gt_boxes": jnp.asarray([[[8., 8., 40., 40.]]] * 2),
            "gt_labels": jnp.zeros((2, 1), jnp.int32),
            "gt_valid": jnp.ones((2, 1), bool),
        }
        step = jax.jit(make_yolox_train_step(
            model, tx, (64, 64), normalize=True))
        state, metrics = step(TrainState.create(variables, tx, rng),
                              batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_color_keys_with_multiscale_resize(self):
        """device_color composes with the resize_from multi-scale path:
        color renders at the loader's base size, the step resizes the
        rendered codes on device (resample commutes with normalize)."""
        from glsdet_tpu.models import YOLOXDetector
        from glsdet_tpu.train import (TrainState, make_yolox_train_step,
                                      yolox_sgd)

        model = YOLOXDetector(num_classes=3, phi="nano")
        rng = jax.random.PRNGKey(0)
        variables = jax.jit(model.init, static_argnames="train")(
            rng, jnp.zeros((1, 64, 64, 3)), train=False)
        tx = yolox_sgd(lambda s: 0.01)
        rs = np.random.RandomState(2)
        batch = {
            "images": jnp.asarray(
                rs.randint(0, 256, (2, 64, 64, 3), np.uint8)),
            "mix_images": jnp.asarray(
                rs.randint(0, 256, (2, 64, 64, 3), np.uint8)),
            "mix_weight": jnp.asarray([0.5, 1.0], jnp.float32),
            "hsv_deltas": jnp.asarray([[1, 5, -3], [0, 0, 0]],
                                      jnp.float32),
            "gt_boxes": jnp.asarray([[[8., 8., 40., 40.]]] * 2),
            "gt_labels": jnp.zeros((2, 1), jnp.int32),
            "gt_valid": jnp.ones((2, 1), bool),
        }
        step = jax.jit(make_yolox_train_step(
            model, tx, (96, 96), normalize=True, resize_from=(64, 64)))
        _, metrics = step(TrainState.create(variables, tx, rng), batch)
        assert np.isfinite(float(metrics["loss"]))

    def test_color_keys_match_pre_rendered(self):
        """A step on (uint8 + params) equals the step on the already
        device-rendered f32 images — the integration adds nothing but
        apply_color."""
        from glsdet_tpu.models import YOLOXDetector
        from glsdet_tpu.train import (TrainState, make_yolox_train_step,
                                      yolox_sgd)

        model = YOLOXDetector(num_classes=3, phi="nano")
        rng = jax.random.PRNGKey(0)
        variables = jax.jit(model.init, static_argnames="train")(
            rng, jnp.zeros((1, 64, 64, 3)), train=False)
        tx = yolox_sgd(lambda s: 0.01)
        rs = np.random.RandomState(1)
        imgs = rs.randint(0, 256, (2, 64, 64, 3), np.uint8)
        mix = rs.randint(0, 256, (2, 64, 64, 3), np.uint8)
        w = np.asarray([0.5, 1.0], np.float32)
        d = np.asarray([[3, 12, -7], [-2, 0, 9]], np.float32)
        gts = {"gt_boxes": jnp.asarray([[[8., 8., 40., 40.]]] * 2),
               "gt_labels": jnp.zeros((2, 1), jnp.int32),
               "gt_valid": jnp.ones((2, 1), bool)}
        step = jax.jit(make_yolox_train_step(
            model, tx, (64, 64), normalize=True))
        st1, m1 = step(TrainState.create(variables, tx, rng),
                       {"images": jnp.asarray(imgs),
                        "mix_images": jnp.asarray(mix),
                        "mix_weight": jnp.asarray(w),
                        "hsv_deltas": jnp.asarray(d), **gts})
        rendered = apply_color(jnp.asarray(imgs), jnp.asarray(mix),
                               jnp.asarray(w), jnp.asarray(d))
        st2, m2 = step(TrainState.create(variables, tx, rng),
                       {"images": rendered, **gts})
        # NOT exact: XLA's fusion context (FMA contraction) flips the
        # f32 rounds at exact .5 ties, so in-step rendering differs from
        # standalone rendering by +/-1 code on scattered pixels — the
        # loss tracks within a small tolerance
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=3e-2)


class TestDecodeCache:
    def test_cache_hits_and_budget(self, tiny_ds, tmp_path):
        ann = tiny_ds.img_root.rsplit("/", 1)[0] + "/train.json"
        ds = CocoDataset(ann, tiny_ds.img_root, cache_images=True)
        a = ds.load_image(ds.records[0])
        b = ds.load_image(ds.records[0])
        assert a is b                      # cache hit returns same array
        assert not a.flags.writeable       # thread-shared => frozen
        np.testing.assert_array_equal(
            a, tiny_ds.load_image(tiny_ds.records[0]))

    def test_budget_zero_disables_insert(self, tiny_ds):
        ann = tiny_ds.img_root.rsplit("/", 1)[0] + "/train.json"
        ds = CocoDataset(ann, tiny_ds.img_root, cache_images=True,
                         cache_bytes=0)
        a = ds.load_image(ds.records[0])
        b = ds.load_image(ds.records[0])
        assert a is not b
