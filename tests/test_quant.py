"""W8A8 dynamic-quantized inference (glsdet_tpu/ops/quant.py).

Checks: the interceptor rewrites nn.Conv faithfully (stride / padding /
groups / dilation / bias), small convs are bypassed exactly, full-model
forwards stay close to the f32 path, and the two-stage pipeline accepts
``quant8=True``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from glsdet_tpu.ops.quant import quantized_inference, wrap_apply_quant8


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))


class _Convs(nn.Module):
    """One conv per supported configuration."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        outs = [
            nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="plain")(x),
            nn.Conv(64, (3, 3), strides=(2, 2), name="strided")(x),
            nn.Conv(64, (1, 1), padding="VALID", name="pw")(x),
            nn.Conv(c, (5, 5), padding=[(2, 2), (2, 2)],
                    feature_group_count=c, name="dw")(x),
            nn.Conv(64, (3, 3), padding=[(3, 3), (3, 3)],
                    kernel_dilation=(3, 3), name="dilated")(x),
        ]
        return outs


class TestQuantConv:
    def setup_method(self, _):
        rs = np.random.RandomState(0)
        self.x = jnp.asarray(rs.randn(2, 16, 16, 48), jnp.float32)
        self.m = _Convs()
        self.v = self.m.init(jax.random.PRNGKey(0), self.x)

    def test_all_conv_configs_close(self):
        ref = self.m.apply(self.v, self.x)
        with quantized_inference(min_channels=8, min_kernel_area=1):
            q = self.m.apply(self.v, self.x)
        for r, o in zip(ref, q):
            assert r.shape == o.shape
            assert _rel_err(r, o) < 0.05

    def test_quantization_actually_changes_output(self):
        # guard against the interceptor silently not firing
        ref = self.m.apply(self.v, self.x)
        with quantized_inference(min_channels=8, min_kernel_area=1):
            q = self.m.apply(self.v, self.x)
        assert all(float(jnp.abs(r - o).max()) > 0
                   for r, o in zip(ref, q))

    def test_pointwise_bypassed_by_default(self):
        # default policy: 1x1 convs (bandwidth-bound) stay full precision
        ref = self.m.apply(self.v, self.x)
        with quantized_inference(min_channels=8):
            q = self.m.apply(self.v, self.x)
        np.testing.assert_array_equal(np.asarray(ref[2]), np.asarray(q[2]))
        assert float(jnp.abs(ref[0] - q[0]).max()) > 0  # 3x3 quantized

    def test_small_conv_bypassed_exactly(self):
        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Conv(8, (3, 3), name="pred")(x)

        m = Tiny()
        x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 48),
                        jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        ref = m.apply(v, x)
        with quantized_inference(min_channels=32):
            q = m.apply(v, x)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(q))

    def test_works_under_jit(self):
        fwd = jax.jit(wrap_apply_quant8(self.m.apply, min_channels=8,
                                        min_kernel_area=1))
        q = fwd(self.v, self.x)
        ref = self.m.apply(self.v, self.x)
        for r, o in zip(ref, q):
            assert _rel_err(r, o) < 0.05


class TestQuantModels:
    def test_mpdet_forward_close(self):
        from glsdet_tpu.models import MPDet

        mp = MPDet(num_classes=6, depth=18, proxies_list=(2,) * 6,
                   dtype=jnp.bfloat16)
        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 64, 64, 3) * 4 - 2,
            jnp.float32)
        v = jax.jit(lambda r, a: mp.init(r, a, train=False))(
            jax.random.PRNGKey(0), jnp.zeros_like(x))
        cls0, reg0 = mp.apply(v, x, train=False)
        with quantized_inference():
            cls1, reg1 = mp.apply(v, x, train=False)
        for a, b in zip(list(cls0) + list(reg0), list(cls1) + list(reg1)):
            assert _rel_err(a, b) < 0.15  # raw logits, random weights

    def test_yolox_forward_close(self):
        from glsdet_tpu.models import YOLOXDetector

        det = YOLOXDetector(num_classes=6, phi="nano", dtype=jnp.bfloat16)
        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 64, 64, 3) * 4 - 2,
            jnp.float32)
        v = jax.jit(lambda r, a: det.init(r, a, train=False))(
            jax.random.PRNGKey(0), jnp.zeros_like(x))
        out0 = det.apply(v, x, train=False)
        with quantized_inference():
            out1 = det.apply(v, x, train=False)
        for a, b in zip(jax.tree_util.tree_leaves(out0),
                        jax.tree_util.tree_leaves(out1)):
            assert _rel_err(a, b) < 0.15


class TestQuantPipeline:
    def test_two_stage_quant8(self):
        from glsdet_tpu.eval.two_stage import TwoStagePipeline
        from glsdet_tpu.models import MPDet, YOLOXDetector

        rng = jax.random.PRNGKey(0)
        coarse = YOLOXDetector(num_classes=3, phi="nano")
        mp = MPDet(num_classes=3, depth=18, proxies_list=(2, 2, 2))
        cx = jnp.zeros((1, 64, 64, 3), jnp.float32)
        cvars = coarse.init(rng, cx, train=False)
        mvars = mp.init(rng, cx, train=False)
        pipe = TwoStagePipeline(
            lambda v, im: coarse.apply(v, im, train=False),
            lambda v, im: mp.apply(v, im, train=False),
            (64, 64), num_classes=3, mosaic_buckets=(128,),
            coarse_score_thr=1e-4, max_coarse_dets=32,
            coarse_vars=cvars, mp_vars=mvars, quant8=True)
        img = np.random.RandomState(0).randint(
            0, 255, (96, 128, 3), np.uint8)
        out = pipe(img)
        assert set(out) >= {"boxes", "scores", "labels"}
