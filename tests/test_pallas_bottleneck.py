"""Fused ResNet bottleneck kernel (ops/pallas_bottleneck.py) and its
serving-time interceptor (ops/fused_infer.py).

Oracle = the XLA three-conv chain at the same dtypes (bf16 inputs, f32
accumulation); the kernel must match within bf16 rounding.  Run in
interpret mode on the CPU mesh (same kernel code Mosaic compiles on
TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glsdet_tpu.ops.fused_infer import (fused_bottleneck_inference,
                                        wrap_apply_fused)
from glsdet_tpu.ops.pallas_bottleneck import _pick_band, fused_bottleneck


def _oracle(x, w1, b1, w2, b2, w3, b3):
    def conv(h, w, pad):
        return jax.lax.conv_general_dilated(
            h, w.astype(jnp.bfloat16), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    xb = x.astype(jnp.bfloat16)
    y = jax.nn.relu(conv(xb, w1[None, None], "SAME") + b1)
    y = jax.nn.relu(conv(y.astype(jnp.bfloat16), w2,
                         [(1, 1), (1, 1)]) + b2)
    y = conv(y.astype(jnp.bfloat16), w3[None, None], "SAME") + b3
    return jax.nn.relu(y + xb.astype(jnp.float32)).astype(x.dtype)


def _rand_block(rs, C, cmid):
    return (
        jnp.asarray(rs.randn(C, cmid) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(cmid) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(3, 3, cmid, cmid) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(cmid) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(cmid, C) * 0.1, jnp.float32),
        jnp.asarray(rs.randn(C) * 0.1, jnp.float32),
    )


class TestKernelParity:
    @pytest.mark.parametrize("shape", [
        (2, 16, 24, 32),   # multi-band interior + edges
        (1, 8, 8, 64),     # single band (both halos zero)
        (2, 10, 16, 32),   # th=5 banding
        (1, 16, 40, 128),  # stage5-like aspect
    ])
    def test_matches_xla_chain(self, shape):
        B, H, W, C = shape
        rs = np.random.RandomState(hash(shape) % 2**31)
        x = jnp.asarray(rs.randn(B, H, W, C), jnp.float32)
        ws = _rand_block(rs, C, C // 4)
        got = fused_bottleneck(x, *ws, interpret=True)
        want = _oracle(x, *ws)
        err = float(jnp.abs(got - want).max())
        rel = err / (float(jnp.abs(want).max()) + 1e-9)
        assert got.shape == want.shape and got.dtype == want.dtype
        assert rel < 0.03, rel

    def test_band_cap(self):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(1, 16, 16, 32), jnp.float32)
        ws = _rand_block(rs, 32, 8)
        a = fused_bottleneck(x, *ws, band_cap=4, interpret=True)
        b = fused_bottleneck(x, *ws, band_cap=8, interpret=True)
        assert float(jnp.abs(a.astype(jnp.float32)
                             - b.astype(jnp.float32)).max()) < 0.05

    def test_pick_band(self):
        assert _pick_band(40, 8) == 8
        assert _pick_band(40, 4) == 4
        assert _pick_band(10, 8) == 5
        assert _pick_band(7, 8) == 7


class TestInterceptor:
    def _mini_resnet(self):
        from glsdet_tpu.models import ResNet

        m = ResNet(depth=50, base_channels=16, dtype=jnp.bfloat16)
        x = jnp.asarray(
            np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        return m, v, x

    def test_resnet_forward_close(self):
        m, v, x = self._mini_resnet()
        ref = m.apply(v, x, train=False)
        with fused_bottleneck_inference():
            got = m.apply(v, x, train=False)
        for r, g in zip(ref, got):
            assert r.shape == g.shape
            err = float(jnp.abs(r.astype(jnp.float32)
                                - g.astype(jnp.float32)).max())
            scale = float(jnp.abs(r.astype(jnp.float32)).max()) + 1e-9
            assert err / scale < 0.1, err / scale

    def test_actually_fires(self):
        # identity blocks must change numerics (bf16 path differs from
        # the flax conv chain's rounding) — guard against silent no-op
        m, v, x = self._mini_resnet()
        ref = m.apply(v, x, train=False)
        got = wrap_apply_fused(lambda v, h: m.apply(v, h, train=False))(v, x)
        assert any(float(jnp.abs(r.astype(jnp.float32)
                                 - g.astype(jnp.float32)).max()) > 0
                   for r, g in zip(ref, got))

    def test_train_falls_through(self):
        m, v, x = self._mini_resnet()
        ref, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        with fused_bottleneck_inference():
            got, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))

    def test_basicblock_depth_falls_through(self):
        from glsdet_tpu.models import ResNet

        m = ResNet(depth=18, base_channels=16, dtype=jnp.bfloat16)
        x = jnp.asarray(
            np.random.RandomState(1).randn(1, 32, 32, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        ref = m.apply(v, x, train=False)
        with fused_bottleneck_inference():
            got = m.apply(v, x, train=False)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r), np.asarray(g))

    def test_mpdet_forward_close(self):
        from glsdet_tpu.models import MPDet

        mp = MPDet(num_classes=4, depth=50, proxies_list=(2,) * 4,
                   dtype=jnp.bfloat16)
        x = jnp.asarray(
            np.random.RandomState(0).rand(1, 64, 64, 3) * 4 - 2,
            jnp.float32)
        v = jax.jit(lambda r, a: mp.init(r, a, train=False))(
            jax.random.PRNGKey(0), jnp.zeros_like(x))
        cls0, reg0 = mp.apply(v, x, train=False)
        with fused_bottleneck_inference():
            cls1, reg1 = mp.apply(v, x, train=False)
        for a, b in zip(list(cls0) + list(reg0), list(cls1) + list(reg1)):
            err = float(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32)).max())
            scale = float(jnp.abs(a.astype(jnp.float32)).max()) + 1e-9
            assert err / scale < 0.15, err / scale
