"""Variant module shape/sanity tests (reference idiom: build tiny module,
random input, assert output shapes — tests/test_models/...)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glsdet_tpu.models.variants import (
    BatchFormer,
    ConAugModule,
    DyHead,
    EVCBlock,
    FFA,
    FFAYoloBody,
    FeatureGroupFPN,
    LSKAttention,
    MSCAM,
    NonLocalBlock,
    PatchNonLocal,
    SE,
    SEBlock,
    SEBlockFPN,
    pixel_shuffle_2x,
)

RNG = jax.random.PRNGKey(0)


def _run(mod, *args, **kw):
    vars_ = mod.init(RNG, *args, **kw)
    return mod.apply(vars_, *args, **kw)


class TestAttention:
    def test_se_preserves_shape(self):
        x = jnp.ones((2, 8, 8, 32))
        assert _run(SE(), x).shape == x.shape

    def test_seblock(self):
        x = jnp.ones((2, 8, 8, 32))
        assert _run(SEBlock(), x).shape == x.shape

    def test_seblock_fpn_multilevel(self):
        feats = [jnp.ones((2, 16, 16, 16)), jnp.ones((2, 8, 8, 32))]
        outs = _run(SEBlockFPN(), feats)
        assert [o.shape for o in outs] == [f.shape for f in feats]

    def test_mscam(self):
        x = jnp.ones((2, 8, 8, 32))
        assert _run(MSCAM(), x, train=False).shape == x.shape

    def test_conaug_triples_channels(self):
        x = jnp.ones((2, 8, 8, 16))
        assert _run(ConAugModule(16), x).shape == (2, 8, 8, 48)

    def test_nonlocal(self):
        x = jnp.ones((2, 8, 8, 32))
        assert _run(NonLocalBlock(), x).shape == x.shape

    def test_patch_nonlocal(self):
        x = jnp.ones((2, 16, 16, 32))
        assert _run(PatchNonLocal(patch=8), x).shape == x.shape


class TestFFA:
    def test_pixel_shuffle(self):
        x = jnp.arange(2 * 2 * 2 * 8, dtype=jnp.float32).reshape(2, 2, 2, 8)
        y = pixel_shuffle_2x(x)
        assert y.shape == (2, 4, 4, 2)
        # energy preserved (pure rearrangement)
        np.testing.assert_allclose(float(x.sum()), float(y.sum()))

    def test_ffa_fuses_to_bottom_resolution(self):
        bottom = jnp.ones((1, 16, 16, 32))
        top = jnp.ones((1, 8, 8, 64))
        out = _run(FFA(32), bottom, top, train=False)
        assert out.shape == (1, 16, 16, 32)

    def test_ffa_model_four_levels(self):
        m = FFAYoloBody(num_classes=10, phi="nano")
        x = jnp.zeros((1, 128, 128, 3))
        cls, reg, obj = _run(m, x, train=False)
        assert len(cls) == 4
        # strides 4, 8, 16, 32
        assert [c.shape[1] for c in cls] == [32, 16, 8, 4]
        assert cls[0].shape[-1] == 10 and reg[0].shape[-1] == 4


class TestLSK:
    def test_lsk_attention(self):
        x = jnp.ones((2, 16, 16, 32))
        assert _run(LSKAttention(), x).shape == x.shape


class TestCFP:
    def test_evc_block(self):
        x = jnp.ones((2, 8, 8, 32))
        assert _run(EVCBlock(num_codes=8), x, train=False).shape == x.shape


class TestDyHead:
    def test_dyhead_multilevel(self):
        feats = [jnp.ones((1, 16, 16, 32)), jnp.ones((1, 8, 8, 32)),
                 jnp.ones((1, 4, 4, 32))]
        outs = _run(DyHead(32, num_stages=1), feats)
        assert [o.shape for o in outs] == [f.shape for f in feats]


class TestBatchFormer:
    def test_train_doubles_batch(self):
        x = jnp.ones((4, 16))
        m = BatchFormer(dim=16)
        vars_ = m.init(RNG, x, train=True)
        out = m.apply(vars_, x, train=True,
                      rngs={"dropout": jax.random.PRNGKey(1)})
        assert out.shape == (8, 16)
        # identity path first (shared-head trick keeps original stream)
        np.testing.assert_allclose(np.asarray(out[:4]), np.asarray(x))

    def test_eval_passthrough(self):
        x = jnp.ones((4, 16))
        m = BatchFormer(dim=16)
        vars_ = m.init(RNG, x, train=False)
        out = m.apply(vars_, x, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x))


class TestVariantDetectors:
    @pytest.mark.parametrize("variant", ["lsk", "se", "mscam", "fg_fpn"])
    def test_yolox_variants_forward(self, variant):
        from glsdet_tpu.models import YOLOXDetector

        m = YOLOXDetector(num_classes=5, phi="nano", variant=variant)
        x = jnp.zeros((1, 64, 64, 3))
        cls, reg, obj = _run(m, x, train=False)
        assert len(cls) == 3 and cls[0].shape[-1] == 5


class TestAdaptiveQuadNonLocal:
    """PatchConvNonLocalAdapt — the fixed-shape TPU re-design of
    Patch_Conv_NonLocal_adapt_new (Non_local_family.py:272); no torch
    transplant is possible (the reference crops data-dependent shapes),
    so pin the re-design's contract instead."""

    def _model_and_input(self):
        from glsdet_tpu.models.variants import PatchConvNonLocalAdapt

        rs = np.random.RandomState(7)
        x = jnp.asarray(rs.rand(2, 16, 16, 8).astype(np.float32))
        m = PatchConvNonLocalAdapt(out_channels=12)
        return m, x

    def test_jit_shape_and_finite(self):
        m, x = self._model_and_input()
        v = m.init(RNG, x, train=False)
        y = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
        assert y.shape == (2, 16, 16, 12)
        assert bool(jnp.isfinite(y).all())

    def test_centroid_follows_mass(self):
        """A bright blob off-center must move the row/col split; the
        output must differ from the centered-uniform case only through
        that shift (gating makes exact equality impossible — just check
        the centroids)."""
        from glsdet_tpu.models.variants.attention import _mass_centroid

        mass = jnp.zeros(32).at[24].set(10.0)
        assert int(_mass_centroid(mass, 32)) == 24
        # clamping and even-floor
        assert int(_mass_centroid(jnp.zeros(32).at[1].set(1.0), 32)) == 4
        assert int(_mass_centroid(jnp.zeros(32).at[31].set(1.0), 32)) == 28
        uniform = jnp.ones(32)
        c = int(_mass_centroid(uniform, 32))
        assert abs(c - 16) <= 2

    def test_split_follows_bright_blob(self):
        """An interior bright blob must pull the sown (cx, cy_t, cy_b)
        split toward it — the adaptive property the reference's
        get_centroid encodes (Non_local_family.py:142-166)."""
        from glsdet_tpu.models.variants import PatchConvNonLocalAdapt

        m = PatchConvNonLocalAdapt(out_channels=12)
        rs = np.random.RandomState(8)
        base = rs.rand(1, 32, 32, 8).astype(np.float32) * 0.01
        blob = base.copy()
        blob[:, 20:26, 22:28] += 5.0
        v = m.init(RNG, jnp.asarray(base), train=False)

        def centroids(arr):
            _, inter = m.apply(v, jnp.asarray(arr), train=False,
                               capture_intermediates=True,
                               mutable=["intermediates"])
            return np.asarray(
                inter["intermediates"]["centroids"][0])

        c_blob = centroids(blob)
        assert 18 <= c_blob[0] <= 26, c_blob   # row split at the blob
        # the blob half's column split lands on the blob
        assert 20 <= max(c_blob[1], c_blob[2]) <= 28, c_blob
