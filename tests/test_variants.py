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
