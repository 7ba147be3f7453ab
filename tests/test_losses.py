"""Loss unit tests vs numpy oracles (reference idiom: controlled cases
where the loss is zero/positive — tests/test_metrics/test_losses.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.losses import (
    bce_with_logits,
    distribution_focal_loss,
    giou_loss,
    iou_loss,
    quality_focal_loss,
    sigmoid_focal_loss,
)


def np_sigmoid(x):
    return 1 / (1 + np.exp(-x))


class TestBCE:
    def test_matches_numpy(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(32).astype(np.float32) * 3
        tgt = rng.rand(32).astype(np.float32)
        got = np.asarray(bce_with_logits(jnp.asarray(logits),
                                         jnp.asarray(tgt)))
        p = np_sigmoid(logits)
        want = -(tgt * np.log(p) + (1 - tgt) * np.log(1 - p))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_extreme_logits_finite(self):
        logits = jnp.asarray([100.0, -100.0])
        tgt = jnp.asarray([0.0, 1.0])
        out = np.asarray(bce_with_logits(logits, tgt))
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(out, [100.0, 100.0], rtol=1e-6)


class TestQFL:
    def test_background_only(self):
        # all background, tiny sigmoid -> loss ~ p^beta * bce ~ small
        logits = jnp.full((4, 3), -10.0)
        labels = jnp.full((4,), 3, jnp.int32)
        quality = jnp.zeros((4,))
        loss = np.asarray(quality_focal_loss(logits, labels, quality, 3))
        assert loss.shape == (4,)
        assert np.all(loss >= 0) and np.all(loss < 1e-3)

    def test_perfect_prediction_near_zero(self):
        # positive with quality q: loss at sigma == q is zero
        q = 0.7
        logit = np.log(q / (1 - q))
        logits = jnp.asarray([[logit, -20.0]])
        labels = jnp.asarray([0], jnp.int32)
        quality = jnp.asarray([q])
        loss = float(quality_focal_loss(logits, labels, quality, 2)[0])
        assert loss < 1e-6

    def test_oracle(self):
        rng = np.random.RandomState(1)
        n, c = 16, 5
        logits = rng.randn(n, c).astype(np.float32)
        labels = rng.randint(0, c + 1, n)
        quality = rng.rand(n).astype(np.float32) * (labels < c)
        got = np.asarray(quality_focal_loss(
            jnp.asarray(logits), jnp.asarray(labels),
            jnp.asarray(quality), c))
        # numpy oracle (gfocal_loss.py:82 semantics)
        sig = np_sigmoid(logits)
        bce0 = -(np.log(1 - sig))
        want = bce0 * sig ** 2
        for i in range(n):
            if labels[i] < c:
                j = labels[i]
                q = quality[i]
                bce = -(q * np.log(sig[i, j]) + (1 - q) * np.log(1 - sig[i, j]))
                want[i, j] = bce * abs(q - sig[i, j]) ** 2
        np.testing.assert_allclose(got, want.sum(-1), rtol=2e-4, atol=1e-6)


class TestDFL:
    def test_integer_target_is_ce(self):
        logits = jnp.asarray(np.random.RandomState(2).randn(4, 17),
                             jnp.float32)
        target = jnp.asarray([3.0, 0.0, 15.0, 7.0])
        got = np.asarray(distribution_focal_loss(logits, target))
        logp = np.asarray(jax.nn.log_softmax(logits, -1))
        want = -logp[np.arange(4), [3, 0, 15, 7]]
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_fractional_target_interpolates(self):
        logits = jnp.zeros((1, 17))
        # uniform distribution: loss = -(wl+wr) * log(1/17) = log(17)
        got = float(distribution_focal_loss(logits, jnp.asarray([4.3]))[0])
        np.testing.assert_allclose(got, np.log(17), rtol=1e-6)


class TestIoULosses:
    def test_giou_identical_zero(self):
        b = jnp.asarray([[0.0, 0, 10, 10]])
        assert abs(float(giou_loss(b, b)[0])) < 1e-6

    def test_giou_disjoint_positive(self):
        a = jnp.asarray([[0.0, 0, 10, 10]])
        b = jnp.asarray([[20.0, 20, 30, 30]])
        assert float(giou_loss(a, b)[0]) > 1.0

    def test_iou_square_mode(self):
        a = jnp.asarray([[0.0, 0, 10, 10]])
        b = jnp.asarray([[0.0, 0, 10, 5]])
        # iou = 0.5 -> 1 - 0.25
        np.testing.assert_allclose(float(iou_loss(a, b)[0]), 0.75, rtol=1e-5)


class TestFocal:
    def test_oracle(self):
        rng = np.random.RandomState(3)
        n, c = 12, 4
        logits = rng.randn(n, c).astype(np.float32)
        labels = rng.randint(0, c + 1, n)
        got = np.asarray(sigmoid_focal_loss(
            jnp.asarray(logits), jnp.asarray(labels), c))
        sig = np_sigmoid(logits)
        onehot = np.zeros((n, c))
        for i in range(n):
            if labels[i] < c:
                onehot[i, labels[i]] = 1
        pt = sig * onehot + (1 - sig) * (1 - onehot)
        at = 0.25 * onehot + 0.75 * (1 - onehot)
        ce = -(onehot * np.log(sig) + (1 - onehot) * np.log(1 - sig))
        want = (at * (1 - pt) ** 2 * ce).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
