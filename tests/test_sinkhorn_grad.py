"""Sinkhorn gradient semantics: backprop-through-the-loop vs envelope.

The reference differentiates THROUGH the torch scaling loop
(mp_head.py:156-182: plain tensor ops under autograd, loss_op = sum(plan
* cost) at :254-270).  These tests pin, against central finite
differences, that (a) the differentiable-scan sinkhorn reproduces that
loop gradient exactly, and (b) the envelope shortcut (stop_gradient on
the plan, i.e. grad = P*) is NOT that gradient — the correction term
<dP*/dC, C> is tens of percent of the total — which is why
ot_proxy_loss must backprop through the iterations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glsdet_tpu.ops.sinkhorn import sinkhorn
from glsdet_tpu.train.mp_loss import ot_proxy_loss


def _fixture(n=6, m=3, seed=0):
    rs = np.random.RandomState(seed)
    cost = jnp.asarray(rs.rand(n, m), jnp.float64)
    ut = jnp.asarray(rs.dirichlet(np.ones(m)), jnp.float64)
    return cost, ut


class TestSinkhornGrad:
    def test_scan_matches_while_forward(self):
        # the while_loop early-stops at stop_thr (1e-8 on the alpha L1
        # change) while the scan always runs num_iters — forward values
        # agree to the convergence threshold, not bit-exactly
        with jax.enable_x64(True):
            cost, ut = _fixture()
            a = sinkhorn(cost, target_marginal=ut, num_iters=200)
            b = sinkhorn(cost, target_marginal=ut, num_iters=200,
                         differentiable=True)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-8)

    def test_loop_grad_matches_finite_differences(self):
        with jax.enable_x64(True):
            cost, ut = _fixture()

            def loss(c, iters=300):
                return jnp.sum(sinkhorn(c, target_marginal=ut,
                                        num_iters=iters,
                                        differentiable=True) * c)

            g = np.asarray(jax.grad(loss)(cost))
            eps = 1e-6
            fd = np.zeros_like(g)
            for i in range(g.shape[0]):
                for j in range(g.shape[1]):
                    e = np.zeros_like(g)
                    e[i, j] = eps
                    fd[i, j] = (float(loss(cost + e, 2000))
                                - float(loss(cost - e, 2000))) / (2 * eps)
            np.testing.assert_allclose(g, fd, rtol=1e-5, atol=1e-8)

    def test_envelope_shortcut_is_not_the_loop_grad(self):
        """Documents the round-1 bug: grad of sum(sg(plan) * cost) is
        the plan itself, which differs from the true loop gradient by a
        material margin (the reason ot_proxy_loss now differentiates
        through the scan)."""
        with jax.enable_x64(True):
            cost, ut = _fixture()

            def loss(c):
                return jnp.sum(sinkhorn(c, target_marginal=ut,
                                        num_iters=300,
                                        differentiable=True) * c)

            def loss_sg(c):
                return jnp.sum(jax.lax.stop_gradient(
                    sinkhorn(c, target_marginal=ut, num_iters=300,
                             differentiable=True)) * c)

            g = np.asarray(jax.grad(loss)(cost))
            g_sg = np.asarray(jax.grad(loss_sg)(cost))
            rel = np.max(np.abs(g - g_sg)) / np.max(np.abs(g))
            assert rel > 0.01, f"envelope shortcut unexpectedly close: {rel}"

    def test_row_mask_grad_zero_and_finite(self):
        """Masked (padding) rows must receive exactly zero gradient and
        the whole gradient must stay finite in float32 (the training
        dtype) even with few live rows."""
        cost, ut = _fixture()
        cost32 = cost.astype(jnp.float32)
        mask = jnp.asarray([True, True, False, False, False, False])

        def loss(c):
            return jnp.sum(sinkhorn(c, target_marginal=ut.astype(
                jnp.float32), num_iters=100, row_mask=mask,
                differentiable=True) * c)

        g = np.asarray(jax.grad(loss)(cost32))
        assert np.all(np.isfinite(g))
        assert np.all(g[2:] == 0.0)
        assert np.any(g[:2] != 0.0)


class TestOTProxyLossGrad:
    """End-to-end through ot_proxy_loss (cost built from features and
    proxies, per-class padding, empty classes)."""

    def _setup(self, seed=1):
        rs = np.random.RandomState(seed)
        proxies_list = (2, 3, 2)
        n, c = 10, 8
        feats = jnp.asarray(rs.randn(n, c), jnp.float64)
        proxies = jnp.asarray(rs.randn(sum(proxies_list), c), jnp.float64)
        prob = rs.dirichlet(np.ones(sum(proxies_list)))
        # class 2 is empty (only labels 0, 1 and background 3)
        labels = jnp.asarray(rs.choice([0, 1, 3], size=n), jnp.int32)
        return feats, labels, proxies, jnp.asarray(prob), proxies_list

    def test_grad_matches_finite_differences(self):
        with jax.enable_x64(True):
            feats, labels, proxies, prob, plist = self._setup()

            def loss(f):
                return ot_proxy_loss(f, labels, proxies, prob, plist,
                                     max_pos_per_class=6, num_iters=300)

            g = np.asarray(jax.grad(loss)(feats))
            assert np.all(np.isfinite(g))
            eps = 1e-6
            rs = np.random.RandomState(7)
            # spot-check 12 random coordinates (full FD is 80 evals)
            for _ in range(12):
                i = rs.randint(feats.shape[0])
                j = rs.randint(feats.shape[1])
                e = np.zeros(feats.shape)
                e[i, j] = eps
                fd = (float(loss(feats + e)) - float(loss(feats - e))) \
                    / (2 * eps)
                np.testing.assert_allclose(g[i, j], fd, rtol=1e-4,
                                           atol=1e-9)

    def test_empty_class_grad_finite_f32(self):
        feats, labels, proxies, prob, plist = self._setup()
        f32 = feats.astype(jnp.float32)

        def loss(f):
            return ot_proxy_loss(f, labels,
                                 proxies.astype(jnp.float32),
                                 prob.astype(jnp.float32), plist,
                                 max_pos_per_class=6)

        g = np.asarray(jax.grad(loss)(f32))
        assert np.all(np.isfinite(g))
