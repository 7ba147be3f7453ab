"""Remat (jax.checkpoint) model variants: identical params/outputs/grads.

``remat=True`` on ResNet/GFLHead/MPHead recomputes block and tower
activations in the backward instead of saving them — the param tree,
init values, forward outputs, and gradients (up to float reassociation)
must all be unchanged, so checkpoints and configs are interchangeable
between remat settings.
"""

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.models import MPDet


def _tree_max_rel_diff(a, b):
    rel = jax.tree_util.tree_map(
        lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()
                           / (np.abs(np.asarray(y)).max() + 1e-9)), a, b)
    return max(jax.tree_util.tree_leaves(rel))


def test_remat_mpdet_parity():
    rng = jax.random.PRNGKey(0)
    x = jnp.linspace(0, 1, 1 * 64 * 64 * 3).reshape(1, 64, 64, 3)
    m0 = MPDet(num_classes=4, depth=18, proxies_list=(2, 2, 2, 2),
               remat=False)
    m1 = MPDet(num_classes=4, depth=18, proxies_list=(2, 2, 2, 2),
               remat=True)
    v0 = m0.init(rng, x, train=False)
    v1 = m1.init(rng, x, train=False)
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1))
    assert _tree_max_rel_diff(v0, v1) == 0.0  # init values identical

    o0 = m0.apply(v0, x, train=False)
    o1 = m1.apply(v0, x, train=False)
    for a, b in zip(o0[0] + o0[1], o1[0] + o1[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def mk(mm):
        def loss(p):
            out, _ = mm.apply(
                {"params": p, "batch_stats": v0["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return (sum(o.sum() for o in out[0])
                    + sum(o.sum() for o in out[1]))
        return loss

    g0 = jax.jit(jax.grad(mk(m0)))(v0["params"])
    g1 = jax.jit(jax.grad(mk(m1)))(v0["params"])
    assert _tree_max_rel_diff(g1, g0) < 1e-4
