"""Seeded determinism tests.

SURVEY.md §5: the reference's only "race detection" is cudnn determinism
knobs; the rebuild's guarantee is stronger — pure-functional training is
bit-deterministic given the seed.  These tests pin that property.
"""

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.models import VISDRONE_PROXIES, YOLOXDetector, MPDet
from glsdet_tpu.train import (TrainState, init_boiw, make_mpdet_train_step,
                              make_yolox_train_step, yolox_sgd,
                              yolox_warm_cos)


def _batch(rng):
    B, H, W, G = 2, 64, 64, 4
    return {
        "images": jax.random.normal(rng, (B, H, W, 3)) * 0.1,
        "gt_boxes": jnp.tile(jnp.array([[8.0, 8.0, 40.0, 40.0]]),
                             (B, G, 1)),
        "gt_labels": jnp.zeros((B, G), jnp.int32),
        "gt_valid": jnp.zeros((B, G), bool).at[:, 0].set(True),
    }


def _run_yolox(seed, steps=3):
    rng = jax.random.PRNGKey(seed)
    batch = _batch(rng)
    model = YOLOXDetector(num_classes=5, phi="nano")
    variables = model.init(rng, batch["images"], train=False)
    tx = yolox_sgd(yolox_warm_cos(0.01, 10, 100, 10))
    state = TrainState.create(variables, tx, rng)
    step = jax.jit(make_yolox_train_step(model, tx, (64, 64)))
    losses = []
    for _ in range(steps):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    return losses, state


def test_yolox_training_bit_deterministic():
    l1, s1 = _run_yolox(0)
    l2, s2 = _run_yolox(0)
    assert l1 == l2
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s1.params, s2.params)


def test_different_seed_differs():
    l1, _ = _run_yolox(0)
    l2, _ = _run_yolox(1)
    assert l1 != l2


def test_mpdet_boiw_rng_deterministic():
    """The BoIW random sampling threads an explicit PRNG key — two runs
    with the same seed must produce identical dictionary contents."""
    def run():
        rng = jax.random.PRNGKey(7)
        batch = _batch(rng)
        model = MPDet(num_classes=10, depth=18)
        variables = model.init(rng, batch["images"], train=False)
        tx = yolox_sgd(yolox_warm_cos(0.01, 10, 100, 10))
        boiw = init_boiw(rng, 10, 8, 256, VISDRONE_PROXIES)
        state = TrainState.create(variables, tx, rng, boiw=boiw)
        step = jax.jit(make_mpdet_train_step(
            model, tx, (64, 64), 10, VISDRONE_PROXIES))
        state, _ = step(state, batch)
        return np.asarray(state.boiw.embedding), np.asarray(state.boiw.ptr)

    e1, p1 = run()
    e2, p2 = run()
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(p1, p2)
