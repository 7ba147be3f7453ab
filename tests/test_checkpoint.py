"""Checkpoint/resume round-trip tests (orbax).

Reference semantics (SURVEY.md §5): CheckpointHook writes epoch_N;
``--resume-from`` restores optimizer+iter; EMA weights and the MPHead
BoIW dictionary buffers persist in checkpoints (mp_head.py:78-81).
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.models import VISDRONE_PROXIES, YOLOXDetector
from glsdet_tpu.train import (TrainState, init_boiw, yolox_sgd,
                              yolox_warm_cos)
from glsdet_tpu.train.loop import restore_checkpoint, save_checkpoint


def _make_state(with_boiw=False):
    rng = jax.random.PRNGKey(0)
    model = YOLOXDetector(num_classes=3, phi="nano")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(rng, x, train=False)
    tx = yolox_sgd(yolox_warm_cos(0.01, 10, 100, 10))
    boiw = init_boiw(rng, 3, 8, 16, (1, 2)) if with_boiw else None
    if with_boiw:
        boiw = init_boiw(rng, 2, 8, 16, (1, 2))
    return TrainState.create(variables, tx, rng, boiw=boiw), tx


class TestCheckpoint:
    def test_roundtrip_params_and_step(self):
        state, _ = _make_state()
        state = state.replace(step=jnp.asarray(42, jnp.int32))
        with tempfile.TemporaryDirectory() as d:
            path = save_checkpoint(d, state, epoch=7)
            assert os.path.basename(path) == "epoch_7"
            fresh, _ = _make_state()
            restored = restore_checkpoint(path, fresh)
        assert int(restored.step) == 42
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            state.params, restored.params)

    def test_boiw_buffers_persist(self):
        state, _ = _make_state(with_boiw=True)
        emb = np.asarray(state.boiw.embedding) + 5.0
        state = state.replace(
            boiw=state.boiw._replace(
                embedding=jnp.asarray(emb),
                ptr=state.boiw.ptr.at[0].set(3)))
        with tempfile.TemporaryDirectory() as d:
            path = save_checkpoint(d, state, epoch=1)
            fresh, _ = _make_state(with_boiw=True)
            restored = restore_checkpoint(path, fresh)
        np.testing.assert_array_equal(
            np.asarray(restored.boiw.embedding), emb)
        assert int(restored.boiw.ptr[0]) == 3

    def test_ema_params_persist(self):
        state, _ = _make_state()
        bumped = jax.tree.map(lambda p: p + 1.0, state.ema_params)
        state = state.replace(ema_params=bumped)
        with tempfile.TemporaryDirectory() as d:
            path = save_checkpoint(d, state, epoch=2)
            fresh, _ = _make_state()
            restored = restore_checkpoint(path, fresh)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            bumped, restored.ema_params)
