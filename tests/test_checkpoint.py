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
from glsdet_tpu.train.loop import (load_weights, restore_checkpoint,
                                   restore_raw, save_checkpoint)


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


class TestLoadWeights:
    """load_from semantics: weights merge, trajectory stays fresh."""

    def test_weights_load_trajectory_fresh(self):
        state, _ = _make_state()
        state = state.replace(
            step=jnp.asarray(99, jnp.int32),
            params=jax.tree.map(lambda p: p + 2.0, state.params))
        with tempfile.TemporaryDirectory() as d:
            path = save_checkpoint(d, state, epoch=1)
            fresh, _ = _make_state()
            loaded, n_loaded, skipped = load_weights(path, fresh)
        assert n_loaded > 0 and not skipped
        assert int(loaded.step) == 0          # trajectory NOT restored
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            state.params, loaded.params)

    def test_shape_mismatch_skipped(self):
        """yolox-drone train.py:139-165 partial load: mismatched heads
        keep their fresh init, backbone weights still load."""
        state3, _ = _make_state()   # 3 classes
        with tempfile.TemporaryDirectory() as d:
            path = save_checkpoint(d, state3, epoch=1)
            rng = jax.random.PRNGKey(1)
            model5 = YOLOXDetector(num_classes=5, phi="nano")
            variables = model5.init(rng, jnp.zeros((1, 64, 64, 3)),
                                    train=False)
            tx = yolox_sgd(yolox_warm_cos(0.01, 10, 100, 10))
            fresh = TrainState.create(variables, tx, rng)
            loaded, n_loaded, skipped = load_weights(path, fresh)
        assert n_loaded > 0
        assert skipped and all("shape" in r for _, r in skipped)

    def test_stripped_artifact_roundtrip(self):
        """ckpt_tool strip -> load_from: weights-only artifacts load,
        missing ema seeds from params."""
        import orbax.checkpoint as ocp

        state, _ = _make_state(with_boiw=True)
        state = state.replace(
            params=jax.tree.map(lambda p: p + 3.0, state.params))
        with tempfile.TemporaryDirectory() as d:
            path = save_checkpoint(d, state, epoch=1)
            raw = restore_raw(path)
            stripped = {k: raw[k] for k in ("params", "batch_stats",
                                            "boiw")}
            spath = os.path.join(d, "stripped")
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(spath, jax.tree.map(np.asarray, stripped))
            ckptr.wait_until_finished()
            fresh, _ = _make_state(with_boiw=True)
            loaded, n_loaded, skipped = load_weights(spath, fresh)
        assert n_loaded > 0
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            state.params, loaded.params)
        # EMA seeded from the stripped params, not fresh init
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            state.params, loaded.ema_params)
