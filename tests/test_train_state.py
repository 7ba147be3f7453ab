"""Train-state tests: schedules, EMA, BoIW ring buffer, OT update."""

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.train.boiw import (
    enable_emd_training,
    init_boiw,
    update_dictionary,
    update_ot,
)
from glsdet_tpu.train.schedules import (
    ema_momentum,
    epoch_step_decay,
    schedule_1x,
    yolox_warm_cos,
)

PROXIES = (2, 3)


class TestSchedules:
    def test_yolox_warmup_quadratic(self):
        s = yolox_warm_cos(1.0, warmup_steps=100, total_steps=1000,
                           no_aug_steps=100)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(50)), 0.25, rtol=1e-6)
        np.testing.assert_allclose(float(s(100)), 1.0, rtol=1e-6)

    def test_yolox_cos_floor_last_epochs(self):
        s = yolox_warm_cos(1.0, 100, 1000, 100, min_lr_ratio=0.05)
        np.testing.assert_allclose(float(s(950)), 0.05, rtol=1e-6)
        # cosine midpoint
        mid = float(s(100 + 400))
        np.testing.assert_allclose(mid, 0.525, rtol=1e-5)

    def test_step_decay(self):
        s = epoch_step_decay(1.0, steps_per_epoch=10, gamma=0.5)
        assert float(s(5)) == 1.0
        assert float(s(15)) == 0.5
        assert float(s(25)) == 0.25

    def test_schedule_1x_milestones(self):
        s = schedule_1x(1.0, steps_per_epoch=10, warmup_steps=0,
                        milestones=(8, 11))
        assert float(s(70)) == 1.0       # epoch 7
        np.testing.assert_allclose(float(s(85)), 0.1)   # epoch 8
        np.testing.assert_allclose(float(s(115)), 0.01)  # epoch 11

    def test_ema_momentum_decays_to_base(self):
        m0 = float(ema_momentum(0))
        m_inf = float(ema_momentum(100000))
        assert m0 > 0.9
        np.testing.assert_allclose(m_inf, 0.0002, rtol=1e-3)


class TestBoIW:
    def _state(self, num_words=8, c=4):
        return init_boiw(jax.random.PRNGKey(0), len(PROXIES), num_words, c,
                         PROXIES)

    def test_init_shapes_and_probs(self):
        st = self._state()
        assert st.embedding.shape == (3, 8, 4)
        assert st.ptr.shape == (3,)
        np.testing.assert_allclose(
            np.asarray(st.proxies_prob), [0.5, 0.5, 1 / 3, 1 / 3, 1 / 3],
            rtol=1e-6)
        assert float(st.beta) == 0.0

    def test_update_writes_and_advances_ptr(self):
        st = self._state()
        feats = jnp.arange(24, dtype=jnp.float32).reshape(6, 4)
        labels = jnp.asarray([0, 0, 0, 1, 2, 2], jnp.int32)
        new = update_dictionary(st, jax.random.PRNGKey(1), feats, labels,
                                max_step=10)
        assert list(np.asarray(new.ptr)) == [3, 1, 2]
        # class-1 slot 0 must now hold the single class-1 feature
        np.testing.assert_allclose(
            np.asarray(new.embedding[1, 0]), np.asarray(feats[3]))

    def test_ring_wraparound(self):
        st = self._state(num_words=4)
        feats = jnp.ones((6, 4))
        labels = jnp.zeros((6,), jnp.int32)
        new = update_dictionary(st, jax.random.PRNGKey(1), feats, labels,
                                max_step=3)
        new = update_dictionary(new, jax.random.PRNGKey(2), feats, labels,
                                max_step=3)
        # 3 + 3 = 6 mod 4 = 2
        assert int(new.ptr[0]) == 2
        np.testing.assert_allclose(np.asarray(new.embedding[0]),
                                   np.ones((4, 4)))

    def test_update_ot_rewrites_probs(self):
        st = self._state(num_words=8)
        # two tight clusters of different sizes for class 0
        emb = np.array(st.embedding)
        emb[0, :6] = [1, 0, 0, 0]
        emb[0, 6:] = [0, 1, 0, 0]
        st = st._replace(embedding=jnp.asarray(emb))
        new = update_ot(st, jax.random.PRNGKey(3), PROXIES,
                        kmeans_iters=10, restarts=4)
        p = np.asarray(new.proxies_prob)[:2]
        np.testing.assert_allclose(sorted(p), [0.25, 0.75], atol=1e-6)
        # probs ascending within class (reference sorts ascending)
        assert p[0] <= p[1]

    def test_enable_emd(self):
        st = enable_emd_training(self._state())
        assert float(st.beta) == 1.0


class TestScanStep:
    """Scan-group train step == K sequential single steps."""

    def _setup(self):
        from glsdet_tpu.models import YOLOXDetector
        from glsdet_tpu.train import (
            TrainState, make_scan_train_step, make_yolox_train_step,
            stack_batches, yolox_sgd, yolox_warm_cos)

        hw = (64, 64)
        model = YOLOXDetector(num_classes=5, phi="nano")
        rng = jax.random.PRNGKey(0)
        images = jnp.zeros((2, *hw, 3), jnp.float32)
        variables = jax.jit(
            lambda r, x: model.init(r, x, train=False))(rng, images)
        tx = yolox_sgd(yolox_warm_cos(0.01, 10, 100, 10))
        state = TrainState.create(variables, tx, rng)
        step = make_yolox_train_step(model, tx, hw, normalize=True)
        rs = np.random.RandomState(0)
        batches = []
        for _ in range(3):
            b = {
                "images": rs.randint(0, 255, (2, *hw, 3)).astype(np.uint8),
                "gt_boxes": np.tile(
                    np.array([[4.0, 4.0, 40.0, 40.0]], np.float32),
                    (2, 4, 1)),
                "gt_labels": rs.randint(0, 5, (2, 4)).astype(np.int32),
                "gt_valid": np.zeros((2, 4), bool),
            }
            b["gt_valid"][:, :2] = True
            batches.append(b)
        return state, step, batches, make_scan_train_step, stack_batches

    def test_scan_step_equivalence(self):
        state, step, batches, make_scan, stack = self._setup()
        seq_state = state
        jit_step = jax.jit(step)
        for b in batches:
            seq_state, seq_metrics = jit_step(
                seq_state, {k: jnp.asarray(v) for k, v in b.items()})

        scan_step = jax.jit(make_scan(step))
        scan_state, scan_metrics = scan_step(state, stack(batches))

        # stacked metrics: (K,) per key; last row matches the last
        # sequential step
        assert scan_metrics["loss"].shape == (3,)
        np.testing.assert_allclose(
            float(scan_metrics["loss"][-1]), float(seq_metrics["loss"]),
            rtol=2e-5)
        flat_a = jax.tree_util.tree_leaves(seq_state.params)
        flat_b = jax.tree_util.tree_leaves(scan_state.params)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=2e-4, atol=2e-5)
        assert int(scan_state.step) == int(seq_state.step) == 3

    def test_scan_step_donatable(self):
        state, step, batches, make_scan, stack = self._setup()
        scan_step = jax.jit(make_scan(step), donate_argnums=(0,))
        new_state, metrics = scan_step(state, stack(batches))
        assert np.isfinite(float(metrics["loss"][-1]))
        assert int(new_state.step) == 3
