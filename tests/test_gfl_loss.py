"""GFL / MP loss numerics (reference idiom: controlled zero/positive
cases, tests/test_metrics/test_losses.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from glsdet_tpu.models.mp_head import VISDRONE_PROXIES, proxy_class_matrix
from glsdet_tpu.ops.integral import bbox2distance
from glsdet_tpu.ops.priors import grid_anchors
from glsdet_tpu.train.boiw import init_boiw
from glsdet_tpu.train.gfl_loss import gfl_loss, gfl_targets
from glsdet_tpu.train.mp_loss import contrastive_loss, mp_loss, ot_proxy_loss

STRIDES = (8, 16, 32, 64, 128)


def _setup(hw=64, g=4):
    anchors_np, counts = grid_anchors((hw, hw), STRIDES, 8.0)
    anchors = jnp.asarray(anchors_np)
    centers = (anchors[:, :2] + anchors[:, 2:4]) / 2.0
    strides = jnp.concatenate([
        jnp.full((n,), s, jnp.float32) for n, s in zip(counts, STRIDES)])
    gtb = jnp.zeros((1, g, 4)).at[0, 0].set(jnp.asarray([8., 8., 48., 48.]))
    gtl = jnp.zeros((1, g), jnp.int32)
    gtv = jnp.zeros((1, g), bool).at[0, 0].set(True)
    t = gfl_targets(anchors, counts, gtb, gtl, gtv, 10)
    return anchors, counts, centers, strides, t


class TestGFLLoss:
    def test_perfect_prediction_near_zero_bbox(self):
        anchors, counts, centers, strides, t = _setup()
        a = anchors.shape[0]
        # build bbox logits whose integral decodes to the exact distances
        tgt_dist = bbox2distance(centers[None] / strides[None, :, None],
                                 t.bbox_targets / strides[None, :, None],
                                 16)
        bins = jnp.clip(jnp.round(tgt_dist), 0, 16).astype(jnp.int32)
        logits = 40.0 * jax.nn.one_hot(bins, 17).reshape(1, a, 68)
        # confident correct class scores at positives
        cls = jnp.where(
            (t.labels[..., None] == jnp.arange(10)[None, None, :]),
            4.0, -12.0)
        out = gfl_loss(cls, logits, t, centers, strides, 10)
        # GIoU loss small: only integer-bin rounding error remains
        assert float(out.loss_bbox) < 0.2
        assert float(out.total) < 2.0

    def test_positive_count(self):
        _, _, _, _, t = _setup()
        assert int(t.pos_mask.sum()) > 0
        assert set(np.asarray(t.labels[t.pos_mask]).tolist()) == {0}

    def test_no_gt_gives_bg_loss_only(self):
        anchors, counts, centers, strides, _ = _setup()
        a = anchors.shape[0]
        gtb = jnp.zeros((1, 4, 4))
        gtv = jnp.zeros((1, 4), bool)
        t = gfl_targets(anchors, counts, gtb, jnp.zeros((1, 4), jnp.int32),
                        gtv, 10)
        cls = jnp.full((1, a, 10), -12.0)
        out = gfl_loss(cls, jnp.zeros((1, a, 68)), t, centers, strides, 10)
        assert float(out.loss_bbox) == 0.0
        assert float(out.loss_cls) < 0.1


class TestMPLossParts:
    def test_contrastive_prefers_own_class_words(self):
        c = 16
        emb = jax.random.normal(jax.random.PRNGKey(0), (3, 4, c))
        # feature identical to a class-1 word
        f = emb[1, 0][None]
        l_own = float(contrastive_loss(f, jnp.asarray([1]), emb,
                                       jnp.asarray(1.0)))
        l_other = float(contrastive_loss(f, jnp.asarray([0]), emb,
                                         jnp.asarray(1.0)))
        assert l_own < l_other

    def test_ot_loss_zero_when_no_positives(self):
        f = jax.random.normal(jax.random.PRNGKey(0), (32, 16))
        labels = jnp.full((32,), 10, jnp.int32)  # all background
        proxies = jax.random.normal(jax.random.PRNGKey(1), (42, 16))
        prob = jnp.concatenate([jnp.full((n,), 1.0 / n)
                                for n in VISDRONE_PROXIES])
        loss = float(ot_proxy_loss(f, labels, proxies, prob,
                                   VISDRONE_PROXIES))
        assert loss == 0.0

    def test_ot_loss_lower_for_aligned_features(self):
        key = jax.random.PRNGKey(0)
        proxies = jax.random.normal(key, (42, 16))
        prob = jnp.concatenate([jnp.full((n,), 1.0 / n)
                                for n in VISDRONE_PROXIES])
        labels = jnp.zeros((8,), jnp.int32)  # class 0 -> proxies 0..1
        aligned = jnp.tile(proxies[0][None], (8, 1))
        random_f = jax.random.normal(jax.random.PRNGKey(2), (8, 16))
        l_aligned = float(ot_proxy_loss(aligned, labels, proxies, prob,
                                        VISDRONE_PROXIES))
        l_random = float(ot_proxy_loss(random_f, labels, proxies, prob,
                                       VISDRONE_PROXIES))
        assert l_aligned < l_random
