"""Multi-step training-TRAJECTORY parity vs the torch reference.

Forward/loss parity (test_torch_parity.py, test_loss_variant_parity.py)
pins single evaluations; these tests pin that K OPTIMIZER STEPS evolve
the weights the same way — the strongest AP-parity proxy available
without real VisDrone data, and the only test class that can catch
optimizer-semantics bugs (weight-decay placement/masking, nesterov
formulation, grad-clip ordering, momentum-buffer init).

Three layers:

1. ``test_yolox_lockstep_trajectory_parity`` — the ACTUAL reference
   YoloBody + baseline YOLOLoss + the yolox 8x8 SGD recipe (momentum
   0.9, nesterov, wd 5e-4 with norm/bias exemption —
   yolox-ufp/configs/yolox/yolox_s_8x8_300e_coco.py optimizer) trained
   in torch, vs ``make_yolox_train_step`` + ``yolox_sgd``.  Each step
   starts LOCK-STEP from the torch state (params, BN stats, momentum
   buffers transplanted), takes one step on both sides, and compares
   the post-step states tightly.  Free-running both trainers instead
   diverges chaotically (SimOTA assignment flips amplify float noise
   ~1e-5 -> 14% by step 5 — measured), which would say nothing about
   semantics; lock-step isolates exactly the update rule at every state
   the real torch trajectory visits.

2. ``test_mp_det_sgd_optimizer_parity`` — the MP-Det recipe (SGD
   momentum 0.9, wd 1e-4 on ALL params, grad-clip 35; mmcv
   OptimizerHook order: clip grads -> SGD applies wd+momentum —
   configs/_base_/schedules/schedule_1x.py + mmdet/apis/train.py) on a
   small smooth model where K free-running steps stay tight.  The loss
   is scaled so the clip BINDS on early steps.

3. ``test_mpdet_state_evolution`` — K production MP-Det steps evolve
   the EMA per the mmdet ExpMomentumEMAHook formula (independent numpy
   recomputation) and the BoIW ring buffer monotonically.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/yolox-drone"
torch = pytest.importorskip("torch")

NC, PHI, H, W, B, G, K = 7, "nano", 64, 64, 2, 3, 5
# 1e-3: per-step float noise between the torch and XLA executions is
# ~5e-5 max-leaf at this lr (scales linearly with lr — measured 5e-4 at
# lr 1e-2), so the 3e-4 tolerance keeps ~6x margin over noise while any
# optimizer-semantics bug (wrong wd placement, nesterov form, momentum
# init) shows up at drift scale (~0.1)
LR = 0.001


@pytest.fixture(scope="module")
def ref_mods():
    if not os.path.isdir(REF):
        pytest.skip("reference repo not present")
    sys.path.insert(0, REF)
    try:
        import importlib

        yield (importlib.import_module("models.base.yolox"),
               importlib.import_module("models.base.yolox_losses"))
    finally:
        sys.path.remove(REF)
        for name in [n for n in sys.modules if n == "models"
                     or n.startswith("models.")]:
            del sys.modules[name]


def _batches(seed: int, k: int):
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(k):
        img = rs.rand(B, H, W, 3).astype(np.float32)
        cx = rs.uniform(14, 50, (B, G))
        cy = rs.uniform(14, 50, (B, G))
        w = rs.uniform(8, 20, (B, G))
        h = rs.uniform(8, 20, (B, G))
        c = rs.randint(0, NC, (B, G))
        out.append((img, cx, cy, w, h, c))
    return out


def _torch_state_np(ref):
    return {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}


def test_yolox_lockstep_trajectory_parity(ref_mods):
    import jax
    import jax.numpy as jnp

    from glsdet_tpu.models import YOLOXDetector
    from glsdet_tpu.train import (TrainState, make_yolox_train_step,
                                  yolox_sgd)
    from glsdet_tpu.utils.torch_import import convert_yolox_drone

    yolox_mod, loss_mod = ref_mods
    torch.manual_seed(42)
    ref = yolox_mod.YoloBody(NC, PHI)
    g = torch.Generator().manual_seed(7)
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.rand(m.running_mean.shape, generator=g) - 0.5)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) * 0.8 + 0.4)

    model = YOLOXDetector(num_classes=NC, phi=PHI)
    template = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, H, W, 3)), train=False))(jax.random.PRNGKey(0))

    # torch trainer: the yolox 8x8 recipe (paramwise norm/bias exemption
    # == the rank>=2 mask in train/schedules.py yolox_sgd)
    ref_loss = loss_mod.YOLOLoss(NC)
    names, decay, no_decay = [], [], []
    for n, p in ref.named_parameters():
        names.append((n, p))
        (decay if p.ndim >= 2 else no_decay).append(p)
    opt = torch.optim.SGD(
        [{"params": decay, "weight_decay": 5e-4},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=LR, momentum=0.9, nesterov=True)
    ref.train()

    tx = yolox_sgd(lambda step: LR)
    step_fn = jax.jit(make_yolox_train_step(model, tx, (H, W)))

    def momentum_pytree():
        """Torch momentum buffers -> the optax trace pytree, via the
        same name conversion the weights use (buffers are param-shaped,
        so the weight converter maps them 1:1; BN running stats ride
        along and are discarded with the batch_stats half)."""
        sd = _torch_state_np(ref)  # for BN stats keys the converter expects
        for n, p in names:
            buf = opt.state.get(p, {}).get("momentum_buffer")
            sd[n] = (buf.detach().numpy().copy() if buf is not None
                     else np.zeros(p.shape, np.float32))
        conv, rep = convert_yolox_drone(sd, template)
        assert not rep.missing and not rep.unmatched, rep.summary()
        return conv["params"]

    def sync_state():
        """Fresh TrainState at the CURRENT torch state (params + BN
        stats + momentum buffers)."""
        conv, rep = convert_yolox_drone(_torch_state_np(ref), template)
        assert not rep.missing and not rep.unmatched, rep.summary()
        st = TrainState.create(conv, tx, jax.random.PRNGKey(0))
        trace_state = st.opt_state[1][0]._replace(trace=momentum_pytree())
        return st.replace(opt_state=(
            st.opt_state[0], (trace_state,) + st.opt_state[1][1:]))

    for k, (img, cx, cy, w, h, c) in enumerate(_batches(11, K)):
        st = sync_state()
        pre_bs = jax.tree.map(jnp.asarray, st.batch_stats)

        # one torch step
        x = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
        labels = [torch.from_numpy(np.stack(
            [cx[b], cy[b], w[b], h[b], c[b].astype(np.float32)],
            1).astype(np.float32)) for b in range(B)]
        loss = ref_loss(list(ref(x)), labels)
        opt.zero_grad()
        loss.backward()
        opt.step()

        # one jax step from the SAME pre-step state
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                         axis=-1).astype(np.float32)
        batch = {"images": jnp.asarray(img),
                 "gt_boxes": jnp.asarray(boxes),
                 "gt_labels": jnp.asarray(c.astype(np.int32)),
                 "gt_valid": jnp.ones((B, G), bool)}
        st, metrics = step_fn(st, batch)

        np.testing.assert_allclose(
            float(metrics["loss"]), float(loss.detach()), rtol=1e-4,
            err_msg=f"step {k} loss")

        # post-step params AND BN running stats must match leaf-by-leaf.
        # running VAR tolerance is wider for a DOCUMENTED semantic gap:
        # torch updates running_var with the UNBIASED batch variance
        # (n/(n-1)) while flax uses the biased one — at this fixture's
        # deepest features n = B*2*2 = 8, so the per-step update differs
        # by 0.03 * var / 7 ≈ 2.3e-3 (measured 2.26e-3); at production
        # sizes n = B*H*W is 1e4+ and the gap is <1e-6 per step.
        want, rep = convert_yolox_drone(_torch_state_np(ref), template)
        assert not rep.missing and not rep.unmatched
        diffs = jax.tree.map(
            lambda a, b: jnp.max(jnp.abs(a - b)),
            st.params, want["params"])
        worst = max(jax.tree.leaves(diffs))
        assert float(worst) < 3e-4, (
            f"step {k} params: max leaf diff {float(worst):.2e}")
        # derived per-leaf bound on the unbiased-var gap: the flax
        # update delta (new - 0.97*old) IS 0.03*batch_var, and torch's
        # unbiased correction is that delta times 1/(n-1) <= 1/7 here
        # (deepest features n = B*2*2 = 8; shallower layers have larger
        # n, so 1/7 upper-bounds every leaf); means have no such gap
        # but ride the same check with delta ~ 0
        bs_ok = jax.tree.map(
            lambda a, b, old: jnp.max(
                jnp.abs(a - b)
                - jnp.abs(a - 0.97 * old) / 7.0 - 3e-4),
            st.batch_stats, want["batch_stats"], pre_bs)
        worst_bs = max(jax.tree.leaves(bs_ok))
        assert float(worst_bs) < 0, (
            f"step {k} batch_stats: unbiased-var bound exceeded by "
            f"{float(worst_bs):.2e}")


class _TinyTorch(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 8, 3, padding=1)
        self.bn = torch.nn.BatchNorm2d(8)
        self.conv2 = torch.nn.Conv2d(8, 4, 3, padding=1)

    def forward(self, x):
        return self.conv2(torch.relu(self.bn(self.conv1(x))))


def test_mp_det_sgd_optimizer_parity():
    """K free-running steps of the MP-Det optimizer recipe match torch +
    mmcv OptimizerHook semantics exactly on a smooth model, with the
    grad-clip binding."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from glsdet_tpu.train.schedules import mp_det_sgd

    class TinyFlax(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            x = nn.Conv(8, (3, 3), padding=1, name="conv1")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn")(x)
            x = nn.relu(x)
            return nn.Conv(4, (3, 3), padding=1, name="conv2")(x)

    torch.manual_seed(3)
    tm = _TinyTorch().train()
    rs = np.random.RandomState(5)
    x_np = rs.rand(4, 3, 16, 16).astype(np.float32)
    tgt_np = rs.rand(4, 4, 16, 16).astype(np.float32)
    # scale pushes the global grad norm above 35 on early steps so the
    # clip path is exercised, not just present
    SCALE = 4e4

    model = TinyFlax()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 3)), train=False)

    def from_torch():
        # .copy(): jnp.asarray zero-copies numpy on the CPU backend, and
        # torch's in-place opt.step() would mutate the aliased jax arrays
        sd = {k: v.detach().numpy().copy()
              for k, v in tm.state_dict().items()}
        return {
            "params": {
                "conv1": {"kernel": sd["conv1.weight"].transpose(2, 3, 1, 0),
                          "bias": sd["conv1.bias"]},
                "bn": {"scale": sd["bn.weight"], "bias": sd["bn.bias"]},
                "conv2": {"kernel": sd["conv2.weight"].transpose(2, 3, 1, 0),
                          "bias": sd["conv2.bias"]},
            },
            "batch_stats": {"bn": {"mean": sd["bn.running_mean"],
                                   "var": sd["bn.running_var"]}},
        }

    variables = jax.tree.map(jnp.asarray, from_torch())

    # torch: mmcv OptimizerHook — clip grads, then SGD applies wd (ALL
    # params, schedule_1x has no paramwise_cfg) + momentum
    opt = torch.optim.SGD(tm.parameters(), lr=0.01, momentum=0.9,
                          weight_decay=1e-4)
    xt = torch.from_numpy(x_np)
    tt = torch.from_numpy(tgt_np)

    tx = mp_det_sgd(lambda step: 0.01)
    opt_state = tx.init(variables["params"])
    xj = jnp.asarray(x_np.transpose(0, 2, 3, 1))
    tj = jnp.asarray(tgt_np.transpose(0, 2, 3, 1))

    @jax.jit
    def jax_step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, xj, train=True,
                mutable=["batch_stats"])
            return SCALE * jnp.mean((out - tj) ** 2), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        gnorm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, \
            loss, gnorm

    import optax

    params, batch_stats = variables["params"], variables["batch_stats"]
    clip_bound = False
    for k in range(8):
        out = tm(xt)
        loss = SCALE * torch.mean((out - tt) ** 2)
        opt.zero_grad()
        loss.backward()
        total_norm = torch.nn.utils.clip_grad_norm_(tm.parameters(), 35.0)
        opt.step()

        params, batch_stats, opt_state, jloss, gnorm = jax_step(
            params, batch_stats, opt_state)
        clip_bound |= float(gnorm) > 35.0
        np.testing.assert_allclose(float(jloss), float(loss.detach()),
                                   rtol=1e-5, err_msg=f"step {k} loss")
        np.testing.assert_allclose(float(gnorm), float(total_norm),
                                   rtol=1e-4, err_msg=f"step {k} gnorm")

        want = from_torch()
        diffs = jax.tree.map(lambda a, b: np.max(np.abs(np.asarray(a) - b)),
                             {"p": params, "b": batch_stats},
                             {"p": want["params"],
                              "b": want["batch_stats"]})
        worst = max(jax.tree.leaves(diffs))
        assert float(worst) < 1e-4, f"step {k}: max diff {float(worst):.2e}"
    assert clip_bound, "fixture never exercised the grad clip"


def test_mpdet_state_evolution():
    """K production MP-Det steps: EMA follows the mmdet
    ExpMomentumEMAHook formula (independent recomputation from the
    captured param trajectory) and the BoIW ring buffer advances."""
    import jax
    import jax.numpy as jnp

    from glsdet_tpu.models import MPDet
    from glsdet_tpu.train import (TrainState, init_boiw,
                                  make_mpdet_train_step, yolox_sgd)

    proxies = [2, 2]
    model = MPDet(num_classes=2, depth=18, proxies_list=proxies)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 3)), train=False))(rng)
    boiw = init_boiw(rng, num_classes=2, num_words=16, feat_channels=256,
                     proxies_list=proxies)
    tx = yolox_sgd(lambda s: 0.01)
    st = TrainState.create(variables, tx, rng, boiw=boiw)
    step_fn = jax.jit(make_mpdet_train_step(model, tx, (64, 64), 2,
                                            proxies))

    rs = np.random.RandomState(0)
    Bm, Gm = 2, 4
    ema0 = jax.tree.map(np.asarray, st.ema_params)
    params_traj, ptrs = [], [int(np.sum(np.asarray(st.boiw.ptr)))]
    for k in range(3):
        batch = {
            "images": jnp.asarray(
                rs.randint(0, 255, (Bm, 64, 64, 3)).astype(np.float32)),
            "gt_boxes": jnp.tile(jnp.array([[8., 8., 40., 40.]]),
                                 (Bm, Gm, 1)),
            "gt_labels": jnp.zeros((Bm, Gm), jnp.int32),
            "gt_valid": jnp.zeros((Bm, Gm), bool).at[:, 0].set(True),
        }
        st, metrics = step_fn(st, batch)
        assert np.isfinite(float(metrics["loss"]))
        params_traj.append(jax.tree.map(np.asarray, st.params))
        ptrs.append(int(np.sum(np.asarray(st.boiw.ptr))))

    # independent EMA recomputation (mmdet/core/hook/ema.py:104):
    # m(t) = (1 - m0) * exp(-(1 + t) / gamma) + m0; e' = (1-m)e + m*p
    ema = ema0
    for t, p in enumerate(params_traj):
        m = (1 - 2e-4) * np.exp(-(1 + t) / 2000.0) + 2e-4
        ema = jax.tree.map(lambda e, q: e * (1 - m) + q * m, ema, p)
    diffs = jax.tree.map(lambda a, b: np.max(np.abs(np.asarray(a) - b)),
                         st.ema_params, ema)
    assert float(max(jax.tree.leaves(diffs))) < 1e-5
    # ring buffer advanced every step (positives exist every step; the
    # per-class pointers WRAP at num_words, so only consecutive change
    # — not monotonicity — is the invariant)
    assert all(a != b for a, b in zip(ptrs, ptrs[1:])), ptrs
