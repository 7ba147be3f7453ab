#!/usr/bin/env python
"""Multi-host (DCN) training smoke test — no real cluster needed.

The reference's multi-host path is ``tools/dist_train.sh`` →
``torch.distributed.launch`` → ``MMDistributedDataParallel`` over NCCL
(mmdet/apis/train.py:113-121).  The TPU-native equivalent is
``jax.distributed.initialize`` + one global-view jitted train step over
a mesh spanning every host's devices; gradient/BN/normalizer reductions
become XLA collectives that ride ICI within a slice and DCN across
slices.  This script validates that path end-to-end with MULTIPLE
PROCESSES (the thing the in-process 8-device tests cannot cover):

    python scripts/multihost_smoke.py            # launcher: forks 2
    python scripts/multihost_smoke.py --process-id 0 --num-processes 2

Each worker owns 2 virtual CPU devices; the global mesh is 4 wide.  The
launcher asserts both workers converge on identical global losses (the
all-reduce contract: every host sees the same replicated state).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COORD = "127.0.0.1:29781"
MARK = "MULTIHOST_STEP"
CACHE = os.path.join(REPO, ".jax_cache", "multihost")


def _enable_compile_cache():
    """Persistent-cache opt-in (GLSDET_SMOKE_CACHE=1) — OFF by default.

    Round-4 root cause: executables AOT-LOADED from the persistent cache
    execute their gloo collectives in a different order / pairing than
    freshly-JIT-compiled ones, crashing the first MP-Det step with
    `gloo pair.cc:459 op.preamble.length <= op.nbytes (256 vs 32)`.
    Reproduced deterministically: every cache-hit run fails, every
    fresh-compile run passes (incl. 5x loops), on identical HLO and
    flags.  Multi-process CPU-gloo programs therefore must NOT load
    from the cache; the former launcher "prime pass" existed only to
    warm it, so it is gone too.  Real-TPU programs are unaffected
    (ICI/DCN collectives are not gloo).
    """
    import jax

    if os.environ.get("GLSDET_SMOKE_CACHE", "0") != "1":
        return
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _coord_barrier(name: str, timeout_ms: int) -> None:
    """Barrier over the jax.distributed coordination service (NOT a
    device collective — safe before any gloo context exists)."""
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_ms)
    except Exception as e:  # barrier is best-effort on older jax
        print(f"coord barrier {name} unavailable: {e}", flush=True)


def worker(pid: int, nproc: int) -> None:
    import jax

    # the axon sitecustomize pins jax_platforms to the TPU tunnel; this
    # smoke must run on the virtual-CPU DCN path
    jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    sys.path.insert(0, REPO)

    from glsdet_tpu.parallel.mesh import init_distributed

    init_distributed(COORD, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from glsdet_tpu.models import YOLOXDetector
    from glsdet_tpu.parallel import data_mesh
    from glsdet_tpu.train import (TrainState, make_yolox_train_step,
                                  yolox_sgd, yolox_warm_cos)

    n_dev = len(jax.devices())
    n_local = len(jax.local_devices())
    print(f"[{pid}] processes={nproc} global_devices={n_dev} "
          f"local_devices={n_local}", flush=True)

    B_global, H, W, G = 2 * n_dev, 64, 64, 4
    B_local = B_global // nproc
    mesh = data_mesh()
    bs = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    # debug knob: GLSDET_SMOKE_ONLY=mp skips the YOLOX phase (used to
    # isolate the gloo collective-ordering crash to the MP-Det program)
    only_mp = os.environ.get("GLSDET_SMOKE_ONLY") == "mp"
    model = YOLOXDetector(num_classes=10, phi="nano")
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, H, W, 3)), train=False))(rng)
    tx = yolox_sgd(yolox_warm_cos(0.01, 10, 100, 10))
    # align all processes before the FIRST gloo collective (device_put of
    # a replicated pytree runs a multihost assert_equal allgather): gloo's
    # rendezvous window is a hard 30s, but per-process startup skew
    # (imports + init compiles across N concurrent workers on a loaded
    # host) can exceed it.  The coordination-service barrier has a
    # generous timeout and starts everyone's 30s window together.
    _coord_barrier("glsdet_smoke_startup", 900_000)
    state = jax.device_put(TrainState.create(variables, tx, rng), repl)

    # per-host local batch shard -> one global array (the DCN data path:
    # every host loads only its slice of the global batch)
    rs = np.random.RandomState(100 + pid)

    def global_batch(step_i: int):
        local = {
            "images": rs.rand(B_local, H, W, 3).astype(np.float32) * 0.1,
            "gt_boxes": np.tile(
                np.array([[8.0, 8.0, 40.0, 40.0]], np.float32),
                (B_local, G, 1)),
            "gt_labels": np.zeros((B_local, G), np.int32),
            "gt_valid": np.zeros((B_local, G), bool),
        }
        local["gt_valid"][:, 0] = True
        return {
            k: jax.make_array_from_process_local_data(
                bs, v, (B_global, *v.shape[1:]))
            for k, v in local.items()
        }

    # AOT-compile the step BEFORE a barrier, execute AFTER it: with the
    # persistent cache off (see _enable_compile_cache), N concurrent
    # fresh compiles on a small host can skew workers by minutes, and a
    # program's first collective only gives its peers gloo's hard-30s
    # context rendezvous window.  Compile skew lands on the barrier
    # (900s budget); execution then starts aligned.
    step = jax.jit(make_yolox_train_step(model, tx, (H, W)),
                   in_shardings=(repl, bs),
                   donate_argnums=(0,)).lower(
                       state, global_batch(-1)).compile()
    print(f"[{pid}] phase: yolox compiled", flush=True)
    _coord_barrier("glsdet_smoke_yolox_compiled", 900_000)

    for i in range(3):
        if only_mp:
            break
        state, metrics = step(state, global_batch(i))
        loss = float(metrics["loss"])   # host readback syncs every host
        assert np.isfinite(loss), f"step {i}: non-finite loss {loss}"
        print(f"[{pid}] {MARK} {i} loss={loss:.6f}", flush=True)

    # replicated-state contract: every host reads the same params.
    # ONE jitted program, not a per-leaf eager chain: every eager op on
    # a global array is its own dispatched program, and hundreds of tiny
    # asynchronous dispatches interleaving with the next phase's
    # collectives is exactly the kind of skew gloo cannot tolerate.
    pnorm = float(jax.jit(
        lambda p: jax.tree.reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))),
            p, jnp.float32(0)))(state.params))
    print(f"[{pid}] MULTIHOST_OK param_l1={pnorm:.4f}", flush=True)

    # MP-Det phase: the BoIW dictionary is the one piece of *stateful*
    # cross-host sync (reference: NCCL reduce_mean at mp_head.py:454,472
    # + per-process buffer updates).  Here the dictionary lives in the
    # replicated TrainState and its ring-buffer update runs inside the
    # global-view jitted step, so every host must end with bit-identical
    # dictionary contents — asserted by the launcher comparing the
    # printed checksums.
    from glsdet_tpu.models import MPDet
    from glsdet_tpu.train import init_boiw, make_mpdet_train_step

    proxies = [2, 2]
    # fresh key: the YOLOX step donated its state (which aliased ``rng``)
    rng2 = jax.random.PRNGKey(1)
    mp = MPDet(num_classes=2, depth=18, proxies_list=proxies)
    mp_vars = jax.jit(
        lambda r: mp.init(r, jnp.zeros((1, H, W, 3)), train=False))(rng2)
    boiw = init_boiw(rng2, num_classes=2, num_words=16, feat_channels=256,
                     proxies_list=proxies)
    mp_tx = yolox_sgd(yolox_warm_cos(0.01, 10, 100, 10))
    # phase boundary: drain the YOLOX phase's asynchronously-dispatched
    # collectives on EVERY process before the MP phase's replicated
    # device_put opens new gloo ops, then re-align the processes.  The
    # first phase's steps are async — without the drain, a fast worker's
    # MP-phase assert-equal allgather can interleave with a slow
    # worker's still-executing train-step collectives on the same gloo
    # pairs (observed as pair.cc:459 'op.preamble.length <= op.nbytes'
    # length mismatches followed by a SIGABRT).
    jax.block_until_ready(state.params)
    print(f"[{pid}] phase: yolox drained", flush=True)
    _coord_barrier("glsdet_smoke_mp_phase", 900_000)
    mp_state = jax.device_put(
        TrainState.create(mp_vars, mp_tx, rng2, boiw=boiw), repl)
    print(f"[{pid}] phase: mp state placed", flush=True)
    # AOT compile + barrier before the first execution (same compile-
    # skew rationale as the yolox phase; the MP-Det program compiles
    # for minutes fresh on a small host)
    mp_step = jax.jit(
        make_mpdet_train_step(mp, mp_tx, (H, W), 2, proxies),
        in_shardings=(repl, bs), donate_argnums=(0,)).lower(
            mp_state, global_batch(9)).compile()
    print(f"[{pid}] phase: mp compiled", flush=True)
    _coord_barrier("glsdet_smoke_mp_compiled", 900_000)
    for i in range(2):
        mp_state, mp_metrics = mp_step(mp_state, global_batch(10 + i))
        jax.block_until_ready(mp_state)
        loss = float(mp_metrics["loss"])
        assert np.isfinite(loss), f"mp step {i}: non-finite {loss}"
        print(f"[{pid}] {MARK}_MP {i} loss={loss:.6f}", flush=True)
    boiw_l1 = float(jnp.sum(jnp.abs(mp_state.boiw.embedding)))
    ptr_sum = int(jnp.sum(mp_state.boiw.ptr))
    # end-STATE digest, not just losses: params + EMA after the final
    # step must be identical on every host (one jitted reduction per
    # tree — see the eager-chain warning above)
    _l1 = jax.jit(lambda p: jax.tree.reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))),
        p, jnp.float32(0)))
    mp_param_l1 = float(_l1(mp_state.params))
    mp_ema_l1 = float(_l1(mp_state.ema_params))
    print(f"[{pid}] MULTIHOST_MP_OK boiw_l1={boiw_l1:.4f} "
          f"ptr_sum={ptr_sum} param_l1={mp_param_l1:.4f} "
          f"ema_l1={mp_ema_l1:.4f}", flush=True)

    # orderly teardown: drain all in-flight device work, re-align every
    # process, then shut the distributed client down explicitly instead
    # of racing atexit hooks (a worker that tears down its gloo context
    # while a peer still has collectives in flight aborts the peer).
    jax.block_until_ready(mp_state.params)
    _coord_barrier("glsdet_smoke_done", 900_000)
    jax.distributed.shutdown()


def launcher(nproc: int) -> int:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=2").strip()
    env["XLA_FLAGS"] = flags
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--process-id", str(i), "--num-processes", str(nproc)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(nproc)
    ]
    # with the persistent cache off (the AOT-load gloo bug), every
    # worker compiles fresh; N concurrent compiles contend for the
    # host's cores, so the default budget scales with N
    # (GLSDET_SMOKE_TIMEOUT_S overrides)
    budget = int(os.environ.get("GLSDET_SMOKE_TIMEOUT_S",
                                str(1500 if nproc <= 2 else 4500)))
    outs = [p.communicate(timeout=budget)[0] for p in procs]
    ok = True
    losses, boiw = [], []
    for i, (p, out) in enumerate(zip(procs, outs)):
        sys.stdout.write(out)
        if (p.returncode != 0 or "MULTIHOST_OK" not in out
                or "MULTIHOST_MP_OK" not in out):
            print(f"worker {i} FAILED (rc={p.returncode})")
            ok = False
        losses.append([ln.split("loss=")[1] for ln in out.splitlines()
                       if MARK in ln])      # matches MARK and MARK_MP
        boiw.append([ln.split("MULTIHOST_MP_OK ")[1]
                     for ln in out.splitlines() if "MULTIHOST_MP_OK" in ln])
    if ok and len(set(map(tuple, losses))) != 1:
        print(f"worker losses diverge: {losses}")
        ok = False
    if ok and len(set(map(tuple, boiw))) != 1:
        print(f"BoIW dictionary state diverges across hosts: {boiw}")
        ok = False
    print("multihost smoke:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    args = ap.parse_args()
    if args.process_id is None:
        raise SystemExit(launcher(args.num_processes))
    worker(args.process_id, args.num_processes)


if __name__ == "__main__":
    main()
