"""Multi-stream serving benchmark: streaming pipeline depth sweep.

Simulates a serving workload of S independent request batches (HBM-
staged uint8 stacks, the production-ingest analog bench.py uses) and
measures throughput at pipeline depth 1 (serialize each batch:
submit -> dispatch_mosaics -> collect before the next) vs depth N
(keep N batches in flight, the ``serve.AsyncDetector(pipeline_depth=N)``
schedule).  Depth 1 is what a naive server does; the gap to depth>=2 is
the per-batch RPC + host-packing latency the multi-stream worker hides
behind device compute.

Run on the TPU tunnel: python scripts/bench_serving.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr,
          flush=True)


def run_depth(pipe, stacks, depth: int) -> float:
    """Serve the request stream at the given pipeline depth; returns
    images/sec.  Mirrors serve.AsyncDetector._run_streaming: submit new
    work while there is room, advance the oldest un-advanced batch,
    collect the oldest when the window is full."""
    n_imgs = sum(int(s.shape[0]) for s in stacks)
    queue = deque(stacks)
    pending = deque()   # (handle, advanced?)
    t0 = time.time()
    while queue or pending:
        if queue and len(pending) < depth:
            pending.append([pipe.submit_device_batch(queue.popleft()),
                            False])
        for entry in pending:
            if not entry[1]:
                pipe.dispatch_mosaics(entry[0])
                entry[1] = True
                break
        if pending and (len(pending) >= depth or not queue):
            pipe.collect_batch(pending.popleft()[0])
    return n_imgs / (time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8,
                    help="frames per request batch")
    ap.add_argument("--requests", type=int, default=12,
                    help="request batches per measured stream")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--depths", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--int8", action="store_true", default=None,
                    help="static-int8 serving precision (default: on "
                         "for TPU backends, like bench.py)")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from glsdet_tpu.eval.two_stage import TwoStagePipeline
    from glsdet_tpu.models import MPDet, YOLOXDetector

    rng = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    coarse_hw = (640, 640)
    coarse = YOLOXDetector(num_classes=10, phi="s", dtype=dtype)
    cvars = jax.jit(lambda r, x: coarse.init(r, x, train=False))(
        rng, jnp.zeros((1, *coarse_hw, 3), jnp.float32))
    jax.block_until_ready(cvars)
    mp = MPDet(num_classes=10, depth=50, dtype=dtype)
    mvars = jax.jit(lambda r, x: mp.init(r, x, train=False))(
        rng, jnp.zeros((1, 256, 256, 3), jnp.float32))
    jax.block_until_ready(mvars)
    log("inits done")

    def make_pipe(q=False, s=None):
        return TwoStagePipeline(
            lambda v, im: coarse.apply(v, im, train=False),
            lambda v, im: mp.apply(v, im, train=False),
            coarse_hw, mosaic_buckets=(1152,), coarse_score_thr=1e-4,
            coarse_vars=cvars, mp_vars=mvars, max_batch=args.batch,
            quant8=q, act_scales=s)

    pipe = make_pipe()
    rs = np.random.RandomState(0)
    frames = [rs.randint(0, 255, (765, 1360, 3), np.uint8)
              for _ in range(args.batch)]

    use_int8 = (args.int8 if args.int8 is not None
                else jax.default_backend() == "tpu")
    if use_int8:
        t0 = time.time()
        scales = pipe.calibrate_int8(frames[:2])
        pipe = make_pipe("static", scales)
        log(f"int8 calibration done in {time.time()-t0:.0f}s")

    stack = jnp.asarray(np.stack(frames))
    jax.block_until_ready(stack)
    # warmup: compile coarse + mosaic at this batch, prime buckets
    pipe.run_device_batch(stack)
    log("warmup done")

    stacks = [stack] * args.requests
    results = {}
    for depth in args.depths:
        rates = []
        for _ in range(args.reps):
            rates.append(run_depth(pipe, list(stacks), depth))
        results[depth] = max(rates)
        log(f"depth {depth}: {results[depth]:.2f} img/s "
            f"(reps: {', '.join(f'{r:.1f}' for r in rates)})")

    base = results[min(results)]
    for depth in sorted(results):
        print(f"pipeline_depth={depth}: {results[depth]:7.2f} img/s "
              f"({results[depth] / base:.2f}x vs depth {min(results)})")


if __name__ == "__main__":
    main()
