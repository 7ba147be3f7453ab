"""Wall-clock phase breakdown of the pipelined serving driver.

The scan profiler (profile_stage2_scan.py) gives per-component DEVICE
times; this measures the HOST side of run_device_batches — where the
gap between the device-bound ceiling (sum of program times) and the
measured e2e rate goes: coarse readback waits, UFP packing, paint-table
grouping, stage-2 enqueue, and collect readback/postprocessing.

Usage: python scripts/profile_driver_phases.py [--batch 128] [--stacks 3]
       [--reps 3] [--int8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--stacks", type=int, default=3)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from glsdet_tpu.eval.two_stage import TwoStagePipeline
    from glsdet_tpu.models import MPDet, YOLOXDetector

    def log(msg):
        print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr,
              flush=True)

    rng = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    coarse_hw = (640, 640)
    coarse = YOLOXDetector(num_classes=10, phi="s", dtype=dtype)
    cvars = jax.jit(lambda r, x: coarse.init(r, x, train=False))(
        rng, jnp.zeros((1, *coarse_hw, 3), jnp.float32))
    mp = MPDet(num_classes=10, depth=50, dtype=dtype)
    mvars = jax.jit(lambda r, x: mp.init(r, x, train=False))(
        rng, jnp.zeros((1, 256, 256, 3), jnp.float32))
    jax.block_until_ready(mvars)
    log("inits done")

    coarse_apply = lambda v, images: coarse.apply(v, images, train=False)
    mp_apply = lambda v, images: mp.apply(v, images, train=False)

    scales, quant = None, False
    if args.int8:
        from glsdet_tpu.ops.quant_static import load_scales
        scales_path = os.environ.get(
            "GLSDET_INT8_SCALES",
            os.path.join(cache_dir, "bench_int8_scales.json"))
        scales = load_scales(scales_path)
        quant = "static"
        log(f"loaded int8 scales from {scales_path}")

    # mirror bench.py's production pipeline config (bucket ladder,
    # bucket-fit packing, scan groups) so this profiles the programs
    # the headline number runs — and reuses their compile cache
    pipe = TwoStagePipeline(
        coarse_apply, mp_apply, coarse_hw, coarse_score_thr=1e-4,
        mosaic_buckets=(1024, 1152), pack_mode="bucket-fit",
        coarse_vars=cvars, mp_vars=mvars, max_batch=args.batch,
        quant8=quant, act_scales=scales,
        scan_width=int(os.environ.get("GLSDET_SCAN_WIDTH") or "128")
        or None)

    rs = np.random.RandomState(0)
    frames = [rs.randint(0, 255, (765, 1360, 3), np.uint8)
              for _ in range(args.batch)]
    pipe.warmup((765, 1360))
    pipe(frames[0])
    log("warmup done")

    dev_stack = jnp.asarray(np.stack(frames))
    jax.block_until_ready(dev_stack)
    stacks = [dev_stack] * args.stacks
    n = args.batch * args.stacks

    # one untimed pass to settle caches
    pipe.run_device_batches(stacks)

    for rep in range(args.reps):
        t00 = time.time()
        t0 = time.time()
        handles = [pipe.submit_device_batch(s) for s in stacks]
        t_submit = time.time() - t0
        t_disp = []
        for h in handles:
            t0 = time.time()
            pipe.dispatch_mosaics(h)
            t_disp.append(time.time() - t0)
        t_coll = []
        for h in handles:
            t0 = time.time()
            pipe.collect_batch(h)
            t_coll.append(time.time() - t0)
        total = time.time() - t00
        log(f"rep{rep}: total {total * 1e3:7.1f}ms = {n / total:6.1f} img/s"
            f" | submit {t_submit * 1e3:6.1f}ms"
            f" | dispatch {' '.join(f'{t * 1e3:6.1f}' for t in t_disp)}ms"
            f" | collect {' '.join(f'{t * 1e3:6.1f}' for t in t_coll)}ms")


if __name__ == "__main__":
    main()
