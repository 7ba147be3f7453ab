"""Split timing of the two-stage pipeline on the real device.

Times each jitted program with honest synchronization (scalar readback —
``block_until_ready`` on the tunnel can return early, CLAUDE.md), and the
host packing step, to show where the per-image time goes.

Usage: python scripts/profile_two_stage.py [--batch 4] [--iters 12]
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--bucket", type=int, default=1152,
                help="model-canvas bucket for the mosaic-stage programs")
    ap.add_argument("--int8", action="store_true",
                    help="profile the static-int8 serving configuration "
                         "(calibrates on the sample frames first)")
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from glsdet_tpu.eval.two_stage import TwoStagePipeline, paint_tile
    from glsdet_tpu.models import MPDet, YOLOXDetector
    from glsdet_tpu.native import (
        unified_foreground_packing_native as unified_foreground_packing)
    from glsdet_tpu.ufp.assembly import regions_to_array, split_rows_for_tile

    def log(msg):
        print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr,
              flush=True)

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

    coarse_apply = lambda v, images: coarse.apply(v, images, train=False)
    mp_apply = lambda v, images: mp.apply(v, images, train=False)

    def make_pipe(q=False, s=None):
        return TwoStagePipeline(
            coarse_apply, mp_apply,
            coarse_hw, mosaic_buckets=(args.bucket,), coarse_score_thr=1e-4,
            coarse_vars=cvars, mp_vars=mvars, max_batch=args.batch,
            quant8=q, act_scales=s)

    pipe = make_pipe()

    rs = np.random.RandomState(0)
    frames = [rs.randint(0, 255, (765, 1360, 3), np.uint8)
              for _ in range(args.batch)]

    if args.int8:
        from glsdet_tpu.ops.quant_static import wrap_apply_quant8_static

        t0 = time.time()
        scales = pipe.calibrate_int8(frames[:2])
        log(f"int8 calibration done in {time.time()-t0:.0f}s")
        pipe = make_pipe("static", scales)
        # the standalone forward timers below profile the same int8 path
        coarse_apply = wrap_apply_quant8_static(coarse_apply, scales[0])
        mp_apply = wrap_apply_quant8_static(mp_apply, scales[1])
    dev_stack = jnp.asarray(np.stack(frames))
    jax.block_until_ready(dev_stack)

    # warm all programs on the real path
    pipe.run_device_batch(dev_stack)
    log("warm")

    def sync(tree):
        # force completion via host readback of one scalar per leaf set
        leaves = jax.tree_util.tree_leaves(tree)
        for l in leaves:
            np.asarray(l)

    B = args.batch

    # stage 1: coarse program (resize+normalize+forward+decode+NMS)
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        sync(pipe._coarse_full_batch(dev_stack))
        ts.append(time.time() - t0)
    t_coarse = min(ts)
    log(f"coarse program:       {t_coarse*1e3:8.1f} ms / {B} imgs "
        f"({t_coarse/B*1e3:.1f} ms/img)")

    # host packing from real coarse detections
    from glsdet_tpu.eval.two_stage import unpack_detections
    dets = unpack_detections(pipe._coarse_full_batch(dev_stack))
    all_boxes = dets["boxes"]
    all_valid = dets["valid"]
    h0, w0 = 765, 1360
    sx, sy = w0 / coarse_hw[1], h0 / coarse_hw[0]
    t0 = time.time()
    reps = 50
    for _ in range(reps):
        packs = []
        for row in range(B):
            cb = (all_boxes[row] * np.array([sx, sy, sx, sy], np.float32)
                  )[all_valid[row]]
            packs.append(unified_foreground_packing(
                cb.astype(np.float32), 1.5, (w0, h0)))
    t_pack = (time.time() - t0) / reps
    n_regions = sum(len(p[0]) for p in packs)
    log(f"host UFP packing:     {t_pack*1e3:8.2f} ms / {B} imgs "
        f"({n_regions} regions total)")

    # stage 2: mosaic program (assemble+MP-Det+decode+NMS+unmap+NMS)
    rows = jnp.arange(B, dtype=jnp.int32)
    unmap_np = np.stack(
        [regions_to_array(p[0], pipe.max_regions) for p in packs])
    regs = jnp.asarray(unmap_np)
    # the ACTIVE painter's payload (pallas tile tables on TPU, flat
    # split rows otherwise)
    paints = jnp.asarray(pipe._paint_group(list(unmap_np), args.bucket))
    print(f"# painter: {pipe.painter} payload ndim {paints.ndim}",
          file=sys.stderr, flush=True)
    sync(pipe._mosaic_stage_batch(dev_stack, rows, paints, regs, args.bucket))
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        sync(pipe._mosaic_stage_batch(dev_stack, rows, paints, regs, args.bucket))
        ts.append(time.time() - t0)
    t_mosaic = min(ts)
    log(f"mosaic program @{args.bucket}: {t_mosaic*1e3:8.1f} ms / {B} imgs "
        f"({t_mosaic/B*1e3:.1f} ms/img)")

    # MP-Det forward alone at the bucket (no assembly/postprocess)
    @jax.jit
    def _mp_fwd_sum(v, x):
        cls, reg = mp_apply(v, x)
        return sum(c.astype(jnp.float32).sum() for c in cls)

    x1280 = jnp.zeros((B, args.bucket, args.bucket, 3), jnp.float32)
    float(_mp_fwd_sum(mvars, x1280))
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        float(_mp_fwd_sum(mvars, x1280))
        ts.append(time.time() - t0)
    t_mp = min(ts)
    log(f"MP-Det fwd @{args.bucket}:     {t_mp*1e3:8.1f} ms / {B} imgs "
        f"({t_mp/B*1e3:.1f} ms/img)")

    # coarse YOLOX-s forward alone at 640
    @jax.jit
    def _coarse_fwd_sum(v, x):
        cls, reg, obj = coarse_apply(v, x)
        return sum(c.astype(jnp.float32).sum() for c in cls)

    x640 = jnp.zeros((B, 640, 640, 3), jnp.float32)
    float(_coarse_fwd_sum(cvars, x640))
    ts = []
    for _ in range(args.iters):
        t0 = time.time()
        float(_coarse_fwd_sum(cvars, x640))
        ts.append(time.time() - t0)
    t_cf = min(ts)
    log(f"YOLOX-s fwd @640:     {t_cf*1e3:8.1f} ms / {B} imgs "
        f"({t_cf/B*1e3:.1f} ms/img)")

    # --- fine split of the mosaic stage ---
    from glsdet_tpu.eval.postprocess import gfl_postprocess
    from glsdet_tpu.eval.two_stage import _unmap_and_nms
    from glsdet_tpu.ufp.assembly import assemble_mosaic_tiled_batch

    def _assemble_batch(im, rg):
        import jax.numpy as jnp
        from glsdet_tpu.ufp.pallas_paint import assemble_mosaic_pallas_batch
        from glsdet_tpu.eval.two_stage import paint_hw_for
        bk = args.bucket
        ph = paint_hw_for(bk)
        if rg.ndim == 5:
            canv = assemble_mosaic_pallas_batch(
                im, rg, ph, ph, tile=paint_tile(bk),
                dtype=jnp.bfloat16)
        else:
            canv = assemble_mosaic_tiled_batch(
                im, rg, ph, ph, tile=paint_tile(bk),
                dtype=jnp.bfloat16)
        canv = canv[:, :bk, :bk, :]
        mean = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
        std = jnp.asarray([58.395, 57.12, 57.375], jnp.float32)
        return ((canv - mean.astype(jnp.bfloat16))
                * (1.0 / std).astype(jnp.bfloat16))

    def timeit_scalar(fn, *a):
        """fn returns a pytree; timing forces a scalar readback only."""
        g = jax.jit(lambda *xs: jax.tree_util.tree_reduce(
            lambda acc, l: acc + l.astype(jnp.float32).sum(),
            fn(*xs), jnp.float32(0)))
        float(g(*a))
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            float(g(*a))
            ts.append(time.time() - t0)
        return min(ts)

    t_asm = timeit_scalar(_assemble_batch, dev_stack, paints)
    log(f"  assembly @{args.bucket}:     {t_asm*1e3:8.1f} ms / {B} imgs")

    mosaics = jax.jit(_assemble_batch)(dev_stack, paints)
    t_fwd = timeit_scalar(
        lambda v, x: mp.apply(v, x, train=False), mvars, mosaics)
    log(f"  MP-Det fwd:         {t_fwd*1e3:8.1f} ms / {B} imgs")

    cls_out, reg_out = jax.jit(
        lambda v, x: mp.apply(v, x, train=False))(mvars, mosaics)
    t_post = timeit_scalar(lambda c, r: gfl_postprocess(
        c, r, (args.bucket, args.bucket), score_thr=pipe.chip_score_thr,
        max_dets=pipe.max_chip), cls_out, reg_out)
    log(f"  gfl_postprocess:    {t_post*1e3:8.1f} ms / {B} imgs")

    mp_dets = jax.jit(lambda c, r: gfl_postprocess(
        c, r, (args.bucket, args.bucket), score_thr=pipe.chip_score_thr,
        max_dets=pipe.max_chip))(cls_out, reg_out)
    t_unmap = timeit_scalar(
        lambda b, s, l, v, r: jax.vmap(
            lambda bb, ss, ll, vv, rr: _unmap_and_nms(
                bb, ss, ll, vv, rr, pipe.final_nms_thr, pipe.max_chip)
        )(b, s, l, v, r),
        mp_dets["boxes"], mp_dets["scores"], mp_dets["labels"],
        mp_dets["valid"], regs)
    log(f"  unmap+final NMS:    {t_unmap*1e3:8.1f} ms / {B} imgs")

    # --- fine split of the coarse stage ---
    from glsdet_tpu.eval.postprocess import yolox_postprocess
    t_rsz = timeit_scalar(lambda x: jax.image.resize(
        x.astype(jnp.float32), (B, 640, 640, 3), method="bilinear"),
        dev_stack)
    log(f"  coarse resize:      {t_rsz*1e3:8.1f} ms / {B} imgs")

    ccls, creg, cobj = jax.jit(
        lambda v, x: coarse.apply(v, x, train=False))(cvars, x640)
    t_cpost = timeit_scalar(lambda c, r, o: yolox_postprocess(
        c, r, o, coarse_hw, score_thr=pipe.coarse_score_thr,
        max_dets=pipe.max_coarse), ccls, creg, cobj)
    log(f"  yolox_postprocess:  {t_cpost*1e3:8.1f} ms / {B} imgs")

    total = (t_coarse + t_mosaic) / B * 1e3
    log(f"sum of programs: {total:.1f} ms/img "
        f"(pipeline steady state overlaps packing)")


if __name__ == "__main__":
    main()
