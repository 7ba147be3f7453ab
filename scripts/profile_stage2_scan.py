"""RPC-floor-free component timing of the two-stage serving programs.

profile_two_stage.py times one dispatch per measurement, so on the
tunnel every component reads ~30ms/B too high (the per-RPC floor —
0.23 ms/img at B=128, larger than several of the components).  Here
each component runs ``reps`` times inside ONE program via lax.scan,
with a scalar carry threaded through a cheap perturbation of a SMALL
input so XLA cannot hoist the body out of the loop; per-evaluation
time = (t(reps) - t(1)) / (reps - 1), which cancels both the RPC floor
and the dispatch fixed costs.

Usage: python scripts/profile_stage2_scan.py [--batch 128] [--bucket
1024] [--reps 5] [--iters 6] [--int8]
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
    ap.add_argument("--bucket", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from glsdet_tpu.eval.postprocess import (gfl_postprocess,
                                             yolox_postprocess)
    from glsdet_tpu.eval.two_stage import (TwoStagePipeline, _unmap_and_nms,
                                           paint_hw_for, paint_tile,
                                           unpack_detections)
    from glsdet_tpu.models import MPDet, YOLOXDetector
    from glsdet_tpu.native import unified_foreground_packing_rows
    from glsdet_tpu.ufp.assembly import assemble_mosaic_tiled_batch

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
            coarse_apply, mp_apply, coarse_hw,
            mosaic_buckets=(args.bucket,), coarse_score_thr=1e-4,
            coarse_vars=cvars, mp_vars=mvars, max_batch=args.batch,
            quant8=q, act_scales=s)

    pipe = make_pipe()
    rs = np.random.RandomState(0)
    frames = [rs.randint(0, 255, (765, 1360, 3), np.uint8)
              for _ in range(args.batch)]

    if args.int8:
        from glsdet_tpu.ops.quant_static import (load_scales,
                                                 wrap_apply_quant8_static)
        scales_path = os.environ.get(
            "GLSDET_INT8_SCALES",
            os.path.join(cache_dir, "bench_int8_scales.json"))
        scales = None
        if os.path.exists(scales_path):
            try:
                scales = load_scales(scales_path)
                log(f"loaded int8 scales from {scales_path}")
            except (ValueError, KeyError):
                pass
        if scales is None:
            t0 = time.time()
            scales = pipe.calibrate_int8(frames[:2])
            log(f"int8 calibration done in {time.time() - t0:.0f}s")
        pipe = make_pipe("static", scales)
        coarse_apply = wrap_apply_quant8_static(coarse_apply, scales[0])
        mp_apply = wrap_apply_quant8_static(mp_apply, scales[1])

    dev_stack = jnp.asarray(np.stack(frames))
    jax.block_until_ready(dev_stack)
    B = args.batch

    # real coarse detections -> real packing tables (the components see
    # the bench's actual region load, not toy inputs)
    dets = unpack_detections(np.asarray(pipe._coarse_full_batch(dev_stack)))
    h0, w0 = 765, 1360
    sx, sy = w0 / coarse_hw[1], h0 / coarse_hw[0]
    unmap_np = []
    for row in range(B):
        cb = (dets["boxes"][row] * np.array([sx, sy, sx, sy], np.float32)
              )[dets["valid"][row]]
        rows_arr, n_reg, mw, mh = unified_foreground_packing_rows(
            cb, 1.5, (w0, h0), pipe.max_regions)
        unmap_np.append(rows_arr)
    unmap_np = np.stack(unmap_np)
    regs = jnp.asarray(unmap_np)
    rows = jnp.arange(B, dtype=jnp.int32)
    paints = jnp.asarray(pipe._paint_group(list(unmap_np), args.bucket))
    log(f"packing tables ready (painter={pipe.painter}, "
        f"paint ndim={paints.ndim})")

    def timeit_scanned(name, fn, *xs):
        """fn(c, *xs) -> pytree; c is the f32 carry the fn must fold into
        a CHEAP input so the scan body cannot be hoisted."""
        def build(n):
            @jax.jit
            def g(*a):
                def body(c, _):
                    ys = fn(c, *a)
                    s = jax.tree_util.tree_reduce(
                        lambda acc, l: acc + l.astype(jnp.float32).sum(),
                        ys, jnp.float32(0))
                    return s * jnp.float32(1e-30), s
                _, out = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return out.sum()
            return g
        g1, gn = build(1), build(args.reps)
        float(g1(*xs))
        float(gn(*xs))
        t1s, tns = [], []
        for _ in range(args.iters):
            t0 = time.time()
            float(g1(*xs))
            t1s.append(time.time() - t0)
            t0 = time.time()
            float(gn(*xs))
            tns.append(time.time() - t0)
        t1, tn = min(t1s), min(tns)
        per = (tn - t1) / (args.reps - 1)
        log(f"{name:24s} {per / B * 1e3:7.3f} ms/img "
            f"(t1={t1 * 1e3:.0f}ms tN={tn * 1e3:.0f}ms)")
        return per

    bk = args.bucket
    ph = paint_hw_for(bk)
    tile = paint_tile(bk)
    mean = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
    inv_std = 1.0 / jnp.asarray([58.395, 57.12, 57.375], jnp.float32)

    # --- stage-2 components ---
    def paint_fn(c, im, pt):
        # carry -> int table perturbation (adds 0, keeps the data dep)
        pt = pt + c.astype(pt.dtype)
        if pt.ndim == 3:
            # device-built tables (table_build="device" default):
            # (b, R, 7) unmap rows -> in-program tile tables
            import functools as _ft

            from glsdet_tpu.ufp.pallas_paint import (
                assemble_mosaic_pallas_batch, build_tile_tables_jax)
            tables = jax.vmap(_ft.partial(
                build_tile_tables_jax, out_h=ph, out_w=ph, tile=tile,
                cap=pipe.paint_cap))(pt)
            canv = assemble_mosaic_pallas_batch(im, tables, ph, ph,
                                                tile=tile, dtype=dtype)
        elif pt.ndim == 5:
            from glsdet_tpu.ufp.pallas_paint import \
                assemble_mosaic_pallas_batch
            canv = assemble_mosaic_pallas_batch(im, pt, ph, ph, tile=tile,
                                                dtype=dtype)
        else:
            canv = assemble_mosaic_tiled_batch(im, pt, ph, ph, tile=tile,
                                               dtype=dtype)
        canv = canv[:, :bk, :bk, :]
        return (canv - mean.astype(dtype)) * inv_std.astype(dtype)

    timeit_scanned("paint+normalize", paint_fn, dev_stack, paints)

    mosaics = jax.jit(lambda im, pt: paint_fn(jnp.float32(0), im, pt))(
        dev_stack, paints)
    jax.block_until_ready(mosaics)

    def perturb_vars(v, c):
        # add c (==0 at runtime, unknown to XLA) to the first conv kernel:
        # everything downstream depends on it, other leaves stay aliased
        import jax.tree_util as jtu
        flat, tree = jtu.tree_flatten_with_path(v)
        done = False
        out = []
        for path, leaf in flat:
            if not done and hasattr(leaf, "ndim") and leaf.ndim == 4:
                out.append(leaf + c.astype(leaf.dtype))
                done = True
            else:
                out.append(leaf)
        return jtu.tree_unflatten(tree, out)

    def mp_fwd_fn(c, v, x):
        return mp_apply(perturb_vars(v, c), x)

    timeit_scanned("MP-Det forward", mp_fwd_fn, mvars, mosaics)

    cls_out, reg_out = jax.jit(lambda v, x: mp_apply(v, x))(mvars, mosaics)
    jax.block_until_ready((cls_out, reg_out))

    def post_fn(c, cl, rg):
        cl = [x + c.astype(x.dtype) for x in cl]
        return gfl_postprocess(cl, rg, (bk, bk),
                               score_thr=pipe.chip_score_thr,
                               max_dets=pipe.max_chip)

    timeit_scanned("gfl_postprocess", post_fn, cls_out, reg_out)

    mp_dets = jax.jit(lambda cl, rg: gfl_postprocess(
        cl, rg, (bk, bk), score_thr=pipe.chip_score_thr,
        max_dets=pipe.max_chip))(cls_out, reg_out)
    jax.block_until_ready(mp_dets)

    def unmap_fn(c, b, s, l, v, r):
        b = b + c
        return jax.vmap(lambda bb, ss, ll, vv, rr: _unmap_and_nms(
            bb, ss, ll, vv, rr, pipe.final_nms_thr, pipe.max_chip)
        )(b, s, l, v, r)

    timeit_scanned("unmap+final NMS", unmap_fn, mp_dets["boxes"],
                   mp_dets["scores"], mp_dets["labels"], mp_dets["valid"],
                   regs)

    # --- whole mosaic program, scanned, for the fusion-overhead check ---
    def mosaic_all(c, im, pt, rg):
        rg = rg + c
        mos = paint_fn(c, im, pt)
        cl, rgo = mp_apply(mvars, mos)
        d = gfl_postprocess(cl, rgo, (bk, bk),
                            score_thr=pipe.chip_score_thr,
                            max_dets=pipe.max_chip)
        return unmap_fn(c, d["boxes"], d["scores"], d["labels"],
                        d["valid"], rg)

    timeit_scanned("mosaic program (sum)", mosaic_all, dev_stack, paints,
                   regs)

    # --- coarse components ---
    def cpre_fn(c, im):
        m = mean + c
        img = im.astype(dtype)
        rsz = jax.image.resize(img, (B, *coarse_hw, 3), method="bilinear")
        return (rsz - m.astype(dtype)) * inv_std.astype(dtype)

    timeit_scanned("coarse preproc", cpre_fn, dev_stack)

    x640 = jax.jit(lambda im: cpre_fn(jnp.float32(0), im))(dev_stack)
    jax.block_until_ready(x640)

    def cfwd_fn(c, v, x):
        return coarse_apply(perturb_vars(v, c), x)

    timeit_scanned("YOLOX-s forward", cfwd_fn, cvars, x640)

    ccls, creg, cobj = jax.jit(lambda v, x: coarse_apply(v, x))(cvars, x640)
    jax.block_until_ready((ccls, creg, cobj))

    def cpost_fn(c, cl, rg, ob):
        cl = [x + c.astype(x.dtype) for x in cl]
        return yolox_postprocess(cl, rg, ob, coarse_hw,
                                 score_thr=pipe.coarse_score_thr,
                                 max_dets=pipe.max_coarse)

    timeit_scanned("yolox_postprocess", cpost_fn, ccls, creg, cobj)


if __name__ == "__main__":
    main()
