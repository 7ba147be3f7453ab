"""Training-throughput benchmark with roofline/MFU accounting.

The reference's dominant compute is the train hot loop
(yolox-ufp/mmdet/apis/train.py:203 ``runner.run``); this gives the TPU
rebuild's train step the same perf discipline the inference bench has:
measured img/s/chip next to an XLA ``cost_analysis`` roofline and MFU,
so donation/remat regressions are visible as numbers.

Prints ONE json line per benched step (default: the flagship MP-Det
recipe, b8@1024 bf16, remat+donation on — the production loop's exact
jit configuration, train/loop.py:421-427).  ``--model yolox`` benches
the coarse-stage trainer (b8@640).  Also callable via
``python bench.py --train``.

Tunnel discipline (CLAUDE.md): steps chain through the donated state,
and completion is forced by a scalar ``float()`` readback of the last
step's loss — never by ``block_until_ready`` alone.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _mk_batch(rs, b, hw, max_gt=20):
    import jax.numpy as jnp
    import numpy as np

    h, w = hw
    # uint8 frames: the production loop normalizes on device
    # (train/steps.py _prep_images, normalize=True)
    images = rs.randint(0, 255, (b, h, w, 3)).astype(np.uint8)
    n = rs.randint(5, max_gt, b)
    boxes = np.zeros((b, max_gt, 4), np.float32)
    labels = rs.randint(0, 10, (b, max_gt)).astype(np.int32)
    valid = np.zeros((b, max_gt), bool)
    for i in range(b):
        x1 = rs.uniform(0, w - 80, max_gt)
        y1 = rs.uniform(0, h - 80, max_gt)
        bw = rs.uniform(8, 64, max_gt)
        bh = rs.uniform(8, 64, max_gt)
        boxes[i] = np.stack([x1, y1, x1 + bw, y1 + bh], 1)
        valid[i, :n[i]] = True
    return {"images": jnp.asarray(images), "gt_boxes": jnp.asarray(boxes),
            "gt_labels": jnp.asarray(labels), "gt_valid": jnp.asarray(valid)}


def _synthetic_coco(root: str, n_images: int, img_hw, rs,
                    num_classes: int = 10):
    """Write a VisDrone-shaped synthetic COCO set once (cached by dir).

    Source images are ~1.6x the train size so the pipeline's decode +
    mosaic resampling costs are representative, with dense-ish random
    boxes (VisDrone frames average tens of objects)."""
    import json as _json

    import cv2
    import numpy as np

    ann_path = os.path.join(root, "train.json")
    img_dir = os.path.join(root, "images")
    if os.path.exists(ann_path):
        return ann_path, img_dir
    os.makedirs(img_dir, exist_ok=True)
    h = int(img_hw[0] * 1.6)
    w = int(img_hw[1] * 1.6)
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        img = rs.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"{i:04d}.jpg"), img)
        images.append({"id": i + 1, "file_name": f"{i:04d}.jpg",
                       "width": w, "height": h})
        for _ in range(int(rs.randint(20, 60))):
            bw = float(rs.uniform(8, 80))
            bh = float(rs.uniform(8, 80))
            x = float(rs.uniform(0, w - bw))
            y = float(rs.uniform(0, h - bh))
            annotations.append({
                "id": aid, "image_id": i + 1,
                "category_id": int(rs.randint(1, num_classes + 1)),
                "bbox": [x, y, bw, bh], "area": bw * bh, "iscrowd": 0})
            aid += 1
    with open(ann_path, "w") as f:
        _json.dump({
            "images": images, "annotations": annotations,
            "categories": [{"id": c + 1, "name": f"c{c}"}
                           for c in range(num_classes)]}, f)
    return ann_path, img_dir


def bench_train(model_name: str = "mpdet", batch: int = 8,
                size: int | None = None, steps: int = 20,
                remat: bool = True, donate: bool = True,
                scan_steps: int = 1, with_data: bool = False,
                data_workers: int = 0,
                peak_gbps: float = 819.0, peak_tflops: float = 197.0,
                log=print) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from glsdet_tpu.train import TrainState, yolox_sgd, yolox_warm_cos

    rng = jax.random.PRNGKey(0)
    rs = np.random.RandomState(0)
    dtype = jnp.bfloat16
    # GLSDET_MOMENTUM_DTYPE=bfloat16 halves optimizer-state traffic on
    # the hbm-bound steps — the A/B VERDICT r04 asked for
    mdt = os.environ.get("GLSDET_MOMENTUM_DTYPE", "")
    tx = yolox_sgd(yolox_warm_cos(0.01, 100, 1000, 100),
                   momentum_dtype=jnp.bfloat16 if mdt == "bfloat16"
                   else None)

    if model_name == "mpdet":
        from glsdet_tpu.models import MPDet
        from glsdet_tpu.train import init_boiw, make_mpdet_train_step

        hw = (size or 1024,) * 2
        proxies = [2, 3, 2, 5, 4, 8, 8, 4, 3, 3]   # mp_head.py:83 table
        model = MPDet(num_classes=10, depth=50, dtype=dtype, remat=remat,
                      proxies_list=proxies)
        init_x = jnp.zeros((1, 256, 256, 3), jnp.float32)
        variables = jax.jit(
            lambda r, x: model.init(r, x, train=False))(rng, init_x)
        boiw = init_boiw(rng, num_classes=10, num_words=100,
                         feat_channels=256, proxies_list=proxies)
        state = TrainState.create(variables, tx, rng, boiw=boiw)
        step_fn = make_mpdet_train_step(model, tx, hw, 10, proxies,
                                        normalize=True)
    elif model_name == "yolox":
        from glsdet_tpu.models import YOLOXDetector
        from glsdet_tpu.train import make_yolox_train_step

        hw = (size or 640,) * 2
        model = YOLOXDetector(num_classes=10, phi="s", dtype=dtype)
        init_x = jnp.zeros((1, 256, 256, 3), jnp.float32)
        variables = jax.jit(
            lambda r, x: model.init(r, x, train=False))(rng, init_x)
        state = TrainState.create(variables, tx, rng)
        step_fn = make_yolox_train_step(model, tx, hw, normalize=True)
    else:
        raise ValueError(model_name)

    jax.block_until_ready(state.params)
    log(f"{model_name} init done (b{batch}@{hw[0]}, remat={remat}, "
        f"donate={donate})")

    loader = None
    if with_data:
        # real host input pipeline (mosaic+affine+mixup+hsv ON), the
        # thing the synthetic-array mode can't see: whether the host can
        # FEED the chip at the device rate (VERDICT: input-bound training
        # is a real failure mode the device-only bench never measures).
        import multiprocessing

        from glsdet_tpu.data.coco import CocoDataset
        from glsdet_tpu.data.loader import TrainPipeline, train_loader

        workers = data_workers or min(8, multiprocessing.cpu_count())
        data_root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache", f"bench_train_data_{hw[0]}")
        ann, img_root = _synthetic_coco(data_root, 64, hw, rs)
        # decode cache + device color stage: the production input-path
        # defaults (config DataConfig.device_color; cache is what the
        # reference's RAM-cached dataloader mode would do for a 64-image
        # set).  GLSDET_HOST_COLOR=1 A/Bs the all-host pipeline.
        host_color = os.environ.get("GLSDET_HOST_COLOR", "0") == "1"
        # GLSDET_DEVICE_GEOM=1: also warp mosaic geometry on device
        # (data/device_geom.py; the wired A/B the module docstring asks
        # for — upload-heavier, host-lighter)
        device_geom = os.environ.get("GLSDET_DEVICE_GEOM", "0") == "1"
        ds = CocoDataset(ann, img_root, cache_images=not host_color)
        pipeline = TrainPipeline(ds, hw, max_gt=300, raw_uint8=True,
                                 device_color=not host_color,
                                 device_geom=device_geom,
                                 geom_src_hw=(1088, 1440)
                                 if device_geom else None)
        loader = train_loader(pipeline, batch, seed=0,
                              num_threads=workers,
                              prefetch=2 * max(scan_steps, 1))
        log(f"data pipeline on: 64-image synthetic set, {workers} "
            f"loader threads, mosaic+mixup+hsv")

    jit_kw = {"donate_argnums": (0,)} if donate else {}
    if scan_steps > 1:
        # K optimizer steps per dispatch (train/steps.py
        # make_scan_train_step): isolates device time from the tunnel's
        # per-dispatch RPC floor and is the production steps_per_call path
        from glsdet_tpu.train import make_scan_train_step, stack_batches

        step_fn = make_scan_train_step(step_fn)
        if loader is None:
            fixed = jax.tree.map(
                jnp.asarray,
                stack_batches([_mk_batch(rs, batch, hw)
                               for _ in range(scan_steps)]))
            next_batch = lambda: fixed   # device-resident, zero host cost
        else:
            next_batch = lambda: jax.tree.map(
                jnp.asarray,
                stack_batches([next(loader) for _ in range(scan_steps)]))
    else:
        if loader is None:
            fixed = _mk_batch(rs, batch, hw)
            next_batch = lambda: fixed
        else:
            next_batch = lambda: jax.tree.map(jnp.asarray, next(loader))
    batch_d = next_batch()
    step = jax.jit(step_fn, **jit_kw)

    # cost_analysis BEFORE running (donation invalidates `state` after
    # the first call)
    flops = bytes_ = traffic_bytes = None
    traffic_top = []
    try:
        compiled = step.lower(state, batch_d).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        # already per optimizer step even when scan_steps>1: XLA's
        # cost_analysis counts a scan body ONCE regardless of trip
        # count (same behavior as the serving scan_width programs,
        # eval/two_stage.py cost_analysis note) — verified here: the
        # 8-step scan program reports bit-identical flops to the
        # single-step program
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))
        # fusion-level HBM traffic (scripts/hlo_traffic.py): XLA's
        # bytes-accessed bills intra-fusion values as HBM and overcounts
        # small models several-fold (yolox measured 6.2x the roofline in
        # r03) — the entry-dataflow sum is the bandwidth term a roofline
        # can stand on
        try:
            from hlo_traffic import compiled_traffic

            traffic = compiled_traffic(compiled)
            traffic_bytes = float(traffic["bytes"])
            traffic_top = traffic.get("top", [])
        except Exception as e:
            log(f"hlo traffic model unavailable: "
                f"{type(e).__name__}: {e}")
    except Exception as e:  # backend-dependent
        log(f"cost_analysis unavailable: {type(e).__name__}: {e}")

    def last_loss(metrics):
        loss = metrics["loss"]
        return float(loss[-1] if getattr(loss, "ndim", 0) else loss)

    t0 = time.time()
    state, metrics = step(state, batch_d)
    first_loss = last_loss(metrics)
    compile_s = time.time() - t0
    log(f"first step (compile) {compile_s:.0f}s, loss={first_loss:.3f}")
    assert np.isfinite(first_loss), "non-finite loss"

    # warm once more, then time a chained run; the final scalar
    # readback forces the whole chain on the tunnel backend
    state, metrics = step(state, next_batch())
    last_loss(metrics)
    t0 = time.time()
    for _ in range(steps):
        state, metrics = step(state, next_batch())
    last = last_loss(metrics)
    dt = time.time() - t0
    if loader is not None:
        loader.close()   # join the producer thread (clean teardown)
    opt_steps = steps * scan_steps
    ips = opt_steps * batch / dt
    assert np.isfinite(last), "non-finite loss after timed steps"
    log(f"{opt_steps} steps in {dt:.2f}s -> {ips:.2f} img/s "
        f"({1000 * dt / opt_steps:.0f} ms/step)")

    detail = {
        "model": model_name, "batch": batch, "hw": list(hw),
        "dtype": "bfloat16", "remat": remat, "donate": donate,
        "compile_s": round(compile_s, 1),
        "platform": jax.devices()[0].platform,
        "ms_per_step": round(1000 * dt / opt_steps, 1),
        "scan_steps": scan_steps,
        "data_included": bool(with_data),
        "remat_policy": os.environ.get("GLSDET_REMAT_POLICY", "none"),
        "momentum_dtype": os.environ.get("GLSDET_MOMENTUM_DTYPE",
                                         "float32"),
    }
    if with_data:
        import multiprocessing

        detail["loader_threads"] = (data_workers
                                    or min(8, multiprocessing.cpu_count()))
        detail["host_cpus"] = multiprocessing.cpu_count()
        detail["device_color"] = not host_color
        detail["decode_cache"] = not host_color
        detail["device_geom"] = device_geom
    if flops:
        peak_bw = peak_gbps * 1e9
        peak_fl = peak_tflops * 1e12
        # bandwidth term: the measured entry-dataflow traffic when
        # available (see above), else XLA's overcounting bytes-accessed
        bw_bytes = traffic_bytes if traffic_bytes else bytes_
        t_roof = max(bw_bytes / peak_bw, flops / peak_fl)
        roof_ips = batch / t_roof
        mfu = (flops / (dt / opt_steps)) / peak_fl
        detail["roofline"] = {
            "per_step": {"flops": flops, "bytes_cost_model": bytes_,
                         "bytes_hbm_traffic": traffic_bytes},
            # where the GB/step go: the 20 biggest entry instructions
            # (GB, name, opcode) — the lever list for remat-policy and
            # layout experiments
            "top_traffic": [
                {"GB": round(t["bytes"] / 1e9, 3), "name": t["name"],
                 "opcode": t["opcode"], "op": t.get("op", "")}
                for t in traffic_top[:20]],
            "assumed_hbm_GBps": peak_gbps,
            "assumed_peak_TFLOPs": peak_tflops,
            "roofline_images_per_sec": round(roof_ips, 1),
            "fraction_of_roofline": round(ips / roof_ips, 3),
            "mfu": round(mfu, 3),
            "bound": ("hbm" if bw_bytes / peak_bw > flops / peak_fl
                      else "mxu"),
        }
        if ips > roof_ips:
            detail["roofline"]["note"] = (
                "bytes model overcounts (measured exceeds roofline); "
                "read MFU, not fraction_of_roofline")
        log(f"roofline {roof_ips:.0f} img/s ideal -> {ips:.1f} = "
            f"{ips / roof_ips:.1%}; MFU {mfu:.1%} "
            f"({detail['roofline']['bound']}-bound, bw bytes "
            f"{'traffic' if traffic_bytes else 'cost-model'})")
    return {
        "metric": (f"{model_name}_train_images_per_sec_per_chip"
                   + ("_with_data" if with_data else "")),
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        # generous reference-GPU estimate: mmdet GFL-R50 1x trains at
        # ~15-19 img/s on a V100 (mmdet model-zoo train-time tables);
        # the reference repo publishes no training speed of its own
        "vs_baseline": round(ips / 15.0, 3),
        "detail": detail,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mpdet",
                    choices=["mpdet", "yolox", "both"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--no-donate", action="store_true")
    ap.add_argument("--scan-steps", type=int, default=1,
                    help="optimizer steps per dispatch (lax.scan group)")
    ap.add_argument("--with-data", action="store_true",
                    help="pull batches through the real TrainPipeline/"
                         "train_loader (mosaic+affine+hsv on) instead of "
                         "fixed device-resident arrays")
    ap.add_argument("--data-workers", type=int, default=0,
                    help="loader threads for --with-data (0 = auto)")
    args = ap.parse_args(argv)

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def log(msg):
        print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr,
              flush=True)

    names = ["mpdet", "yolox"] if args.model == "both" else [args.model]
    outs = []
    for name in names:
        out = bench_train(name, batch=args.batch, size=args.size,
                          steps=args.steps, remat=not args.no_remat,
                          donate=not args.no_donate,
                          scan_steps=args.scan_steps,
                          with_data=args.with_data,
                          data_workers=args.data_workers, log=log)
        print(json.dumps(out), flush=True)
        outs.append(out)
    if args.model == "both":
        # the ledger's training source of truth (scripts/perf_ledger.py)
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "TRAINBENCH.json")
        with open(path, "w") as f:
            f.write("\n".join(json.dumps(o) for o in outs) + "\n")
        log(f"wrote {path}")


if __name__ == "__main__":
    main()
