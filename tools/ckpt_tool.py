#!/usr/bin/env python
"""Checkpoint utility: inspect / re-stamp / strip / EMA-swap.

Behavioral reference: ``yolox-drone/tools/basetools/ckpt_converter.py``
(``init_train`` resets a checkpoint's epoch/iter meta for warm restart)
and mmcv's EMA param swap (``core/hook/ema.py:84-102``).  Operates on
this framework's orbax checkpoints (TrainState pytrees):

- ``inspect <ckpt>``: section/leaf/parameter summary + step.
- ``restamp <src> <dst> [--step N]``: copy with ``step`` reset (the
  init_train analog — restart schedules from N on resume).
- ``strip <src> <dst> [--keep-ema/--no-keep-ema]``: weights-only serving
  artifact (drop optimizer moments + rng; loadable via ``--load-from``
  and ``apis.init_detector``).
- ``swap-ema <src> <dst>``: exchange params <-> ema_params (serve the
  raw weights, or continue training from the EMA point).
- ``publish <src> <dst>``: strip + rename to ``<dst>-<sha256[:8]>``
  (tools/model_converters/publish_model.py analog).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def _save(path, tree):
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.tree.map(np.asarray, tree),
               force=True)
    ckptr.wait_until_finished()


def _section_stats(tree):
    import jax

    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(tree)]
    return (len(leaves), sum(int(l.size) for l in leaves),
            sum(int(l.size) * l.dtype.itemsize for l in leaves))


def cmd_inspect(args, raw):
    step = raw.get("step")
    if step is not None:
        print(f"step: {int(np.asarray(step))}")
    for name in sorted(raw):
        if name == "step":
            continue
        n, size, nbytes = _section_stats(raw[name])
        print(f"{name:12s} {n:5d} arrays  {size / 1e6:10.2f}M params  "
              f"{nbytes / 1e6:8.1f} MB")
    if args.verbose:
        from flax.traverse_util import flatten_dict

        for key, val in sorted(flatten_dict(
                {k: v for k, v in raw.items() if isinstance(v, dict)}
        ).items()):
            val = np.asarray(val)
            print("  " + "/".join(map(str, key)),
                  tuple(val.shape), val.dtype)


def cmd_restamp(args, raw):
    raw = dict(raw)
    raw["step"] = np.asarray(args.step, np.int32)
    _save(args.dst, raw)
    print(f"{args.src} -> {args.dst} (step={args.step})")


def cmd_strip(args, raw):
    keep = {"params", "batch_stats", "boiw"}
    if args.keep_ema:
        keep.add("ema_params")
    out = {k: v for k, v in raw.items() if k in keep and v is not None}
    _save(args.dst, out)
    n, size, nbytes = _section_stats(out)
    print(f"{args.src} -> {args.dst}: {sorted(out)} "
          f"({size / 1e6:.2f}M params, {nbytes / 1e6:.1f} MB)")


def cmd_publish(args, raw):
    """Weights-only artifact with a content-hash-stamped name.

    The ``tools/model_converters/publish_model.py`` analog: strip the
    optimizer state, save, then append ``-<sha256[:8]>`` to the
    directory name so published checkpoints are content-addressed.
    """
    import hashlib

    keep = {"params", "batch_stats", "boiw"}
    if args.keep_ema:
        keep.add("ema_params")
    from flax.traverse_util import flatten_dict

    out = {k: v for k, v in raw.items() if k in keep and v is not None}
    dst = args.dst.rstrip("/")
    _save(dst, out)

    # hash the pytree (key paths + dtypes + shapes + bytes), not the
    # serialized files: orbax metadata embeds timestamps/paths, which
    # would break content addressing
    h = hashlib.sha256()
    for key, val in sorted(flatten_dict(out).items()):
        val = np.asarray(val)
        h.update("/".join(map(str, key)).encode())
        h.update(str(val.dtype).encode())
        h.update(str(val.shape).encode())
        h.update(np.ascontiguousarray(val).tobytes())
    final = f"{dst}-{h.hexdigest()[:8]}"
    if os.path.exists(final):
        import shutil

        shutil.rmtree(final)
    os.rename(dst, final)
    n, size, nbytes = _section_stats(out)
    print(f"{args.src} -> {final}: {sorted(out)} "
          f"({size / 1e6:.2f}M params, {nbytes / 1e6:.1f} MB)")


def cmd_swap_ema(args, raw):
    if "ema_params" not in raw:
        raise SystemExit(f"{args.src} has no ema_params section")
    raw = dict(raw)
    raw["params"], raw["ema_params"] = raw["ema_params"], raw["params"]
    _save(args.dst, raw)
    print(f"{args.src} -> {args.dst} (params <-> ema_params)")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("inspect")
    p.add_argument("src")
    p.add_argument("--verbose", action="store_true",
                   help="per-array shapes")

    p = sub.add_parser("restamp")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--step", type=int, default=0)

    p = sub.add_parser("strip")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--keep-ema", action=argparse.BooleanOptionalAction,
                   default=True)

    p = sub.add_parser("publish")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--keep-ema", action=argparse.BooleanOptionalAction,
                   default=True)

    p = sub.add_parser("swap-ema")
    p.add_argument("src")
    p.add_argument("dst")

    args = ap.parse_args()

    from flax import serialization

    from glsdet_tpu.train.loop import restore_raw

    raw = restore_raw(args.src)
    if not isinstance(raw, dict):
        raw = serialization.to_state_dict(raw)
    {"inspect": cmd_inspect, "restamp": cmd_restamp,
     "strip": cmd_strip, "publish": cmd_publish,
     "swap-ema": cmd_swap_ema}[args.cmd](args, raw)


if __name__ == "__main__":
    main()
