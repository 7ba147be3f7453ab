#!/usr/bin/env python
"""Import a reference torch ``.pth`` checkpoint into this framework.

Migration path for users of the reference repos: bring your trained
weights, keep your accuracy, gain the TPU runtime.

    # coarse detector (yolox-drone YoloBody .pth)
    python tools/import_torch_weights.py yolox_s.pth out_ckpt \\
        --arch yolox --config coarse_det

    # stage-2 detector (yolox-ufp mmdet GFL/MP-Det .pth)
    python tools/import_torch_weights.py mp_det.pth out_ckpt \\
        --arch mpdet --config mp_det_res50

The output is an orbax weights artifact ({params, batch_stats[, boiw]})
consumable by ``--load-from`` everywhere (train/loop.py load_weights),
``apis.init_detector`` and the serving CLIs.  Key rewriting lives in
glsdet_tpu/utils/torch_import.py; forward parity of the conversion is
pinned by tests/test_torch_parity.py against the actual reference torch
models.

mmdet-style checkpoints may wrap the weights as {'state_dict': ...}
(mmcv convention) and may carry the MPHead BoIW dictionary buffers
(mp_head.py:80-92); the latter are extracted into a ``boiw`` section so
resumed training keeps the dictionary.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src", help="torch .pth checkpoint")
    ap.add_argument("dst", help="output orbax checkpoint dir")
    ap.add_argument("--arch", choices=("yolox", "mpdet"), required=True,
                    help="state-dict naming family: yolox-drone YoloBody "
                         "or mmdet-style GFL/MP-Det")
    ap.add_argument("--config", default=None,
                    help="named config to build the target model "
                         "(default: coarse_det / mp_det_res50 per arch)")
    ap.add_argument("--cfg-options", nargs="*", default=[],
                    help="KEY=VAL dotted config overrides")
    ap.add_argument("--no-strict", action="store_true",
                    help="shape-matched partial load: skip unmatched "
                         "keys / leave uncovered leaves at init instead "
                         "of failing (yolox-drone train.py:139-165)")
    args = ap.parse_args()

    import torch

    raw = torch.load(args.src, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:   # mmcv wrapper
        raw = raw["state_dict"]
    if isinstance(raw, dict) and "model" in raw and all(
            not torch.is_tensor(v) for v in raw.values()):
        raw = raw["model"]
    state = {k: v.detach().cpu().numpy() for k, v in raw.items()
             if torch.is_tensor(v)}
    print(f"loaded {len(state)} tensors from {args.src}")

    import jax
    import jax.numpy as jnp

    from glsdet_tpu.config import (apply_overrides, get_config,
                                   parse_cfg_options)
    from glsdet_tpu.train.loop import build_model
    from glsdet_tpu.utils.torch_import import (convert_mpdet,
                                               convert_yolox_drone)

    cfg_name = args.config or (
        "coarse_det" if args.arch == "yolox" else "mp_det_res50")
    cfg = get_config(cfg_name)
    apply_overrides(cfg, parse_cfg_options(args.cfg_options))
    model = build_model(cfg)
    template = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 128, 128, 3)), train=False))(jax.random.PRNGKey(0))
    template = jax.tree.map(np.asarray, template)

    convert = convert_yolox_drone if args.arch == "yolox" else convert_mpdet
    variables, report = convert(state, template, strict=not args.no_strict)
    print(report.summary())
    for key in report.unmatched[:10]:
        print(f"  unmatched: {key}")
    for leaf in report.missing[:10]:
        print(f"  left at init: {leaf}")

    out = dict(variables)
    if args.arch == "mpdet" and "bbox_head._embedding" in state:
        # BoIW ring buffer -> TrainState.boiw section (train/boiw.py)
        out["boiw"] = {
            "embedding": state["bbox_head._embedding"].astype(np.float32),
            "ptr": state["bbox_head._pos_embedding_ptr"].astype(np.int32),
            "proxies_prob": state["bbox_head._proxies_prob"].astype(
                np.float32),
            "beta": np.zeros((), np.float32),
        }
        print("extracted BoIW dictionary buffers -> boiw section")

    if args.no_strict and report.missing:
        # partial load: fill uncovered leaves from the fresh init so the
        # artifact stays self-contained
        from flax.traverse_util import flatten_dict, unflatten_dict

        for coll in ("params", "batch_stats"):
            if coll not in template:
                continue
            flat_t = flatten_dict(template[coll])
            flat_o = flatten_dict(out.get(coll, {}))
            for k, v in flat_t.items():
                flat_o.setdefault(k, np.asarray(v))
            out[coll] = unflatten_dict(flat_o)

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.dst),
               jax.tree.map(np.asarray, out), force=True)
    ckptr.wait_until_finished()
    n_params = sum(int(np.asarray(x).size)
                   for x in jax.tree_util.tree_leaves(out["params"]))
    print(f"wrote {args.dst} ({n_params / 1e6:.2f}M params); load with "
          f"--load-from")


if __name__ == "__main__":
    main()
