"""Class-activation-map visualization (basetools/draw_cam.py analog).

Reference behavior: ``yolox-drone/tools/basetools/draw_cam.py`` hooks an
intermediate feature map, weights its channels by their global average
(``returnCAM``: ``adaptive_avg_pool2d`` -> channel-weighted sum), min-max
normalizes, upsamples to the input size, colormaps (JET) and overlays on
the image.

JAX version: flax ``capture_intermediates=True`` replaces the forward
hook — every module's output is recorded, and ``--layer`` selects one by
path substring (default: the last backbone stage).

Usage:
    python tools/draw_cam.py --config yolox_s_visdrone \
        --checkpoint work_dir/ckpt --image img.jpg --out cam.jpg \
        [--layer backbone] [--index -1]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def compute_cam(feat: np.ndarray) -> np.ndarray:
    """(H, W, C) feature map -> (H, W) normalized activation map.
    Channel weights are the feature's own global average (the
    ``returnCAM`` recipe, draw_cam.py:18-27)."""
    weights = feat.mean(axis=(0, 1))                   # (C,)
    cam = (feat * weights).sum(axis=-1)                # (H, W)
    cam = cam - cam.min()
    rng = cam.max()
    return cam / rng if rng > 0 else cam


def pick_intermediate(tree, key_filter: str, index=None):
    """Flatten the captured 'intermediates' collection and pick a 4D
    feature whose path contains ``key_filter``: by list ``index`` when
    given, else the most-downsampled match (the coarsest semantic
    feature — what CAM wants)."""
    import jax

    leaves, all_names = [], []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        arr = np.asarray(leaf)
        if arr.ndim == 4:
            all_names.append(name)
            if key_filter in name:
                leaves.append((name, arr))
    if not leaves:
        raise SystemExit(
            f"no 4D intermediate matching {key_filter!r}; available: "
            + ", ".join(sorted(set(all_names))[:20]))
    if index is None:
        name, arr = min(leaves,
                        key=lambda kv: kv[1].shape[1] * kv[1].shape[2])
    else:
        name, arr = leaves[index]
    print(f"layer: {name}  shape: {arr.shape}")
    return arr[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--image", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--layer", default="backbone",
                    help="module-path substring to hook")
    ap.add_argument("--index", type=int, default=None,
                    help="which matching feature map (default: the "
                         "most-downsampled match)")
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--cfg-options", nargs="*", metavar="KEY=VAL")
    args = ap.parse_args()

    import cv2
    import jax.numpy as jnp

    from glsdet_tpu.apis import init_detector
    from glsdet_tpu.config import parse_cfg_options
    from glsdet_tpu.data.coco import normalize

    cfg, model, variables = init_detector(
        args.config, args.checkpoint,
        options=parse_cfg_options(args.cfg_options))
    img = cv2.cvtColor(cv2.imread(args.image), cv2.COLOR_BGR2RGB)
    h, w = cfg.data.img_hw
    batch = jnp.asarray(normalize(cv2.resize(img, (w, h)))[None])

    _, state = model.apply(variables, batch, train=False,
                           capture_intermediates=True,
                           mutable=["intermediates"])
    feat = pick_intermediate(state["intermediates"], args.layer,
                             args.index)

    cam = compute_cam(np.asarray(feat, np.float32))
    cam = cv2.resize(cam, (img.shape[1], img.shape[0]))
    heat = cv2.applyColorMap(np.uint8(255 * cam), cv2.COLORMAP_JET)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB)
    overlay = (args.alpha * heat
               + (1 - args.alpha) * img).astype(np.uint8)
    cv2.imwrite(args.out, cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
