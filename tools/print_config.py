#!/usr/bin/env python
"""Print a resolved config tree (mmdet tools/misc/print_config.py analog)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import json


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--cfg-options", nargs="*", metavar="KEY=VAL")
    args = ap.parse_args()

    import ast

    from glsdet_tpu.config import apply_overrides, get_config

    cfg = get_config(args.config)
    opts = {}
    for pair in args.cfg_options or []:
        k, _, v = pair.partition("=")
        try:
            opts[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            opts[k] = v
    apply_overrides(cfg, opts)
    print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))


if __name__ == "__main__":
    main()
