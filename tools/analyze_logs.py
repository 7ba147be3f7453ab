#!/usr/bin/env python
"""Training-log analysis CLI.

Behavioral reference: ``yolox-ufp/tools/analysis_tools/analyze_logs.py``
— plot loss/metric curves from the json log and compute average iteration
time.  Reads the ``train.log.json`` files written by the training loop.

    python tools/analyze_logs.py plot_curve work_dirs/x/train.log.json --keys loss
    python tools/analyze_logs.py cal_train_time work_dirs/x/train.log.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def load_log(path):
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def cal_train_time(entries):
    times = [e["time"] for e in entries if "time" in e]
    if not times:
        print("no timing entries")
        return
    times = np.asarray(times)
    print(f"average iter time: {times.mean():.4f} s/iter")
    print(f"fastest: {times.min():.4f}  slowest: {times.max():.4f}")


def plot_curve(entries, keys, out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    for key in keys:
        xs = [e["step"] for e in entries if key in e]
        ys = [e[key] for e in entries if key in e]
        plt.plot(xs, ys, label=key)
    plt.xlabel("step")
    plt.legend()
    plt.grid(True)
    plt.savefig(out)
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("task", choices=["plot_curve", "cal_train_time"])
    ap.add_argument("json_log")
    ap.add_argument("--keys", nargs="+", default=["loss"])
    ap.add_argument("--out", default="curve.png")
    args = ap.parse_args()

    entries = load_log(args.json_log)
    if args.task == "cal_train_time":
        cal_train_time(entries)
    else:
        plot_curve(entries, args.keys, args.out)


if __name__ == "__main__":
    main()
