"""Tracing / profiling / logging / env collection.

Behavioral references:
- ``mmdet/utils/profiling.py:11`` (profile_time: per-block device+cpu ms
  context manager — CUDA events become ``block_until_ready`` fences).
- ``yolox-drone/models/core/callbacks.py:10`` (LossHistory: per-epoch
  loss txt + smoothed matplotlib plot in the work dir).
- ``mmdet/utils/collect_env.py`` + logger (env + git hash stamped into
  training meta).
"""

from __future__ import annotations

import contextlib
import logging
import os
import subprocess
import sys
import time
from typing import List, Optional


def get_root_logger(log_file: Optional[str] = None,
                    level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger("glsdet_tpu")
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


@contextlib.contextmanager
def profile_time(trace_name: str, name: str, enabled: bool = True,
                 stream=None, end_stream=None):
    """Per-block wall/device timing (profiling.py:11 API shape).

    Uses ``jax.block_until_ready`` fences around the block — the XLA
    analog of CUDA event pairs.  Also opens a jax.profiler TraceAnnotation
    so the block shows up named in profiler traces.
    """
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.TraceAnnotation(f"{trace_name}:{name}"):
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            print(f"{trace_name} {name} cpu_time {dt * 1000:.2f} ms")


def collect_env() -> dict:
    """Environment snapshot stamped into training meta."""
    import jax

    info = {
        "python": sys.version.replace("\n", " "),
        "jax": jax.__version__,
        "devices": [str(d) for d in jax.devices()],
        "default_backend": jax.default_backend(),
    }
    try:
        import flax

        info["flax"] = flax.__version__
    except ImportError:
        pass
    try:
        git = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))))
        if git.returncode == 0:
            info["git_hash"] = git.stdout.strip()
    except OSError:
        pass
    return info


class LossHistory:
    """Per-epoch loss log + smoothed plot (callbacks.py:10).

    Writes ``epoch_loss.txt`` / ``epoch_val_loss.txt`` and a matplotlib
    png per append when matplotlib is available.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.losses: List[float] = []
        self.val_losses: List[float] = []

    def append_loss(self, loss: float, val_loss: Optional[float] = None):
        self.losses.append(float(loss))
        with open(os.path.join(self.log_dir, "epoch_loss.txt"), "a") as f:
            f.write(f"{float(loss)}\n")
        if val_loss is not None:
            self.val_losses.append(float(val_loss))
            with open(os.path.join(self.log_dir,
                                   "epoch_val_loss.txt"), "a") as f:
                f.write(f"{float(val_loss)}\n")
        self._plot()

    def _plot(self):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return
        iters = range(len(self.losses))
        plt.figure()
        plt.plot(iters, self.losses, "red", linewidth=2, label="train loss")
        if self.val_losses:
            plt.plot(range(len(self.val_losses)), self.val_losses,
                     "coral", linewidth=2, label="val loss")
        if len(self.losses) >= 5:
            try:
                from scipy.signal import savgol_filter

                num = 5 if len(self.losses) < 25 else 15
                plt.plot(iters,
                         savgol_filter(self.losses, num, 3),
                         "green", linestyle="--", linewidth=2,
                         label="smooth train loss")
            except ImportError:
                pass
        plt.grid(True)
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        plt.legend(loc="upper right")
        plt.savefig(os.path.join(self.log_dir, "epoch_loss.png"))
        plt.close("all")
