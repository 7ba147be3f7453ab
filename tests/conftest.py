"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the analog of the reference's in-process DistEvalHook trick
(yolox-ufp/tests/test_runtime/test_eval_hook.py): exercise the
distributed code paths without a real multi-chip cluster.
"""

import os

# Must be set before jax is imported anywhere.  Forced (not setdefault):
# the harness environment presets JAX_PLATFORMS=axon (the real-TPU tunnel),
# which tests must never use — they run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize (harness TPU tunnel) force-registers the axon
# platform ahead of the env var; override the config explicitly so tests
# never touch the single real TPU (concurrent test processes would
# serialize/deadlock on it).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


# ---------------------------------------------------------------------------
# Suite tiers: `-m "not slow"` is the fast iteration loop (unit + parity
# math); the full suite + scripts/full_workflow_check.sh remain the
# snapshot gate.  Files listed here get the `slow` marker applied at
# collection (model-compile-heavy, subprocess smokes, multi-minute
# parity harnesses) — per-test granularity wasn't worth the churn on a
# 1-CPU host where whole FILES dominate the wall clock.
# ---------------------------------------------------------------------------

SLOW_FILES = {
    "test_multichip.py",            # 8-device mesh steps + subprocess smoke
    "test_device_color.py",         # full pipelines through jit
    "test_device_geom.py",          # gather-warp + train-step integration
    "test_torch_parity.py",         # torch transplant forwards
    "test_variant_torch_parity.py",
    "test_train_trajectory_parity.py",
    "test_loss_variant_parity.py",
    "test_mpdet_reference_parity.py",
    "test_two_stage.py",            # serving pipeline compiles
    "test_e2e_detection_parity.py",
    "test_golden_driver_parity.py",
    "test_export.py",               # StableHLO round-trips
    "test_multiscale.py",           # real training runs
    "test_iter_based.py",
    "test_freeze.py",
    "test_checkpoint.py",           # orbax round-trips
    "test_serve.py",
    "test_apis.py",
    "test_quant_static.py",
    "test_corruptions.py",
    "test_determinism.py",
    "test_remat.py",
    "test_kmeans_nltk_parity.py",
    "test_pallas_paint.py",         # pallas interpreter on CPU
    "test_pallas_nms.py",
    "test_pallas_gn.py",
    "test_pallas_bottleneck.py",
    # measured >2 min each on the 1-CPU host (full-suite --durations):
    "test_quant.py",
    "test_nms.py",
    "test_train_state.py",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: model-compile-heavy / subprocess tests — "
        "excluded from the fast tier (-m 'not slow')")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if os.path.basename(str(item.fspath)) in SLOW_FILES:
            item.add_marker(_pytest.mark.slow)
