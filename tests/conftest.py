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
