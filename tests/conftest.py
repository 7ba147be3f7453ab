"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the analog of the reference's in-process DistEvalHook trick
(yolox-ufp/tests/test_runtime/test_eval_hook.py): exercise the
distributed code paths without a real multi-chip cluster.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
