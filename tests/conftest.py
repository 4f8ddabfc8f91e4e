"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU (the driver separately dry-runs the
multi-chip path).  Note: this environment's sitecustomize force-registers a
TPU ('axon') platform and rewrites ``jax_platforms``, so the env var alone
is not enough — the flag must be re-set after jax import, before any
backend is touched.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
