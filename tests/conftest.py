"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU (the driver separately dry-runs the
multi-chip path); env vars must be set before jax initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep test numerics deterministic and f32 (TPU-style bf16 paths are tested
# explicitly where intended).
os.environ.setdefault("JAX_ENABLE_X64", "0")
