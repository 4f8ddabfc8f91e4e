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

# --- test tiers -----------------------------------------------------------
# `pytest -m smoke` is the fast iteration tier: the modules below complete
# in ~5 minutes TOTAL on the 1-core box (measured: 274 s in round 3) and
# cover the pure-math / host-logic layers (frontend, config, schedules,
# wav utils).  The full suite (>110 min) is run split in two halves before
# committing — see CLAUDE.md.  Modules are tiered rather than individual
# tests so a new test in a fast module is smoke by default.
_SMOKE_MODULES = {
    "test_config",
    "test_diffusion",
    "test_frontend",
    "test_frontend_edge",
    "test_utils",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        mod = getattr(item, "module", None)
        name = getattr(mod, "__name__", "").rsplit(".", 1)[-1]
        if name in _SMOKE_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)
