"""Debugging aids: NaN guards and finite checks.

The reference has no numerical-safety tooling at all (SURVEY.md §5: its
closest artifact is DDP find_unused_parameters).  JAX's pure functions +
deterministic PRNG remove most of the hazard class; these helpers cover
the rest.
"""

from typing import Any

import jax
import jax.numpy as jnp


def enable_nan_checks() -> None:
    """Global debug-nans mode: any NaN-producing op raises (slow; dev only)."""
    jax.config.update("jax_debug_nans", True)


def check_finite(tree: Any, name: str = "pytree") -> None:
    """Host-side check that every leaf is finite; raises with the leaf path."""
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = jnp.asarray(leaf)
        if not bool(jnp.isfinite(arr).all()):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def finite_or_warn(metrics: dict, step: int, log) -> bool:
    """Cheap per-step guard on scalar metrics; returns False on NaN/Inf."""
    import math
    for k, v in metrics.items():
        v = float(v)
        if not math.isfinite(v):
            log.error("non-finite metric %s=%s at step %d", k, v, step)
            return False
    return True
