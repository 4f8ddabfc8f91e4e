"""Device mesh + sharding helpers.

The canonical mesh is 2-D ``(data, model)``.  Data parallelism (the only
strategy the reference has — SURVEY.md §2d) shards the batch dimension over
``data``; the ``model`` axis is reserved for tensor-parallel extensions and
defaults to size 1.

Collectives ride ICI: XLA inserts the gradient all-reduce when the jitted
train step consumes data-sharded batches and produces replicated params —
the SPMD equivalent of DDP's backward hook allreduce (reference train.py:115).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over ``devices`` (default: all).

    ``n_data`` defaults to ``len(devices) // n_model``.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        if len(devices) % n_model:
            raise ValueError(
                f"{len(devices)} devices not divisible by model={n_model}")
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, schedules, rng)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
