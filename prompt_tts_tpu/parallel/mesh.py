"""Device mesh + sharding helpers.

The canonical mesh is 3-D ``(data, model, seq)``.  Data parallelism (the
only strategy the reference has — SURVEY.md §2d) shards the batch
dimension over ``data``; ``model`` carries tensor parallelism
(parallel/tp.py Megatron rules) and ``seq`` carries sequence parallelism
(latent-time sharding + ring attention, parallel/sp.py) — both default to
size 1, which degenerates to pure DP.

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
SEQ_AXIS = "seq"

# batch keys whose axis 1 is latent time and therefore sharded over ``seq``
# when the mesh has a non-trivial seq axis ("prompt" stays data-sharded:
# its 225-frame window is small and the prompt encoder pools it globally)
_SEQ_SHARDED_KEYS = ("codes",)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    n_seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model, seq)`` mesh over ``devices`` (default: all).

    ``n_data`` defaults to ``len(devices) // (n_model * n_seq)``.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        if len(devices) % (n_model * n_seq):
            raise ValueError(
                f"{len(devices)} devices not divisible by "
                f"model={n_model} * seq={n_seq}")
        n_data = len(devices) // (n_model * n_seq)
    if n_data * n_model * n_seq > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model}x{n_seq} needs more than "
            f"{len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_model * n_seq]).reshape(
        n_data, n_model, n_seq)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))


def seq_size(mesh: Mesh) -> int:
    """Size of the seq axis (1 for meshes without one)."""
    return mesh.shape.get(SEQ_AXIS, 1) if hasattr(mesh.shape, "get") else (
        mesh.shape[SEQ_AXIS] if SEQ_AXIS in mesh.axis_names else 1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, schedules, rng)."""
    return NamedSharding(mesh, P())


def batch_key_sharding(mesh: Mesh, key: str) -> NamedSharding:
    """Sharding for one batch entry: batch dim over ``data``; latent time
    (axis 1 of ``codes``) additionally over ``seq`` when the mesh has a
    non-trivial seq axis."""
    if key in _SEQ_SHARDED_KEYS and seq_size(mesh) > 1:
        return NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_shardings(mesh: Mesh, batch) -> dict:
    """Per-key sharding dict matching ``batch``'s structure."""
    return {k: batch_key_sharding(mesh, k) for k in batch}


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-dim (and, for codes
    under a seq mesh, latent-time) sharding."""
    if isinstance(batch, dict):
        return {k: jax.device_put(v, batch_key_sharding(mesh, k))
                for k, v in batch.items()}
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
