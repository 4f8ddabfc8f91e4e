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


def _to_global(x, sh: NamedSharding):
    """Host array -> sharded jax.Array, multi-process safe.

    Single-controller: plain ``device_put``.  Under ``--multihost``
    (``jax.process_count() > 1``) the mesh spans devices this process
    cannot address, where ``device_put`` of a host array is invalid;
    every process holds the SAME global host batch (the datasets'
    seeded, deterministic iteration guarantees it — the same contract
    as the reference's per-rank DataLoader with a seeded sampler), and
    ``make_array_from_callback`` materializes only the shards local to
    this process."""
    if jax.process_count() > 1:
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: x[idx])
    return jax.device_put(x, sh)


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-dim (and, for codes
    under a seq mesh, latent-time) sharding; see ``_to_global`` for the
    multi-process contract."""
    if isinstance(batch, dict):
        return {k: _to_global(v, batch_key_sharding(mesh, k))
                for k, v in batch.items()}
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: _to_global(x, sh), batch)


def shard_local_batch(batch: dict, mesh: Mesh):
    """Assemble global sharded arrays from PER-PROCESS batch slices.

    Each process passes only ITS rows of the global batch (the
    ``process_shard`` slice the datasets yield — rows
    ``[rank*b/P, (rank+1)*b/P)``); ``make_array_from_process_local_data``
    maps them onto the process's addressable shards.  This is the
    scalable multihost data path: per-host batch I/O is 1/P of
    ``shard_batch``'s replicated-global contract.

    Requires the mesh's data-axis ownership to be process-contiguous in
    rank order — true for the default ``make_mesh`` over the standard
    process-major device enumeration with pure data parallelism across
    hosts (model/seq axes inside a host); jax validates shard shapes and
    errors otherwise.
    """
    return {k: jax.make_array_from_process_local_data(
                batch_key_sharding(mesh, k), np.asarray(v))
            for k, v in batch.items()}
