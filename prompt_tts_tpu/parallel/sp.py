"""Sequence parallelism: latent-time sharding + ring attention dispatch.

The reference has no sequence parallelism (SURVEY.md §2d: all attention is
full/dense on one device over <=900-frame latents); this is the survey's
"natural extension" made a real capability: activations are sharded along
the time axis over the mesh ``seq`` axis, XLA/GSPMD handles the convs
(spatial partitioning inserts the k=3 halo exchanges automatically), and
self-attention — the one op whose every output row needs every input row —
runs as exact ring attention (``ops.ring_attention``): K/V shards rotate
around the ``seq`` ring with ``lax.ppermute`` while flash-style online
softmax statistics accumulate.  Cross-attention needs no communication at
all: queries stay time-sharded and the (replicated) text context is fully
visible on every device.

Wiring: :func:`enable` (or the :func:`sequence_parallel` context manager)
arms a module-level state that ``ops.scaled_dot_product_attention``
consults at trace time; self-attention calls whose static shapes divide
the mesh are then computed under ``shard_map``.  Everything else falls
back to the XLA path unchanged, so enabling SP is always semantics-
preserving (ring attention equals full attention to f32 noise —
tests/test_ring_attention.py, tests/test_sp.py).
"""

from contextlib import contextmanager
from typing import Optional

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map            # jax >= 0.8
except ImportError:                      # pragma: no cover
    from jax.experimental.shard_map import shard_map

from prompt_tts_tpu.ops.ring_attention import ring_attention
from prompt_tts_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, SEQ_AXIS, seq_size,
)

_STATE = {"mesh": None, "ring_traces": 0, "ring_tqs": []}


def enable(mesh: Mesh) -> None:
    """Arm sequence-parallel attention dispatch for subsequent traces."""
    _STATE["mesh"] = mesh


def disable() -> None:
    _STATE["mesh"] = None


def ring_trace_count() -> int:
    """How many attention sites dispatched to the ring path at trace time
    (diagnostic: lets tests assert SP actually engaged rather than
    silently falling back)."""
    return _STATE["ring_traces"]


def ring_trace_tqs() -> list:
    """The static sequence length (Tq) of every site that dispatched to
    the ring path, in trace order — lets geometry tests assert WHICH
    UNet pyramid levels engaged (e.g. 900/450 under sp=2) and which fell
    back (odd levels like 225/113)."""
    return list(_STATE["ring_tqs"])


def active_mesh() -> Optional[Mesh]:
    mesh = _STATE["mesh"]
    if mesh is None or SEQ_AXIS not in mesh.axis_names:
        return None
    return mesh if seq_size(mesh) > 1 else None


@contextmanager
def sequence_parallel(mesh: Mesh):
    prev = _STATE["mesh"]
    _STATE["mesh"] = mesh
    try:
        yield
    finally:
        _STATE["mesh"] = prev


def maybe_ring_attention(q, k, v, bias) -> Optional[jnp.ndarray]:
    """Seq-sharded exact attention when the SP state and shapes allow.

    Applies to SELF-attention only (``Tq == Tk``): ring rotation over the
    ``seq`` axis.  Cross-attention (time-sharded queries against the
    replicated text context) is left to GSPMD — it is communication-free,
    so the plain XLA path already parallelizes it.  Returns ``None`` when
    not applicable (caller falls through to the normal path); every gate
    below is a static-shape check, so the decision is made once per trace.
    """
    mesh = active_mesh()
    if mesh is None:
        return None
    sp = seq_size(mesh)
    B, Tq, H, D = q.shape
    if k.shape != q.shape or v.shape != q.shape:
        return None                      # cross-attention: GSPMD handles it
    if Tq % sp or (Tq // sp) < 1:
        return None                      # odd pyramid levels fall back
    n_data = mesh.shape[DATA_AXIS]
    if B % n_data:
        return None
    key_bias = None
    if bias is not None:
        if bias.shape != (B, 1, 1, Tq):
            return None                  # key-only biases (padded text)
        key_bias = bias.reshape(B, Tq).astype(jnp.float32)

    n_model = mesh.shape[MODEL_AXIS]
    model = MODEL_AXIS if (n_model > 1 and H % n_model == 0) else None
    qkv = P(DATA_AXIS, SEQ_AXIS, model, None)
    _STATE["ring_traces"] += 1
    _STATE["ring_tqs"].append(int(Tq))

    if key_bias is None:
        fn = shard_map(
            lambda q_, k_, v_: ring_attention(
                q_, k_, v_, axis_name=SEQ_AXIS, axis_size=sp),
            mesh=mesh, in_specs=(qkv,) * 3, out_specs=qkv)
        return fn(q, k, v)
    fn = shard_map(
        lambda q_, k_, v_, b_: ring_attention(
            q_, k_, v_, axis_name=SEQ_AXIS, axis_size=sp, key_bias=b_),
        mesh=mesh, in_specs=(qkv,) * 3 + (P(DATA_AXIS, SEQ_AXIS),),
        out_specs=qkv)
    return fn(q, k, v, key_bias)
