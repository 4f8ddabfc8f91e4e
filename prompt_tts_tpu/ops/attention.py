"""Scaled dot-product attention: dispatcher + XLA reference path.

Layout is ``[B, T, H, D]`` (batch, time, heads, head_dim) — chosen so the
contraction feeds the MXU with D or T on the lane axis without transposes.

The XLA path computes softmax in f32 regardless of input dtype (bf16-safe),
matching the numerics of the diffusers attention the reference depends on
(scale = D**-0.5, additive pre-softmax bias).

A fused Pallas flash-attention kernel (prompt_tts_tpu.ops.pallas.attention)
is used on TPU for long sequences; see `_use_pallas` for the gate.
"""

import functools
from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp

# fused-backward arming (train path).  Like parallel.sp this is scoped
# process-global state consulted at TRACE time: the Trainer arms it
# around its step so only that program's backward routes to the Pallas
# kernel (ops/pallas/attention_bwd.py).  The PRIMAL of the fused-bwd
# wrapper is _xla_attention itself, so arming never changes forward or
# inference numerics — only what jax.grad emits.
#
# On a multi-device mesh the pallas_call has no GSPMD partitioning rule,
# so the armed mesh routes eligible sites through shard_map over the
# (data, model) axes instead: attention is batch- and head-independent,
# so sharding B over ``data`` and H over ``model`` needs no collectives
# and each shard runs the kernel on its local block (the same pattern as
# parallel.sp's ring dispatch, minus the ring).  Seq-parallel meshes are
# excluded — time-sharded activations belong to ring attention / GSPMD.
_FUSED_BWD_ARMED = [False]
_FUSED_BWD_MIN_TQ = [0]   # route only sites with Tq >= this (0 = all)
_FUSED_BWD_MESH = [None]  # multi-device dispatch mesh (None = direct)


def enable_fused_bwd(min_tq: int = 0, mesh=None) -> None:
    _FUSED_BWD_ARMED[0] = True
    _FUSED_BWD_MIN_TQ[0] = min_tq
    _FUSED_BWD_MESH[0] = mesh


def disable_fused_bwd() -> None:
    _FUSED_BWD_ARMED[0] = False
    _FUSED_BWD_MIN_TQ[0] = 0
    _FUSED_BWD_MESH[0] = None


@contextmanager
def fused_bwd_scope(enabled: bool = True, min_tq: int = 0, mesh=None):
    """Arm/disarm the fused attention backward for traces INSIDE this
    scope.  Trace-cache caveat (like parallel.sp): the arming is consulted
    at trace time but is not part of any jit cache key — a function traced
    while armed keeps the fused backward for identical shapes after the
    scope exits (and vice versa).  The Trainer always (re-)enters the
    scope around its step calls so production programs are consistent;
    interactive/test code that flips the arming must use fresh functions
    (or call ``.clear_cache()``) to avoid a stale path."""
    prev = (_FUSED_BWD_ARMED[0], _FUSED_BWD_MIN_TQ[0], _FUSED_BWD_MESH[0])
    _FUSED_BWD_ARMED[0] = enabled
    _FUSED_BWD_MIN_TQ[0] = min_tq
    _FUSED_BWD_MESH[0] = mesh
    try:
        yield
    finally:
        (_FUSED_BWD_ARMED[0], _FUSED_BWD_MIN_TQ[0],
         _FUSED_BWD_MESH[0]) = prev


def _xla_attention(
    q: jnp.ndarray,  # [B, Tq, H, D]
    k: jnp.ndarray,  # [B, Tk, H, D]
    v: jnp.ndarray,  # [B, Tk, H, D]
    bias: Optional[jnp.ndarray],  # broadcastable to [B, H, Tq, Tk]
) -> jnp.ndarray:
    scale = q.shape[-1] ** -0.5
    if q.dtype == jnp.bfloat16:
        # bf16 score storage with f32 exp/sum (flash-attention-style
        # numerics): the [B,H,Tq,Tk] tensors stay bf16, halving their
        # HBM traffic.  (The round-1 "-22% UNet step" figure for this
        # came from the broken relay timing; the path is kept because
        # it is the production-numerics bf16 formulation and XLA fuses
        # it well — see ARCHITECTURE.md scoreboard.)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        if bias is not None:
            s = s + bias.astype(s.dtype)
        m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp((s - m).astype(jnp.float32))
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Attention over ``[B, T, H, D]`` tensors with optional additive bias.

    Dispatches to the fused Pallas kernel on TPU when profitable; the XLA
    path is the semantic reference and the universal fallback.  When a
    sequence-parallel mesh is armed (parallel.sp.enable), self-attention
    over divisible shapes runs as exact ring attention under shard_map.
    """
    from prompt_tts_tpu.parallel import sp as _sp
    if _sp.active_mesh() is not None:
        out = _sp.maybe_ring_attention(q, k, v, bias)
        if out is not None:
            return out
    if _use_fused_bwd(q, k, v, bias):
        return _fused_bwd_call(q, k, v, bias)
    if _use_pallas(q, k, v, bias):
        from prompt_tts_tpu.ops.pallas.attention import flash_attention
        return flash_attention(q, k, v, bias=bias)
    return _xla_attention(q, k, v, bias)


def _use_fused_bwd(q, k, v, bias) -> bool:
    """Route through the custom-vjp wrapper whose primal is the XLA path
    and whose backward is the fused Pallas kernel.  Armed by the caller
    (Trainer) — see enable_fused_bwd/fused_bwd_scope; key-only biases
    (or None) only, like the forward kernel.
    PROMPT_TTS_TPU_ATTN_BWD=pallas|xla overrides the arming."""
    import os
    mode = os.environ.get("PROMPT_TTS_TPU_ATTN_BWD", "auto")
    if mode == "xla":
        return False
    if not (mode == "pallas" or _FUSED_BWD_ARMED[0]):
        return False
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    if Tq < _FUSED_BWD_MIN_TQ[0]:
        return False
    if bias is not None and bias.shape != (B, 1, 1, Tk):
        return False
    mesh = _FUSED_BWD_MESH[0]
    if mesh is not None and mesh.devices.size > 1:
        from prompt_tts_tpu.parallel.mesh import DATA_AXIS, seq_size
        if seq_size(mesh) > 1:
            return False          # SP owns attention on seq meshes
        if B % mesh.shape[DATA_AXIS]:
            return False
    # VMEM budget: gate on the kernel's RESIDENT byte classes, not Tk
    # alone (a wide-head config can blow VMEM at modest Tk; r4 advisor
    # finding).  Counted per grid step (ops/pallas/attention_bwd.py):
    # [Tk_p, H*D] K/V panels at the input dtype (x2 for pipeline
    # double-buffering) + two f32 dk/dv accumulator panels + ~4
    # score-sized [128, Tk_p] f32 temporaries per q-block + the
    # double-buffered [128, H*D] q/do/o blocks and the f32 dq block.
    # Calibrated r5: the f32 text-encoder site (Tk_p=640, H*D=768)
    # measured 19.10 MiB scoped-vmem actual vs the old K/V-only gate's
    # 7.9 MiB estimate and failed at compile; this model estimates it
    # at 16.2 MiB and rejects.  The shipped bf16 sites estimate 6.6 to
    # 11.1 MiB and all compile and run.  12 MiB keeps ~matching margin
    # under the 16 MiB/core scoped limit.
    tk_p = -(-Tk // 128) * 128
    itm = q.dtype.itemsize
    hd = H * D
    est = (tk_p * hd * (4 * itm + 8)        # k/v x2 buffers + f32 dk/dv
           + 128 * tk_p * 16                # f32 score-block temporaries
           + 128 * hd * (3 * itm + 4) * 2)  # q/do/o x2 + f32 dq
    return est <= 12 * 2**20 and D <= 128


def _fused_bwd_call(q, k, v, bias):
    """Invoke the fused-backward wrapper — directly on a single device,
    under shard_map over the armed mesh's (data, model) axes otherwise.
    Attention is independent across batch and heads, so the sharded
    dispatch needs no collectives; heads stay replicated when the model
    axis doesn't divide them (the dp sharding alone is still valid)."""
    from prompt_tts_tpu.ops.pallas.attention_bwd import attention_fused_bwd
    mesh = _FUSED_BWD_MESH[0]
    if mesh is None or mesh.devices.size == 1:
        return attention_fused_bwd(q, k, v, bias)
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map            # jax >= 0.8
    except ImportError:                      # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from prompt_tts_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    n_model = mesh.shape[MODEL_AXIS]
    model = MODEL_AXIS if (n_model > 1 and q.shape[2] % n_model == 0) \
        else None
    spec = P(DATA_AXIS, None, model, None)
    # check_vma=False: the pallas_call's out_shape structs carry no vma
    # annotation, which the varying-mesh-axes checker rejects; the check
    # protects cross-shard dataflow and this dispatch has none (every
    # output element depends only on its own shard's inputs).
    if bias is None:
        fn = shard_map(
            lambda q_, k_, v_: attention_fused_bwd(q_, k_, v_, None),
            mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
            check_vma=False)
        return fn(q, k, v)
    fn = shard_map(
        attention_fused_bwd, mesh=mesh,
        in_specs=(spec,) * 3 + (P(DATA_AXIS, None, None, None),),
        out_specs=spec, check_vma=False)
    return fn(q, k, v, bias)


def _use_pallas(q, k, v, bias) -> bool:
    # Measured on v5e (honest chained-difference timing, round 2).  The
    # fused kernel wins STANDALONE at Tq=900 (467us vs XLA's 732 self /
    # 371 vs 435 cross), but IN CONTEXT — inside the full denoise step —
    # the XLA path wins (9.86 ms/step vs 10.13 with the kernel, even
    # after moving the kernel to the native [B,T,H*D] layout with heads
    # sliced inside): XLA fuses attention with the surrounding
    # projections better than any hand-scheduled boundary can make up
    # for, and at T<=900 the bf16 score tensors still fit its fusion
    # budget.  auto therefore keeps XLA for everything this model runs
    # and reserves the kernel for genuinely long sequences where the
    # [B,H,Tq,Tk] scores stop being fusible.
    # PROMPT_TTS_TPU_ATTN=pallas|xla overrides.
    import os
    mode = os.environ.get("PROMPT_TTS_TPU_ATTN", "auto")
    if mode == "xla" or not _on_tpu():
        return False
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    # Key-only biases (padded-text masks) only; ragged T is padded inside.
    if bias is not None and bias.shape != (B, 1, 1, Tk):
        return False
    if mode == "pallas":
        return Tq >= 128 and Tk >= 128 and D <= 128
    return Tq >= 2048 and Tk >= 2048 and D <= 128
