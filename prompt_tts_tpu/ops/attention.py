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
from typing import Optional

import jax
import jax.numpy as jnp


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
    if _use_pallas(q, k, v, bias):
        from prompt_tts_tpu.ops.pallas.attention import flash_attention
        return flash_attention(q, k, v, bias=bias)
    return _xla_attention(q, k, v, bias)


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
