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
        # numerics): the [B,H,Tq,Tk] tensors stay bf16, halving the HBM
        # traffic that dominates attention here (-22% UNet step time
        # measured on v5e at [8,900]x[8,550]).
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
    path is the semantic reference and the universal fallback.
    """
    if _use_pallas(q, k, v, bias):
        from prompt_tts_tpu.ops.pallas.attention import flash_attention
        return flash_attention(q, k, v, bias=bias)
    return _xla_attention(q, k, v, bias)


def _use_pallas(q, k, v, bias) -> bool:
    # Measured on v5e at this model's shapes (honest chained-difference
    # timing, tools/abl_attention.py round 2 — the round-1 numbers that
    # favored XLA were async-relay artifacts): the fused kernel wins at
    # the long-sequence levels (Tq=900: 394us vs XLA's 681 self / 452
    # cross) and is a wash or slightly behind at Tq<=450.  auto enables it
    # for Tq >= 512 on bf16 inputs; f32 inputs keep the XLA path so the
    # f32 golden-parity contract is untouched (the kernel does its matmuls
    # in bf16 with f32 accumulate/softmax — same numerics class as the
    # bf16 XLA path).  PROMPT_TTS_TPU_ATTN=pallas|xla overrides.
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
    return (q.dtype == jnp.bfloat16 and Tq >= 512 and Tk >= 128
            and D <= 128)
