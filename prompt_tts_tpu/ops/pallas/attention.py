"""Fused attention kernel for TPU (Pallas).

One kernel instance handles one (batch*head, q-block) grid cell: it loads a
``[BQ, D]`` query block plus the full ``[Tk, D]`` key/value panels for that
batch-head into VMEM, computes f32 scores + softmax + PV in one pass, and
writes the ``[BQ, D]`` output block — no ``[Tq, Tk]`` score matrix ever
touches HBM.  For this framework's sequence lengths (latent T <= ~1024,
text S = 550) the K/V panels fit VMEM comfortably, so a single-pass
block-softmax is both simpler and faster than a streaming flash loop.

Supported bias: an additive per-key bias ``[B, Tk]`` (the padded-text key
mask).  Richer biases fall back to the XLA path in the dispatcher.

Backward runs as XLA recompute via ``jax.custom_vjp`` — training uses the
(well-fused) XLA gradient while inference gets the fused forward.

Measured (v5e, honest chained-difference timing, B=8 H=8 bf16): the
kernel wins STANDALONE at Tq=900 (467us vs XLA 732 self / 371 vs 435
cross) but loses IN CONTEXT inside the full denoise step (10.13 ms/step
vs 9.86 pure-XLA) — XLA fuses attention with the surrounding projections
better than the kernel boundary can repay at these sizes.  The
dispatcher therefore keeps XLA below Tq=2048 and reserves this kernel
for long-sequence regimes (or PROMPT_TTS_TPU_ATTN=pallas).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BQ = 128          # query block (sublane-friendly)
_NEG = -1e9        # additive mask for padded keys


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, num_heads):
    # q: [BQ, H*D]; k/v: [Tk, H*D]; bias: [1, Tk]; o: [BQ, H*D].
    # Heads are sliced INSIDE the kernel (static unrolled loop) so the
    # caller passes projection outputs in their native [B, T, H*D] layout:
    # the earlier [B,T,H,D]->[B*H,T,D] boundary transposes cost more than
    # the fused kernel saved (in-context A/B: denoise step 10.99 ms with
    # them vs 9.79 ms pure-XLA; see module docstring for the fix).
    # Matmuls run at the INPUT dtype (bf16 on the production path) with
    # f32 accumulation; softmax statistics are f32.  Same numerics class
    # as the XLA bf16 path (max-subtracted f32 exp/sum over bf16-matmul
    # scores); the f32 golden contract never routes here (dispatch gate).
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0].astype(jnp.float32)        # [1, Tk]
    HD = q.shape[-1]
    D = HD // num_heads
    scale = D ** -0.5
    outs = []
    for h in range(num_heads):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale    # [BQ, Tk] f32
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v[:, sl],
                    preferred_element_type=jnp.float32) / denom
        outs.append(o)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads)


def _flash_fwd_impl(q, k, v, key_bias):
    """q/k/v: [B, T, H, D]; key_bias: [B, Tk] additive (f32)."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    HD = H * D

    # native layout: [B, T, H*D] — a FREE reshape of the projection
    # output, so the kernel boundary adds no transposes at all
    qb = _pad_to(q.reshape(B, Tq, HD), 1, _BQ)
    kb = _pad_to(k.reshape(B, Tk, HD), 1, 128)
    vb = _pad_to(v.reshape(B, Tk, HD), 1, 128)
    Tq_p, Tk_p = qb.shape[1], kb.shape[1]

    # fold key padding into the additive bias
    bias = _pad_to(key_bias.astype(jnp.float32), 1, 128)
    if Tk_p != Tk:
        pad_mask = jnp.arange(Tk_p) >= Tk
        bias = jnp.where(pad_mask[None, :], _NEG, bias)
    bias = bias[:, None, :]  # [B, 1, Tk_p]: block == full trailing dims

    grid = (B, Tq_p // _BQ)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=H),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _BQ, HD), lambda b, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk_p, HD), lambda b, iq: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk_p, HD), lambda b, iq: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk_p), lambda b, iq: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BQ, HD), lambda b, iq: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tq_p, HD), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tq_p * Tk_p * D,
            bytes_accessed=(qb.size + kb.size + vb.size) * qb.dtype.itemsize,
            transcendentals=B * H * Tq_p * Tk_p,
        ),
    )(qb, kb, vb, bias)

    return out[:, :Tq, :].reshape(B, Tq, H, D)


def _xla_ref(q, k, v, key_bias):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + key_bias[:, None, None, :].astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@jax.custom_vjp
def _flash(q, k, v, key_bias):
    return _flash_fwd_impl(q, k, v, key_bias)


def _flash_fwd(q, k, v, key_bias):
    return _flash_fwd_impl(q, k, v, key_bias), (q, k, v, key_bias)


def _flash_bwd(res, g):
    q, k, v, key_bias = res
    _, vjp = jax.vjp(_xla_ref, q, k, v, key_bias)
    dq, dk, dv, _ = vjp(g)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused attention over ``[B, T, H, D]``; bias must be key-only.

    ``bias`` may be None or shaped ``[B, 1, 1, Tk]`` (as produced by
    :func:`prompt_tts_tpu.models.layers.mask_to_bias`).
    """
    B, _, _, _ = q.shape
    Tk = k.shape[1]
    if bias is None:
        key_bias = jnp.zeros((B, Tk), jnp.float32)
    else:
        if bias.shape != (B, 1, 1, Tk):
            raise ValueError(f"flash_attention needs key-only bias, got {bias.shape}")
        key_bias = bias.reshape(B, Tk).astype(jnp.float32)
    return _flash(q, k, v, key_bias)
