"""Fused attention BACKWARD kernel (Pallas, TPU) — the train-path twin of
ops/pallas/attention.py.

Round-4 roofline finding (tools/abl_bwd_components.py, v5e, flagship
batch-32 train shapes): every UNet primitive's backward lowers well
(convs 84-99% of bf16 peak) EXCEPT attention — 3.90 ms fwd+bwd at
T=900/C=256 vs a ~0.6 ms compute bound, 15% of peak, because XLA
round-trips the [B, H, Tq, Tk] score/prob/grad tensors through HBM
(414 MB each at batch 32, T=900) several times.

Design: ``attention_fused_bwd`` is a ``jax.custom_vjp`` whose PRIMAL is
the production XLA attention, bit-identical to the dispatcher's default
path (ops/attention._xla_attention) — inference and non-differentiated
traces are untouched, and XLA keeps fusing the forward with the
surrounding projections (the reason the fused FORWARD kernel lost
in-context, see attention.py module docstring).  Only under
differentiation does the backward run here: one kernel instance per
(batch, q-block) recomputes the f32 scores/softmax for its block from
q/k/v (flash-attention style — cheaper than reloading them), then forms
dq for its block and accumulates dk/dv across q-blocks into f32 output
blocks that stay VMEM-resident for the whole batch row.  No score-sized
tensor ever touches HBM.

Layout follows the forward kernel: heads are sliced INSIDE the kernel
from the native [B, T, H*D] projection layout, so the kernel boundary
adds no transposes.  Bias is the key-only padded-text mask ([B, Tk]
additive); richer biases fall back to XLA in the dispatcher.

Numerics: matmuls run at the input dtype with f32 accumulation and the
softmax statistics are f32 — on the bf16 path this recomputes
marginally MORE accurate probabilities than the primal's bf16-stored
scores, so gradients differ from XLA autodiff by O(bf16 eps); the f32
path matches autodiff to f32-reorder tolerance
(tests/test_attention_bwd.py).

Gradient identities (p = softmax(s), s = q k^T * scale + bias,
o = p v):  delta = rowsum(do * o);  dv = p^T do;
ds_raw = p * (do v^T - delta);  dq = ds_raw k * scale;
dk = ds_raw^T q * scale;  dbias = sum_{heads, q rows} ds_raw (reduced
onto the bias's broadcast [B, 1, 1, Tk] shape).  Every call site today
derives the bias from a constant input mask, but the kernel returns the
REAL dbias anyway so a future param-derived key bias of the same shape
trains correctly instead of silently receiving zeros (round-4 advisor
finding).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from prompt_tts_tpu.ops.pallas.attention import _pad_to

_BQ = 128          # query block rows per grid step
_NEG = -1e9        # additive mask for padded keys


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref,
                     dq_ref, dk_ref, dv_ref, db_ref, *, num_heads, scale):
    iq = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        # dk/dv/dbias blocks are revisited across the (inner) q-block
        # grid dim and accumulate in f32 while VMEM-resident
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    q = q_ref[0]                                  # [BQ, HD]
    k = k_ref[0]                                  # [Tk, HD]
    v = v_ref[0]
    do = do_ref[0]                                # [BQ, HD]
    o = o_ref[0]
    bias = bias_ref[0].astype(jnp.float32)        # [1, Tk]
    HD = q.shape[-1]
    D = HD // num_heads
    dq_heads = []
    for h in range(num_heads):
        sl = slice(h * D, (h + 1) * D)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        doh, oh = do[:, sl], o[:, sl]
        # recompute this block's probabilities (f32, like the fwd kernel)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias  # [BQ, Tk]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        pn = p / jnp.sum(p, axis=-1, keepdims=True)
        delta = jnp.sum(doh.astype(jnp.float32) * oh.astype(jnp.float32),
                        axis=-1, keepdims=True)               # [BQ, 1]
        pb = pn.astype(v.dtype)
        # dv_h = pn^T do_h  (contract BQ — the K-rich matmul)
        dv_h = jax.lax.dot_general(
            pb, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [Tk, D]
        dv_ref[0, :, sl] += dv_h.astype(dv_ref.dtype)
        # dp = do_h v_h^T
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [BQ, Tk]
        ds_raw = pn * (dp - delta)                            # = dL/ds
        # dbias: the [B,1,1,Tk] bias broadcasts over heads and q rows,
        # so its cotangent is ds_raw reduced over both (padded q rows
        # have do == 0 => ds_raw == 0: inert)
        db_ref[0, 0, :] += jnp.sum(ds_raw, axis=0).astype(db_ref.dtype)
        ds = (ds_raw * scale).astype(q.dtype)
        dq_heads.append(jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))              # [BQ, D]
        dk_h = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [Tk, D]
        dk_ref[0, :, sl] += dk_h.astype(dk_ref.dtype)
    dq_ref[0] = jnp.concatenate(dq_heads, axis=-1).astype(dq_ref.dtype)


def _bwd_impl(q, k, v, key_bias, o, do) -> Tuple[jnp.ndarray, ...]:
    """q/k/v/o/do: [B, T, H, D]; key_bias: [B, Tk] f32 or None."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    HD = H * D

    qb = _pad_to(q.reshape(B, Tq, HD), 1, _BQ)
    dob = _pad_to(do.reshape(B, Tq, HD), 1, _BQ)   # zero do => zero ds:
    ob = _pad_to(o.reshape(B, Tq, HD), 1, _BQ)     # padded q rows are inert
    kb = _pad_to(k.reshape(B, Tk, HD), 1, 128)
    vb = _pad_to(v.reshape(B, Tk, HD), 1, 128)
    Tq_p, Tk_p = qb.shape[1], kb.shape[1]

    if key_bias is None:
        bias = jnp.zeros((B, Tk), jnp.float32)
    else:
        bias = key_bias.astype(jnp.float32)
    bias = _pad_to(bias, 1, 128)
    if Tk_p != Tk:
        # padded keys: p == 0 there, so their dk/dv stay exactly zero
        bias = jnp.where(jnp.arange(Tk_p)[None, :] >= Tk, _NEG, bias)
    bias = bias[:, None, :]

    grid = (B, Tq_p // _BQ)
    kern = functools.partial(_attn_bwd_kernel, num_heads=H,
                             scale=D ** -0.5)
    q_spec = pl.BlockSpec((1, _BQ, HD), lambda b, iq: (b, iq, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, Tk_p, HD), lambda b, iq: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    dq, dk, dv, db = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            q_spec, kv_spec, kv_spec,
            pl.BlockSpec((1, 1, Tk_p), lambda b, iq: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            q_spec, q_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, _BQ, HD), lambda b, iq: (b, iq, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, kv_spec,
            pl.BlockSpec((1, 1, Tk_p), lambda b, iq: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tq_p, HD), jnp.float32),
            jax.ShapeDtypeStruct((B, Tk_p, HD), jnp.float32),
            jax.ShapeDtypeStruct((B, Tk_p, HD), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Tk_p), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Tq_p * Tk_p * D,   # 5 matmuls
            bytes_accessed=(5 * qb.size + 2 * kb.size) * qb.dtype.itemsize
            + 4 * (B * Tq_p * HD + 2 * B * Tk_p * HD),
            transcendentals=B * H * Tq_p * Tk_p,
        ),
    )(qb, kb, vb, bias, dob, ob)

    dq = dq[:, :Tq].reshape(B, Tq, H, D).astype(q.dtype)
    dk = dk[:, :Tk].reshape(B, Tk, H, D).astype(k.dtype)
    dv = dv[:, :Tk].reshape(B, Tk, H, D).astype(v.dtype)
    db = db[:, 0, :Tk]                                # [B, Tk] f32
    return dq, dk, dv, db


def _xla_primal(q, k, v, bias):
    # the production forward — MUST stay identical to the dispatcher's
    # XLA path so arming the fused backward never changes inference or
    # forward numerics (ops/attention._xla_attention; imported lazily to
    # avoid a module cycle)
    from prompt_tts_tpu.ops.attention import _xla_attention
    return _xla_attention(q, k, v, bias)


@jax.custom_vjp
def attention_fused_bwd(q, k, v, bias):
    """XLA forward + Pallas fused backward; ``bias`` is the dispatcher's
    key-only additive mask ``[B, 1, 1, Tk]`` (or None).  It DOES receive
    its real gradient (ds reduced over heads/q rows) — today every call
    site derives it from a constant input mask so the cotangent dies at
    the mask boundary, but a param-derived bias of the same shape would
    train correctly."""
    return _xla_primal(q, k, v, bias)


def _fwd(q, k, v, bias):
    o = _xla_primal(q, k, v, bias)
    return o, (q, k, v, bias, o)


def _bwd(res, g):
    q, k, v, bias, o = res
    key_bias = None if bias is None else bias.reshape(
        bias.shape[0], bias.shape[-1])
    dq, dk, dv, db = _bwd_impl(q, k, v, key_bias, o, g)
    dbias = None if bias is None else db.astype(bias.dtype).reshape(
        bias.shape)
    return dq, dk, dv, dbias


attention_fused_bwd.defvjp(_fwd, _bwd)
