"""Codec conv/LSTM primitives with EnCodec's exact padding semantics.

All modules are channels-last ``[B, T, C]``.  Padding amounts are computed
statically from the (static) input length, reproducing the causal
reflect-padding of the torch EncodecConv1d (see
transformers modeling_encodec.EncodecConv1d; the reference consumes the
same math through the encodec package at generate_code.py:48).
"""

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def causal_pad_amounts(length: int, kernel_size: int, stride: int,
                       dilation: int = 1) -> Tuple[int, int]:
    """(left, right) pads for a causal EnCodec conv at static ``length``.

    left = effective_kernel - stride; right = extra padding so the final
    window lands exactly at the end (ceil semantics).
    """
    k_eff = (kernel_size - 1) * dilation + 1
    padding_total = k_eff - stride
    n_frames = (length - k_eff + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + k_eff - padding_total
    extra = ideal - length
    return padding_total, extra


def reflect_pad(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """Reflect-pad along T of ``[B, T, C]`` with the torch small-input
    fallback (zero-extend right first when T <= max pad)."""
    T = x.shape[1]
    max_pad = max(left, right)
    if T <= max_pad:
        extra = max_pad - T + 1
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
        padded = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
        return padded[:, : padded.shape[1] - extra, :]
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")


class CodecConv1d(nn.Module):
    """Causal conv with EnCodec padding (weight-norm already folded).

    Note (measured, round 2): a space-to-depth folded execution for the
    long-T narrow-C decoder stages was tried and REVERTED — the per-conv
    [B,T,C]->[B,T/F,F*C] reshape is a real relayout on TPU tiled memory
    and cost more than the recovered lanes (resnet-64 stage 2x slower);
    folding a whole region instead conflicts with per-conv REFLECT
    padding (zero-fill folded halos change the first k-1 samples).
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        left, right = causal_pad_amounts(
            x.shape[1], self.kernel_size, self.stride, self.dilation)
        x = reflect_pad(x, left, right)
        return nn.Conv(
            features=self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            dtype=self.dtype,
            name="conv",
        )(x)


class CodecConvTranspose1d(nn.Module):
    """Transposed conv with causal right-trim (trim_right_ratio = 1)."""

    out_channels: int
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.ConvTranspose(
            features=self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding="VALID",
            transpose_kernel=True,
            dtype=self.dtype,
            name="conv",
        )(x)
        padding_total = self.kernel_size - self.stride
        # causal: trim everything from the right
        return y[:, : y.shape[1] - padding_total, :]


class CodecLSTM(nn.Module):
    """2-layer LSTM + residual, torch gate semantics.

    TPU shaping: the input projection ``x @ W_ih^T`` for ALL timesteps is
    one big MXU matmul outside the recurrence.  The recurrence itself runs
    as ``lax.scan`` (unroll=8) by default; ``use_pallas=True`` selects the
    fused kernel (weights VMEM-resident, one kernel for the whole
    sequence — prompt_tts_tpu.ops.pallas.lstm), which is bit-exact and a
    measured wash at this model's shapes (see field comment).
    """

    hidden: int
    num_layers: int = 2
    # Standalone micro-timings flip between runs (pallas 0.84 vs scan
    # 1.15 us/step one run, 1.27 vs 1.01 the next — environment noise);
    # the decisive FULL-DECODE A/B is a wash (22.5-22.7 ms both ways,
    # tools round 2).  Default to the simpler, differentiable scan; the
    # bit-exact Pallas kernel stays selectable (use_pallas=True) for
    # regimes where the recurrence dominates (e.g. much longer T).
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        residual = x
        B = x.shape[0]
        h_dim = self.hidden
        on_tpu = jax.default_backend() == "tpu"
        for layer in range(self.num_layers):
            w_ih = self.param(
                f"l{layer}_w_ih",
                nn.initializers.xavier_uniform(), (4 * h_dim, x.shape[-1]),
                jnp.float32)
            w_hh = self.param(
                f"l{layer}_w_hh",
                nn.initializers.xavier_uniform(), (4 * h_dim, h_dim),
                jnp.float32)
            b = self.param(f"l{layer}_b", nn.initializers.zeros,
                           (4 * h_dim,), jnp.float32)

            # [B, T, 4H]: all input projections in one matmul
            x_proj = jnp.einsum(
                "btc,gc->btg", x.astype(self.dtype), w_ih.astype(self.dtype),
                preferred_element_type=jnp.float32) + b
            x_proj_t = x_proj.astype(jnp.float32).transpose(1, 0, 2)

            if self.use_pallas and on_tpu:
                from prompt_tts_tpu.ops.pallas.lstm import lstm_recurrence
                # kernel gate layout is [i|f|g|o] contiguous — same as torch
                hs = lstm_recurrence(x_proj_t, w_hh.T)
            else:
                def step(carry, xp):
                    h, c = carry
                    gates = xp + h @ w_hh.T
                    i, f, g, o = jnp.split(gates, 4, axis=-1)
                    i, f, o = (jax.nn.sigmoid(i), jax.nn.sigmoid(f),
                               jax.nn.sigmoid(o))
                    g = jnp.tanh(g)
                    c = f * c + i * g
                    h = o * jnp.tanh(c)
                    return (h, c), h

                init = (jnp.zeros((B, h_dim), jnp.float32),
                        jnp.zeros((B, h_dim), jnp.float32))
                # unroll amortizes the while-loop fixed cost per step (the
                # recurrence is latency-bound: tiny [B,4H] matmuls)
                _, hs = jax.lax.scan(step, init, x_proj_t, unroll=8)
            x = hs.transpose(1, 0, 2)
        return x + residual


class CodecResnetBlock(nn.Module):
    """SEANet residual unit: ELU-conv(k,dil)-ELU-conv(1) + 1x1 shortcut."""

    dim: int
    dilation: int = 1
    kernel_size: int = 3
    compress: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = self.dim // self.compress
        h = nn.elu(x)
        h = CodecConv1d(hidden, self.kernel_size, dilation=self.dilation,
                        dtype=self.dtype, name="block_1")(h)
        h = nn.elu(h)
        h = CodecConv1d(self.dim, 1, dtype=self.dtype, name="block_3")(h)
        s = CodecConv1d(self.dim, 1, dtype=self.dtype, name="shortcut")(x)
        return s + h
