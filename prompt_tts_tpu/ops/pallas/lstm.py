"""Fused LSTM recurrence kernel for TPU (Pallas).

The codec's LSTMs (EnCodec encoder/decoder, 900 sequential steps at dim
512) are latency-bound under ``lax.scan``: each step is a tiny [B,512] x
[512,2048] matmul plus elementwise gates, and the while-loop overhead
dominates.  This kernel runs the WHOLE recurrence in one ``pallas_call``:

* the recurrent weights ``w_hh`` (512x2048 f32 = 4 MB) stay resident in
  VMEM for the entire sequence;
* the precomputed input projections ``x_proj`` ([T, B, 4H], the big MXU
  matmul done outside) are streamed in T-blocks by the Pallas pipeline;
* hidden/cell state lives in VMEM scratch, carried across sequential grid
  steps (TPU grid iterations execute in order on a core).

Gate order and activations match torch ``nn.LSTM`` (i, f, g, o — sigmoid /
sigmoid / tanh / sigmoid), which is what the weight converter loads.

Forward-only: the codec runs inference on this path; training fallbacks
use the scan implementation.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(x_ref, w_ref, o_ref, h_scr, c_scr, *, block_t: int):
    """One grid step: consume a [block_t, B, 4H] slab of x_proj."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    w = w_ref[:]  # [H, 4H], VMEM-resident across all grid steps
    H = w.shape[0]

    def body(t, _):
        h = h_scr[:]
        gates = x_ref[t] + jnp.dot(h, w, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c = f * c_scr[:] + i * g
        h_new = o * jnp.tanh(c)
        c_scr[:] = c
        h_scr[:] = h_new
        o_ref[t] = h_new
        return 0

    jax.lax.fori_loop(0, block_t, body, 0)


@functools.partial(jax.jit, static_argnames=("block_t",))
def lstm_recurrence(x_proj: jnp.ndarray, w_hh: jnp.ndarray,
                    block_t: int = 64) -> jnp.ndarray:
    """Run the LSTM recurrence over precomputed input projections.

    Args:
      x_proj: ``[T, B, 4H]`` f32 — ``x @ w_ih.T + b`` for all timesteps.
      w_hh: ``[H, 4H]`` f32 — recurrent weights (already transposed).
      block_t: timesteps per grid step (VMEM budget knob).
    Returns:
      hidden states ``[T, B, H]`` f32.
    """
    T, B, G = x_proj.shape
    H = w_hh.shape[0]
    if G != 4 * H:
        raise ValueError(f"x_proj last dim {G} != 4*H ({4 * H})")

    pad_t = (-T) % block_t
    if pad_t:
        x_proj = jnp.pad(x_proj, ((0, pad_t), (0, 0), (0, 0)))
    T_p = T + pad_t

    out = pl.pallas_call(
        functools.partial(_lstm_kernel, block_t=block_t),
        grid=(T_p // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, B, G), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, B, H), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_p, B, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T_p * B * H * 4 * H,
            bytes_accessed=(x_proj.size + w_hh.size + T_p * B * H) * 4,
            transcendentals=4 * T_p * B * H,
        ),
    )(x_proj.astype(jnp.float32), w_hh.astype(jnp.float32))
    return out[:T]


def _lstm_kernel_t(x_ref, w_ref, o_ref, ht_scr, c_scr, *, block_t: int):
    """Transposed-matmul grid step: stream W through the MXU, keep h^T
    stationary.

    Hypothesis tested and REJECTED on v5e (honest chained timing, round
    2): the idea was that ``dot(h [B,H], w [H,4H])`` is weight-
    stationary-bound (tile reloads every step), so computing ``gates^T =
    dot(w [4H,H], h^T [H,B])`` with the tiny state stationary should
    win.  Measured: this variant runs ~2 us/step vs ~0.8-1.3 for the v1
    kernel and ~1.0-1.2 for the XLA scan — MXU tile loads pipeline with
    compute just fine, and the two per-step VMEM transposes this schedule
    adds (gates^T -> gates, h -> h^T) cost more than they save.  Kept as
    a documented negative result with its bit-exactness test.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        ht_scr[:] = jnp.zeros_like(ht_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    w = w_ref[:]  # [4H, H], VMEM-resident, streamed through the MXU
    H = w.shape[1]

    def body(t, _):
        g_t = jnp.dot(w, ht_scr[:], preferred_element_type=jnp.float32)
        gates = g_t.T + x_ref[t]          # [B, 4H]
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c = f * c_scr[:] + i * g
        h = o * jnp.tanh(c)
        c_scr[:] = c
        ht_scr[:] = h.T
        o_ref[t] = h
        return 0

    jax.lax.fori_loop(0, block_t, body, 0)


@functools.partial(jax.jit, static_argnames=("block_t",))
def lstm_recurrence_t(x_proj: jnp.ndarray, w_hh_t: jnp.ndarray,
                      block_t: int = 64) -> jnp.ndarray:
    """LSTM recurrence with the stationary-state MXU schedule.

    Args:
      x_proj: ``[T, B, 4H]`` f32 — ``x @ w_ih.T + b`` for all timesteps.
      w_hh_t: ``[4H, H]`` f32 — recurrent weights in torch layout
        (``nn.LSTM.weight_hh``, NOT transposed).
      block_t: timesteps per grid step (VMEM budget knob).
    Returns:
      hidden states ``[T, B, H]`` f32, bit-identical to the scan path.
    """
    T, B, G = x_proj.shape
    H = w_hh_t.shape[1]
    if G != 4 * H:
        raise ValueError(f"x_proj last dim {G} != 4*H ({4 * H})")

    pad_t = (-T) % block_t
    if pad_t:
        x_proj = jnp.pad(x_proj, ((0, pad_t), (0, 0), (0, 0)))
    T_p = T + pad_t

    out = pl.pallas_call(
        functools.partial(_lstm_kernel_t, block_t=block_t),
        grid=(T_p // block_t,),
        in_specs=[
            pl.BlockSpec((block_t, B, G), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, B, H), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_p, B, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H, B), jnp.float32),   # h^T (stationary operand)
            pltpu.VMEM((B, H), jnp.float32),   # c (elementwise layout)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T_p * B * H * 4 * H,
            bytes_accessed=(x_proj.size + w_hh_t.size + T_p * B * H) * 4,
            transcendentals=4 * T_p * B * H,
        ),
    )(x_proj.astype(jnp.float32), w_hh_t.astype(jnp.float32))
    return out[:T]
