"""ARCHIVED EXPERIMENT — fused residual-VQ encode kernel (Pallas).

NOT a production capability: nothing in the package dispatches this
kernel (RVQ parity requires bit-exact indices and this kernel is not
bit-exact — see STATUS below).  It is kept, with its tests, as the
documented evidence behind ARCHITECTURE.md's kernel scoreboard entry;
treat it as a measurement artifact, not framework surface.

One kernel instance quantizes a block of vectors through ALL RVQ layers:
the full codebook stack (n_q x 1024 x 128 f32 = 4 MB at 6 kbps) stays
resident in VMEM while the residual is peeled layer by layer — the
[N, 1024] score matrix never touches HBM, and the dequantize-gather is a
one-hot MXU matmul (exact, since exactly one 1.0 per row).

STATUS (measured on v5e, [8,900,128] x [8,1024,128]): ~10% faster than the
XLA path (1.09 vs 1.20 ms) but NOT bit-exact — the Mosaic f32 matmul
accumulates in a different order than XLA's, flipping near-tie argmaxes
(~1.5% of indices, compounding through the residual cascade).  The XLA
path in prompt_tts_tpu.codec.rvq is the one validated bit-exact against
torch (BASELINE.md requirement) and remains the default everywhere;
this kernel is for non-parity-critical bulk encoding only.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BN = 256  # vectors per block


def _rvq_kernel(x_ref, cb_ref, idx_ref, *, n_q: int):
    # x: [BN, D]; cb: [n_q, K, D]; idx out: [n_q, BN]
    residual = x_ref[:].astype(jnp.float32)
    K = cb_ref.shape[1]
    for q in range(n_q):
        embed = cb_ref[q].astype(jnp.float32)           # [K, D]
        x_sq = jnp.sum(residual * residual, axis=1, keepdims=True)
        e_sq = jnp.sum(embed * embed, axis=1)[None, :]
        xe = jax.lax.dot_general(
            residual, embed, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BN, K]
        scores = -(x_sq - 2.0 * xe + e_sq)
        idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        one_hot = (jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
                   == idx[:, None]).astype(jnp.float32)
        quantized = jnp.dot(one_hot, embed,
                            preferred_element_type=jnp.float32)
        residual = residual - quantized
        idx_ref[q] = idx


def rvq_encode_fused(embeddings: jnp.ndarray,
                     codebooks: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused RVQ encode: ``[B, T, D]`` x ``[n_q, K, D]`` -> ``[B, n_q, T]``.

    WARNING: on TPU this is ~10% faster than prompt_tts_tpu.codec.rvq but
    NOT bit-exact with it (Mosaic f32 matmul accumulation order flips
    near-tie argmaxes; see the module docstring).  Do not use on the
    parity-critical encoding path. ``interpret=True`` runs the kernel in
    the Pallas interpreter (CPU-testable).
    """
    B, T, D = embeddings.shape
    n_q, K, _ = codebooks.shape
    N = B * T
    flat = embeddings.reshape(N, D).astype(jnp.float32)
    pad = (-N) % _BN
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    N_p = N + pad

    idx = pl.pallas_call(
        functools.partial(_rvq_kernel, n_q=n_q),
        grid=(N_p // _BN,),
        in_specs=[
            pl.BlockSpec((_BN, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, K, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_q, _BN), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_q, N_p), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_q * N_p * K * D,
            bytes_accessed=(flat.size + codebooks.size + n_q * N_p) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(flat, codebooks.astype(jnp.float32))

    idx = idx[:, :N].reshape(n_q, B, T)
    return idx.transpose(1, 0, 2)
