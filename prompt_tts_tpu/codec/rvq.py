"""Residual vector quantizer: nearest-codebook search + dequantization.

Semantics match the EnCodec euclidean codebook exactly (see transformers
EncodecEuclideanCodebook.quantize): score = -(|x|^2 - 2 x.E^T + |E|^2),
argmax over 1024 entries (first index wins ties — jnp.argmax and torch
``max().indices`` agree), residual peeled per layer.

The distance computation is dominated by the [N, D] @ [D, K] matmul, which
XLA maps straight onto the MXU; |x|^2 is constant over codebook entries and
does not affect the argmax, but is KEPT in the score to match torch's
accumulation exactly (bit-exact index parity is a BASELINE.md requirement).
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def codebook_quantize(x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """Nearest codebook indices.

    Args:
      x: ``[..., D]`` vectors.
      embed: ``[K, D]`` codebook.
    Returns:
      ``[...]`` int32 indices.
    """
    flat = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    e = embed.astype(jnp.float32)
    # -(|x|^2 - 2 x E^T + |e|^2): identical formula/order to torch
    x_sq = jnp.sum(flat * flat, axis=1, keepdims=True)
    e_sq = jnp.sum(e * e, axis=1)[None, :]
    scores = -(x_sq - 2.0 * flat @ e.T + e_sq)
    idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    return idx.reshape(x.shape[:-1])


def codebook_decode(indices: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """Indices ``[...]`` -> vectors ``[..., D]`` (embedding gather)."""
    return embed[indices]


def rvq_encode(embeddings: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """Residual VQ encode.

    Args:
      embeddings: ``[B, T, D]`` encoder output.
      codebooks: ``[n_q, K, D]`` stacked codebooks (first n_q layers).
    Returns:
      ``[B, n_q, T]`` int32 code indices.
    """
    n_q = codebooks.shape[0]

    def body(residual, embed):
        idx = codebook_quantize(residual, embed)
        quantized = codebook_decode(idx, embed)
        return residual - quantized, idx

    _, indices = jax.lax.scan(body, embeddings.astype(jnp.float32),
                              codebooks)
    # indices: [n_q, B, T] -> [B, n_q, T]
    return indices.transpose(1, 0, 2)


def rvq_decode(codes: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """Codes ``[B, n_q, T]`` -> summed quantized vectors ``[B, T, D]``."""
    n_q = codes.shape[1]

    def body(acc, inputs):
        idx, embed = inputs
        return acc + codebook_decode(idx, embed), None

    B, _, T = codes.shape
    D = codebooks.shape[-1]
    init = jnp.zeros((B, T, D), jnp.float32)
    acc, _ = jax.lax.scan(body, init,
                          (codes.transpose(1, 0, 2), codebooks[:n_q]))
    return acc
