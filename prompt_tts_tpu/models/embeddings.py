"""Embedding primitives: sinusoidal timestep features and positional tables.

Pure functions + one tiny Flax MLP.  Semantics match the diffusers
``Timesteps``/``TimestepEmbedding`` modules the reference builds its time
conditioning from (reference tts/ldm/unet_1d_condition.py:206-222), and the
reference's quirky *transposed* sinusoidal positional encoding
(reference tts/models.py:11-70 — frequencies run over the SEQUENCE axis and
positions over the EMBEDDING axis; kept for parity, computed as a static
table instead of a shape-keyed runtime cache).
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal features of integer timesteps, diffusers-compatible.

    Args:
      timesteps: ``[B]`` int or float.
    Returns:
      ``[B, dim]`` float32.
    """
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Linear -> SiLU -> Linear projection of sinusoidal features.

    Matches diffusers ``TimestepEmbedding`` (used at reference
    unet_1d_condition.py:217-222): in_dim = block_out_channels[0],
    out_dim = 4 * block_out_channels[0].
    """

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class GaussianFourierProjection(nn.Module):
    """Random-Fourier timestep features — the reference UNet's optional
    ``time_embedding_type="fourier"`` path (reference
    unet_1d_condition.py:198-213, which builds diffusers-0.15
    ``GaussianFourierProjection(embedding_size=block_out_channels[0],
    set_W_to_weight=False, log=False, flip_sin_to_cos=...)``).

    ``weight ~ N(0, scale^2)`` is drawn once and FROZEN (torch registers
    it with ``requires_grad=False``); output is ``[cos|sin]`` (or
    ``[sin|cos]``) of ``2*pi*t*w`` -> ``[B, 2*embedding_size]``.
    """

    embedding_size: int
    scale: float = 1.0
    flip_sin_to_cos: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B] -> [B, 2E]
        w = self.param(
            "weight",
            lambda rng: jax.random.normal(rng, (self.embedding_size,))
            * self.scale)
        w = jax.lax.stop_gradient(w)  # non-trainable, torch parity
        x_proj = x.astype(jnp.float32)[:, None] * w[None, :] * (2 * math.pi)
        if self.flip_sin_to_cos:
            return jnp.concatenate([jnp.cos(x_proj), jnp.sin(x_proj)], -1)
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], -1)


def transposed_positional_encoding(seq_len: int, dim: int) -> np.ndarray:
    """The reference TextEncoder's positional table, shape ``[seq_len, dim]``.

    Reference ``PositionalEncodingPermute1D(seq_len)`` applied to a
    ``[B, seq, dim]`` embedding permutes to ``[B, dim, seq]`` and runs a
    standard 1-D sin/cos encoding with ``positions = dim axis`` and
    ``channels = seq axis`` (reference tts/models.py:40-70).  The result,
    permuted back, is the constant table computed here:

      table[s, d] = sin(d * inv_freq[s//2])  if s even
                    cos(d * inv_freq[s//2])  if s odd
      inv_freq[k] = 1 / 10000^(2k / ceil2(seq_len))

    This is deliberately transposed relative to a conventional positional
    encoding; kept for behavioral parity.
    """
    channels = int(np.ceil(seq_len / 2) * 2)  # reference models.py:26
    inv_freq = 1.0 / (
        10000.0 ** (np.arange(0, channels, 2, dtype=np.float32) / channels)
    )
    pos = np.arange(dim, dtype=np.float32)               # positions over D
    sin_inp = np.einsum("i,j->ij", pos, inv_freq)        # [dim, channels/2]
    # interleave sin/cos along the channel axis -> [dim, channels]
    emb = np.stack([np.sin(sin_inp), np.cos(sin_inp)], axis=-1)
    emb = emb.reshape(dim, channels)
    # clip channels back to seq_len and transpose to [seq, dim]
    return np.ascontiguousarray(emb[:, :seq_len].T)
