"""Core compute layers: conv/norm wrappers, attention, transformer block.

Everything is channels-last ``[B, T, C]`` — the TPU-native layout (lanes on
C) — whereas the reference is torch channels-first ``[B, C, T]``.  Numeric
semantics are kept identical to the diffusers-0.15 modules the reference
composes (BasicTransformerBlock: attention scale 1/sqrt(head_dim), additive
float mask, GEGLU feed-forward with exact-erf GELU, LayerNorm eps 1e-5).

Attention dispatches to the fused Pallas kernel on TPU when shapes allow
(see prompt_tts_tpu.ops), falling back to a plain XLA einsum elsewhere.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from prompt_tts_tpu.ops import scaled_dot_product_attention


class Conv1d(nn.Module):
    """1-D convolution on ``[B, T, C]`` with torch-style explicit padding."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None  # None -> (kernel_size - 1) // 2
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.padding
        if pad is None:
            pad = (self.kernel_size - 1) // 2
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(pad, pad)],
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class GroupNorm(nn.Module):
    """GroupNorm over the channel axis of ``[B, T, C]`` (torch semantics)."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon,
            dtype=self.dtype, name="norm",
        )(x)


class Attention(nn.Module):
    """Multi-head attention with optional cross-context and additive bias.

    Matches diffusers ``CrossAttention`` numerics (reference dependency used
    at tts/ldm/transformer_1d.py:163-181): q/k/v projections without bias,
    output projection with bias, scores scaled by ``head_dim**-0.5``, bias
    added to the scores pre-softmax.
    """

    num_heads: int
    head_dim: int
    out_dim: Optional[int] = None     # defaults to num_heads * head_dim
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                       # [B, Tq, C]
        context: Optional[jnp.ndarray] = None,  # [B, Tk, Cc] or None (self)
        bias: Optional[jnp.ndarray] = None,   # additive, broadcast [B,1,1,Tk]
        deterministic: bool = True,
        kv_cache: Optional[tuple] = None,     # ([B,Tk,H,D], [B,Tk,H,D])
    ) -> jnp.ndarray:
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        dense = lambda feats, name, bias_: nn.DenseGeneral(
            feats, use_bias=bias_, dtype=self.dtype, name=name)
        q = dense(inner, "to_q", False)(x)
        B, Tq, _ = q.shape
        q = q.reshape(B, Tq, self.num_heads, self.head_dim)

        if kv_cache is not None:
            # k/v precomputed from a loop-invariant context (sampler hoist:
            # the DDIM scan reuses the same text context for every step, so
            # the to_k/to_v projections run once per utterance, not per
            # step).  Shapes are already [B, Tk, H, D] in model dtype.
            k, v = kv_cache
        else:
            k = dense(inner, "to_k", False)(ctx)
            v = dense(inner, "to_v", False)(ctx)
            Tk = k.shape[1]
            k = k.reshape(B, Tk, self.num_heads, self.head_dim)
            v = v.reshape(B, Tk, self.num_heads, self.head_dim)

        out = scaled_dot_product_attention(q, k, v, bias=bias)
        out = out.reshape(B, Tq, inner)

        out_dim = self.out_dim if self.out_dim is not None else inner
        out = nn.DenseGeneral(out_dim, use_bias=True, dtype=self.dtype,
                              name="to_out")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward: ``Dense(8C) -> x * gelu(gate) -> Dense(C)``.

    diffusers ``FeedForward(activation_fn="geglu")`` semantics: the first
    half of the projection is the value, the second half the gate, GELU is
    exact erf (torch default).
    """

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        value, gate = jnp.split(h, 2, axis=-1)
        h = value * nn.gelu(gate, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.dim, dtype=self.dtype, name="out")(h)
        return h


class TransformerBlock(nn.Module):
    """Pre-norm transformer block == diffusers ``BasicTransformerBlock``.

    LayerNorm -> self-attn (+additive bias) -> residual;
    [when ``cross_attention_dim`` set] LayerNorm -> cross-attn -> residual;
    LayerNorm -> GEGLU FF -> residual.

    Parity notes: the reference UNet never passes a mask into its
    transformer stacks, so cross-attention runs UNMASKED over padded text
    (reference unet_blocks.py:393-398, unet_1d_condition.py:721); the text
    encoder passes an additive self-attn bias (reference tts/models.py:107-118).
    """

    dim: int
    num_heads: int
    head_dim: int
    dropout: float = 0.0
    cross_attention_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                         # [B, T, C]
        context: Optional[jnp.ndarray] = None,  # [B, S, Cc]
        self_attn_bias: Optional[jnp.ndarray] = None,
        cross_attn_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        cross_kv: Optional[tuple] = None,       # precomputed attn2 (k, v)
    ) -> jnp.ndarray:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        attn = lambda name: Attention(
            num_heads=self.num_heads, head_dim=self.head_dim,
            out_dim=self.dim, dropout=self.dropout, dtype=self.dtype,
            name=name,
        )

        h = attn("attn1")(ln("norm1")(x), context=None, bias=self_attn_bias,
                          deterministic=deterministic)
        x = x + h

        if self.cross_attention_dim is not None:
            if context is None and cross_kv is None:
                raise ValueError("cross-attention block requires context")
            h = attn("attn2")(ln("norm2")(x), context=context,
                              bias=cross_attn_bias,
                              deterministic=deterministic,
                              kv_cache=cross_kv)
            x = x + h

        h = GEGLUFeedForward(dim=self.dim, dropout=self.dropout,
                             dtype=self.dtype, name="ff")(
            ln("norm3")(x), deterministic=deterministic)
        return x + h


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """0/1 key mask ``[B, S]`` -> additive bias ``[B, 1, 1, S]``.

    Reference semantics: ``(1 - mask) * -10000.0`` broadcast over heads and
    queries (reference tts/models.py:107-110, unet_1d_condition.py:596-599).
    """
    bias = (1.0 - mask.astype(dtype)) * -10000.0
    return bias[:, None, None, :]
