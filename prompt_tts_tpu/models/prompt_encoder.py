"""Reference-audio prompt encoder for multi-speaker synthesis.

New capability (BASELINE config #5): the reference is single-speaker; its
only hook for speaker conditioning is the unused ``class_embed_type``
plumbing (reference unet_1d_condition.py:229-256).  This encoder turns a
reference-audio clip — as normalized EnCodec code latents ``[B, Tp, 8]``,
the same representation the denoiser works in — into

* ``prompt_tokens`` ``[B, K, cross_dim]``: K learned-query pooled tokens
  concatenated to the text context for cross-attention (fine-grained
  style/voice information), and
* ``speaker_emb`` ``[B, 4*chans[0]]``: a global embedding added to the
  UNet time embedding (the class-embed hook).

Architecture: strided conv stem (75 Hz -> ~19 Hz) -> self-attention blocks
-> learned-query cross-attention pooling (Perceiver-style, so the output
token count is static regardless of prompt length).
"""

import flax.linen as nn
import jax.numpy as jnp

from prompt_tts_tpu.models.layers import Attention, Conv1d, TransformerBlock


class PromptEncoder(nn.Module):
    dim: int                    # == cross_attention_dim
    speaker_emb_dim: int        # == 4 * block_out_channels[0]
    num_layers: int = 2
    num_tokens: int = 32
    num_heads: int = 8
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        prompt_latents: jnp.ndarray,  # [B, Tp, n_q] in [-1, 1]
        deterministic: bool = True,
    ):
        B = prompt_latents.shape[0]

        # conv stem: 2x stride-2 convs, 75 Hz -> ~19 Hz, up to model width
        h = Conv1d(self.dim // 2, 3, stride=2, dtype=self.dtype,
                   name="stem1")(prompt_latents.astype(self.dtype))
        h = nn.silu(h)
        h = Conv1d(self.dim, 3, stride=2, dtype=self.dtype, name="stem2")(h)
        h = nn.silu(h)

        head_dim = self.dim // self.num_heads
        for i in range(self.num_layers):
            h = TransformerBlock(
                dim=self.dim, num_heads=self.num_heads, head_dim=head_dim,
                dropout=self.dropout, dtype=self.dtype, name=f"block_{i}",
            )(h, deterministic=deterministic)

        # Perceiver-style pooling: learned queries attend over the prompt
        queries = self.param(
            "queries", nn.initializers.normal(0.02),
            (self.num_tokens, self.dim), jnp.float32)
        q = jnp.broadcast_to(queries[None], (B,) + queries.shape)
        tokens = Attention(
            num_heads=self.num_heads, head_dim=head_dim, out_dim=self.dim,
            dtype=self.dtype, name="pool",
        )(q.astype(self.dtype), context=h, deterministic=deterministic)
        tokens = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name="token_norm")(tokens)

        # global speaker embedding: mean-pooled tokens -> MLP
        g = tokens.mean(axis=1)
        g = nn.Dense(self.speaker_emb_dim, dtype=self.dtype,
                     name="spk_proj1")(g)
        g = nn.silu(g)
        g = nn.Dense(self.speaker_emb_dim, dtype=self.dtype,
                     name="spk_proj2")(g)
        return tokens, g
