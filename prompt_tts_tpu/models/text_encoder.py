"""Text encoder: embedding + transposed positional table + self-attn stack.

Behavioral twin of the reference ``TextEncoder`` (reference
tts/models.py:73-120): word embedding, the quirky transposed sinusoidal
positional encoding (kept for parity, see
:func:`prompt_tts_tpu.models.embeddings.transposed_positional_encoding`),
then ``text_encoder_layers`` self-attention-only transformer blocks with the
0/1 mask converted to an additive -1e4 bias.
"""

import flax.linen as nn
import jax.numpy as jnp

from prompt_tts_tpu.models.embeddings import transposed_positional_encoding
from prompt_tts_tpu.models.layers import TransformerBlock, mask_to_bias


class TextEncoder(nn.Module):
    vocab_len: int
    seq_len: int
    dim: int
    attention_head_dim: int
    dropout: float = 0.0
    num_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,       # [B, S] int
        attention_mask: jnp.ndarray,  # [B, S] 0/1
        deterministic: bool = True,
    ) -> jnp.ndarray:                 # [B, S, dim]
        if self.dim % self.attention_head_dim != 0:
            raise ValueError("dim must be a multiple of attention_head_dim")
        num_heads = self.dim // self.attention_head_dim

        bias = mask_to_bias(attention_mask)

        x = nn.Embed(self.vocab_len, self.dim, dtype=self.dtype,
                     name="word_embedding")(input_ids)
        pos = transposed_positional_encoding(self.seq_len, self.dim)
        x = x + jnp.asarray(pos, dtype=x.dtype)[None, : x.shape[1], :]

        for i in range(self.num_layers):
            x = TransformerBlock(
                dim=self.dim,
                num_heads=num_heads,
                head_dim=self.attention_head_dim,
                dropout=self.dropout,
                cross_attention_dim=None,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, self_attn_bias=bias, deterministic=deterministic)
        return x
