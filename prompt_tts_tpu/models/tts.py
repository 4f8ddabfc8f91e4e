"""TTSSingleSpeaker: text encoder + conditional UNet denoiser.

Composite matching the reference ``TTSSingleSpeaker``
(reference tts/models.py:123-172): the text encoder output conditions every
cross-attention site of the UNet.  Parity quirk kept: the padded-text mask
gates the text encoder's SELF-attention only — the UNet cross-attention
runs unmasked, exactly as in the reference (unet_blocks.py:393-398).

``encode_text`` / ``denoise`` are exposed separately so samplers can hoist
the (loop-invariant) text encoding out of the denoising scan — the text
encoder runs ONCE per utterance, not once per diffusion step.

Layout note: this model is channels-last — ``sample`` is ``[B, T, C]``.
"""

import flax.linen as nn
import jax.numpy as jnp

from prompt_tts_tpu.config import ModelConfig
from prompt_tts_tpu.models.text_encoder import TextEncoder
from prompt_tts_tpu.models.unet1d import UNet1DCondition


class TTSSingleSpeaker(nn.Module):
    config: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.text_encoder = TextEncoder(
            vocab_len=cfg.cmu_vocab_len,
            seq_len=cfg.cmu_seq_len,
            dim=cfg.cross_attention_dim,
            attention_head_dim=cfg.attention_head_dim,
            dropout=cfg.text_encoder_dropout,
            num_layers=cfg.text_encoder_layers,
            dtype=self.dtype,
        )
        self.unet = UNet1DCondition(cfg, dtype=self.dtype)

    def encode_text(
        self,
        text_seq_ids: jnp.ndarray,    # [B, S] int
        attention_mask: jnp.ndarray,  # [B, S] 0/1
        deterministic: bool = True,
    ) -> jnp.ndarray:                 # [B, S, cross_dim]
        return self.text_encoder(text_seq_ids, attention_mask,
                                 deterministic=deterministic)

    def denoise(
        self,
        sample: jnp.ndarray,          # [B, T, in_channels]
        timesteps: jnp.ndarray,       # [B] int
        context: jnp.ndarray,         # [B, S, cross_dim]
        deterministic: bool = True,
        cross_kv=None,                # unet1d.cross_attention_kv() output
    ) -> jnp.ndarray:
        return self.unet(sample, timesteps, context,
                         deterministic=deterministic, cross_kv=cross_kv)

    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        text_seq_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:                 # [B, T, out_channels] eps prediction
        context = self.encode_text(text_seq_ids, attention_mask,
                                   deterministic=deterministic)
        return self.denoise(sample, timesteps, context,
                            deterministic=deterministic)
