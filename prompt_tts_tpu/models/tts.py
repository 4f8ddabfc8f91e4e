"""TTSSingleSpeaker: text encoder + conditional UNet denoiser.

Composite matching the reference ``TTSSingleSpeaker``
(reference tts/models.py:123-172): the text encoder output conditions every
cross-attention site of the UNet.  Parity quirk kept: the padded-text mask
gates the text encoder's SELF-attention only — the UNet cross-attention
runs unmasked, exactly as in the reference (unet_blocks.py:393-398).

Layout note: this model is channels-last — ``sample`` is ``[B, T, C]``.
The data layer produces that layout natively; transpose reference-style
``[B, C, T]`` arrays once at the boundary if needed.
"""

import flax.linen as nn
import jax.numpy as jnp

from prompt_tts_tpu.config import ModelConfig
from prompt_tts_tpu.models.text_encoder import TextEncoder
from prompt_tts_tpu.models.unet1d import UNet1DCondition


class TTSSingleSpeaker(nn.Module):
    config: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,          # [B, T, in_channels] noisy codes
        timesteps: jnp.ndarray,       # [B] int
        text_seq_ids: jnp.ndarray,    # [B, S] int
        attention_mask: jnp.ndarray,  # [B, S] 0/1
        deterministic: bool = True,
    ) -> jnp.ndarray:                 # [B, T, out_channels] eps prediction
        cfg = self.config
        context = TextEncoder(
            vocab_len=cfg.cmu_vocab_len,
            seq_len=cfg.cmu_seq_len,
            dim=cfg.cross_attention_dim,
            attention_head_dim=cfg.attention_head_dim,
            dropout=cfg.text_encoder_dropout,
            num_layers=cfg.text_encoder_layers,
            dtype=self.dtype,
            name="text_encoder",
        )(text_seq_ids, attention_mask, deterministic=deterministic)

        return UNet1DCondition(cfg, dtype=self.dtype, name="unet")(
            sample, timesteps, context, deterministic=deterministic
        )
