"""TTSPromptSpeaker: prompt-conditioned (multi-speaker) TTS model.

Extends the single-speaker composite with a reference-audio prompt encoder
(BASELINE config #5 — a capability the reference repo only stubs via its
unused class-embed plumbing).  The prompt tokens are concatenated to the
text context for cross-attention; the global speaker embedding is added to
the UNet time embedding.
"""

import flax.linen as nn
import jax.numpy as jnp

from prompt_tts_tpu.config import ModelConfig
from prompt_tts_tpu.models.prompt_encoder import PromptEncoder
from prompt_tts_tpu.models.text_encoder import TextEncoder
from prompt_tts_tpu.models.unet1d import UNet1DCondition


class TTSPromptSpeaker(nn.Module):
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
        self.prompt_encoder = PromptEncoder(
            dim=cfg.cross_attention_dim,
            speaker_emb_dim=cfg.block_out_channels[0] * 4,
            num_layers=cfg.prompt_encoder_layers,
            num_tokens=cfg.prompt_tokens,
            dropout=cfg.dropout,
            dtype=self.dtype,
        )
        self.unet = UNet1DCondition(cfg, dtype=self.dtype)

    def encode_conditioning(
        self,
        text_seq_ids: jnp.ndarray,     # [B, S]
        attention_mask: jnp.ndarray,   # [B, S]
        prompt_latents: jnp.ndarray,   # [B, Tp, n_q] in [-1, 1]
        deterministic: bool = True,
    ):
        """-> (context [B, S+K, cross_dim], speaker_emb [B, 4*chans0])."""
        text_ctx = self.text_encoder(text_seq_ids, attention_mask,
                                     deterministic=deterministic)
        tokens, speaker = self.prompt_encoder(prompt_latents,
                                              deterministic=deterministic)
        context = jnp.concatenate([text_ctx, tokens.astype(text_ctx.dtype)],
                                  axis=1)
        return context, speaker

    def denoise(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: jnp.ndarray,
        speaker_emb: jnp.ndarray,
        deterministic: bool = True,
        cross_kv=None,                # unet1d.cross_attention_kv() output
    ) -> jnp.ndarray:
        return self.unet(sample, timesteps, context, class_emb=speaker_emb,
                         deterministic=deterministic, cross_kv=cross_kv)

    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        text_seq_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        prompt_latents: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        context, speaker = self.encode_conditioning(
            text_seq_ids, attention_mask, prompt_latents,
            deterministic=deterministic)
        return self.denoise(sample, timesteps, context, speaker,
                            deterministic=deterministic)
