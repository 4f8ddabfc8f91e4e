"""The EnCodec 24 kHz model: SEANet encoder/decoder + RVQ, in Flax.

Architecture constants mirror facebook's encodec_model_24khz (the black box
the reference drives at generate_code.py:13-14 and decode_codec.py:8-9):
n_filters 32, ratios (8,5,4,2) => hop 320 @ 24 kHz => 75 Hz frames, latent
dim 128, 2-layer LSTM, causal reflect-padded convs with folded weight norm,
32 codebooks of 1024 x 128 (8 used at 6 kbps).

Module names encode the torch layer indices (layer_0, layer_1, ...) so the
weight converter in convert.py is a mechanical key rewrite.
"""

import math
from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from prompt_tts_tpu.codec.layers import (
    CodecConv1d,
    CodecConvTranspose1d,
    CodecLSTM,
    CodecResnetBlock,
)
from prompt_tts_tpu.codec.rvq import rvq_decode, rvq_encode


@dataclass(frozen=True)
class EncodecConfig24k:
    sampling_rate: int = 24000
    audio_channels: int = 1
    num_filters: int = 32
    hidden_size: int = 128           # latent dim
    upsampling_ratios: Tuple[int, ...] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    compress: int = 2
    num_lstm_layers: int = 2
    codebook_size: int = 1024
    codebook_dim: int = 128
    num_quantizers: int = 32         # available; bandwidth selects a prefix

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.upsampling_ratios:
            out *= r
        return out  # 320

    @property
    def frame_rate(self) -> int:
        return math.ceil(self.sampling_rate / self.hop_length)  # 75

    def num_quantizers_for_bandwidth(self, bandwidth_kbps: float) -> int:
        bw_per_q = math.log2(self.codebook_size) * self.frame_rate  # 750
        return max(1, int(math.floor(bandwidth_kbps * 1000 / bw_per_q)))


class EncodecEncoder(nn.Module):
    """SEANet encoder: wav ``[B, T, 1]`` -> latents ``[B, T/320, 128]``."""

    config: EncodecConfig24k = field(default_factory=EncodecConfig24k)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        i = 0
        x = CodecConv1d(cfg.num_filters, cfg.kernel_size, dtype=self.dtype,
                        name=f"layer_{i}")(x)
        i += 1
        scaling = 1
        for ratio in reversed(cfg.upsampling_ratios):
            current = scaling * cfg.num_filters
            for j in range(cfg.num_residual_layers):
                x = CodecResnetBlock(
                    current, dilation=cfg.dilation_growth_rate ** j,
                    kernel_size=cfg.residual_kernel_size,
                    compress=cfg.compress, dtype=self.dtype,
                    name=f"layer_{i}")(x)
                i += 1
            i += 1  # ELU (paramless; keep index parity with torch)
            x = nn.elu(x)
            x = CodecConv1d(current * 2, ratio * 2, stride=ratio,
                            dtype=self.dtype, name=f"layer_{i}")(x)
            i += 1
            scaling *= 2
        x = CodecLSTM(scaling * cfg.num_filters, cfg.num_lstm_layers,
                      dtype=self.dtype, name=f"layer_{i}")(x)
        i += 2  # LSTM, then ELU
        x = nn.elu(x)
        x = CodecConv1d(cfg.hidden_size, cfg.last_kernel_size,
                        dtype=self.dtype, name=f"layer_{i}")(x)
        return x


class EncodecDecoder(nn.Module):
    """SEANet decoder: latents ``[B, F, 128]`` -> wav ``[B, F*320, 1]``.

    ``head_only=True`` stops after the THIRD-from-last upsample stage's
    resnets (C = 4*num_filters) — the hand-off point of the folded-tail
    execution (codec/folded.py), which runs the remaining lane-starved
    stages in a space-to-depth layout.
    """

    config: EncodecConfig24k = field(default_factory=EncodecConfig24k)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 head_only: bool = False) -> jnp.ndarray:
        cfg = self.config
        scaling = int(2 ** len(cfg.upsampling_ratios))
        i = 0
        x = CodecConv1d(scaling * cfg.num_filters, cfg.kernel_size,
                        dtype=self.dtype, name=f"layer_{i}")(x)
        i += 1
        x = CodecLSTM(scaling * cfg.num_filters, cfg.num_lstm_layers,
                      dtype=self.dtype, name=f"layer_{i}")(x)
        i += 1
        head_stages = len(cfg.upsampling_ratios) - 2
        for stage, ratio in enumerate(cfg.upsampling_ratios):
            current = scaling * cfg.num_filters
            i += 1  # ELU
            x = nn.elu(x)
            x = CodecConvTranspose1d(current // 2, ratio * 2, stride=ratio,
                                     dtype=self.dtype, name=f"layer_{i}")(x)
            i += 1
            for j in range(cfg.num_residual_layers):
                x = CodecResnetBlock(
                    current // 2, dilation=cfg.dilation_growth_rate ** j,
                    kernel_size=cfg.residual_kernel_size,
                    compress=cfg.compress, dtype=self.dtype,
                    name=f"layer_{i}")(x)
                i += 1
            scaling //= 2
            if head_only and stage == head_stages - 1:
                return x
        i += 1  # ELU
        x = nn.elu(x)
        x = CodecConv1d(cfg.audio_channels, cfg.last_kernel_size,
                        dtype=self.dtype, name=f"layer_{i}")(x)
        return x


class EncodecCodec(nn.Module):
    """Full codec: encode(wav)->codes, decode(codes)->wav.

    Codebooks live as a single stacked param ``[num_quantizers, K, D]``.
    ``method``-style usage:
      codes = codec.apply(params, wav, bandwidth, method=EncodecCodec.encode)
      wav   = codec.apply(params, codes, method=EncodecCodec.decode)
    """

    config: EncodecConfig24k = field(default_factory=EncodecConfig24k)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = EncodecEncoder(cfg, dtype=self.dtype)
        self.decoder = EncodecDecoder(cfg, dtype=self.dtype)
        self.codebooks = self.param(
            "codebooks", nn.initializers.normal(1.0),
            (cfg.num_quantizers, cfg.codebook_size, cfg.codebook_dim),
            jnp.float32)

    def encode(self, wav: jnp.ndarray,
               bandwidth_kbps: float = 6.0) -> jnp.ndarray:
        """wav ``[B, T]`` or ``[B, T, 1]`` -> codes ``[B, n_q, ceil(T/320)]``."""
        if wav.ndim == 2:
            wav = wav[..., None]
        emb = self.encoder(wav)
        n_q = self.config.num_quantizers_for_bandwidth(bandwidth_kbps)
        return rvq_encode(emb, self.codebooks[:n_q])

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes ``[B, n_q, F]`` -> wav ``[B, F*320]``."""
        n_q = codes.shape[1]
        emb = rvq_decode(codes, self.codebooks[:n_q])
        wav = self.decoder(emb)
        return wav[..., 0]

    def decode_head(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes -> decoder activation at the folded-tail hand-off point
        (``[B, T0, 4*num_filters]``; see codec/folded.py)."""
        n_q = codes.shape[1]
        emb = rvq_decode(codes, self.codebooks[:n_q])
        return self.decoder(emb, head_only=True)

    def __call__(self, wav: jnp.ndarray,
                 bandwidth_kbps: float = 6.0) -> jnp.ndarray:
        """Round trip (used for init)."""
        codes = self.encode(wav, bandwidth_kbps)
        return self.decode(codes)
