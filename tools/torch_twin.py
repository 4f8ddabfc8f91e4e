"""Torch twin of the reference TTSSingleSpeaker (test/AB fixture).

Reimplements, with diffusers-0.15-era module NAMES (attn1.to_q,
ff.net.0.proj, resnets.N, attentions.N, ...) and reference-documented
forward semantics (SURVEY.md §2a, PARITY.md), the model the reference
composes from torch+diffusers (reference tts/models.py:123-172,
tts/ldm/unet_1d_condition.py:38).  Used by:

* tests/test_reference_convert.py — checkpoint-converter golden test;
* tools/loss_parity_ab.py — the loss-curve parity A/B (BASELINE.md
  "training parity" row): trains this twin with the reference recipe
  against the JAX framework from identical weights/noise.

The reference repo ships no checkpoints or config, so this twin models the
torch dependency naming; it is NOT reference code.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn

from prompt_tts_tpu.config import ModelConfig


class RefAttention(nn.Module):
    """diffusers CrossAttention twin (to_q/to_k/to_v/to_out.0 naming)."""

    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx=None, bias=None):
        ctx = x if ctx is None else ctx
        B, T, C = x.shape
        S = ctx.shape[1]
        d = C // self.heads
        q = self.to_q(x).view(B, T, self.heads, d).transpose(1, 2)
        k = self.to_k(ctx).view(B, S, self.heads, d).transpose(1, 2)
        v = self.to_v(ctx).view(B, S, self.heads, d).transpose(1, 2)
        s = q @ k.transpose(-1, -2) * d ** -0.5
        if bias is not None:
            s = s + bias
        out = (s.softmax(-1) @ v).transpose(1, 2).reshape(B, T, C)
        return self.to_out[0](out)


class RefFeedForward(nn.Module):
    """diffusers FeedForward(geglu) twin (ff.net.0.proj / ff.net.2)."""

    def __init__(self, dim):
        super().__init__()
        proj = nn.Module()
        proj.proj = nn.Linear(dim, dim * 8)
        self.net = nn.ModuleList([proj, nn.Identity(), nn.Linear(dim * 4, dim)])

    def forward(self, x):
        h = self.net[0].proj(x)
        value, gate = h.chunk(2, dim=-1)
        return self.net[2](value * F.gelu(gate))


class RefBasicBlock(nn.Module):
    def __init__(self, dim, heads, ctx_dim=None):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = RefAttention(dim, dim, heads)
        self.has_cross = ctx_dim is not None
        if self.has_cross:
            self.norm2 = nn.LayerNorm(dim)
            self.attn2 = RefAttention(dim, ctx_dim, heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = RefFeedForward(dim)

    def forward(self, x, ctx=None, self_bias=None):
        x = x + self.attn1(self.norm1(x), bias=self_bias)
        if self.has_cross:
            x = x + self.attn2(self.norm2(x), ctx=ctx)
        x = x + self.ff(self.norm3(x))
        return x


class RefSpatialTransformer(nn.Module):
    """Transformer1DModel twin — proj_out exists but is NOT applied
    (reference transformer_1d.py:275-279 quirk)."""

    def __init__(self, channels, heads, ctx_dim, groups):
        super().__init__()
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Conv1d(channels, channels, 1)
        self.transformer_blocks = nn.ModuleList(
            [RefBasicBlock(channels, heads, ctx_dim)])
        self.proj_out = nn.Conv1d(channels, channels, 1)  # unused

    def forward(self, x, ctx):  # x: [B, C, T]
        residual = x
        h = self.proj_in(self.norm(x)).permute(0, 2, 1)
        for blk in self.transformer_blocks:
            h = blk(h, ctx=ctx)
        return h.permute(0, 2, 1) + residual


class RefResnet(nn.Module):
    def __init__(self, cin, cout, temb, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-5)
        self.conv1 = nn.Conv1d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-5)
        self.conv2 = nn.Conv1d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv1d(cin, cout, 1)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class _Sampler(nn.Module):
    pass


class RefUNet(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        ch = cfg.block_out_channels
        g = cfg.norm_num_groups
        temb = ch[0] * 4
        ctx = cfg.cross_attention_dim
        heads = cfg.unet_num_heads
        self.cfg = cfg
        self.conv_in = nn.Conv1d(cfg.in_channels, ch[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(ch[0], temb)
        self.time_embedding.linear_2 = nn.Linear(temb, temb)

        self.down_blocks = nn.ModuleList()
        out_c = ch[0]
        for i, kind in enumerate(cfg.down_block_types):
            in_c, out_c = out_c, ch[i]
            blk = nn.Module()
            blk.kind = kind
            blk.resnets = nn.ModuleList(
                [RefResnet(in_c if j == 0 else out_c, out_c, temb, g)
                 for j in range(cfg.layers_per_block)])
            if kind == "CrossAttnDownBlock1D":
                blk.attentions = nn.ModuleList(
                    [RefSpatialTransformer(out_c, heads, ctx, g)
                     for _ in range(cfg.layers_per_block)])
            if i < len(ch) - 1:
                ds = _Sampler()
                ds.conv = nn.Conv1d(out_c, out_c, 3, stride=2, padding=1)
                blk.downsamplers = nn.ModuleList([ds])
            self.down_blocks.append(blk)

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [RefResnet(ch[-1], ch[-1], temb, g),
             RefResnet(ch[-1], ch[-1], temb, g)])
        self.mid_block.attentions = nn.ModuleList(
            [RefSpatialTransformer(ch[-1], heads, ctx, g)])

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(ch))
        prev = rev[0]
        for i, kind in enumerate(cfg.up_block_types):
            out_c = rev[i]
            in_c = rev[min(i + 1, len(ch) - 1)]
            blk = nn.Module()
            blk.kind = kind
            n_layers = cfg.layers_per_block + 1
            resnets = []
            for j in range(n_layers):
                skip = in_c if j == n_layers - 1 else out_c
                rin = prev if j == 0 else out_c
                resnets.append(RefResnet(rin + skip, out_c, temb, g))
            blk.resnets = nn.ModuleList(resnets)
            if kind == "CrossAttnUpBlock1D":
                blk.attentions = nn.ModuleList(
                    [RefSpatialTransformer(out_c, heads, ctx, g)
                     for _ in range(n_layers)])
            if i < len(ch) - 1:
                us = _Sampler()
                us.conv = nn.Conv1d(out_c, out_c, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            self.up_blocks.append(blk)
            prev = out_c

        self.conv_norm_out = nn.GroupNorm(g, ch[0], eps=cfg.norm_eps)
        self.conv_out = nn.Conv1d(ch[0], cfg.out_channels, 3, padding=1)

    def forward(self, x, timesteps, ctx):  # x: [B, C, T]
        cfg = self.cfg
        half = cfg.block_out_channels[0] // 2
        exponent = -math.log(10000.0) * torch.arange(half).float() / half
        freqs = torch.exp(exponent)
        ang = timesteps.float()[:, None] * freqs[None]
        t_feat = torch.cat([torch.cos(ang), torch.sin(ang)], -1)  # flipped
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(t_feat)))

        x = self.conv_in(x)
        skips = [x]
        for blk in self.down_blocks:
            for j, rn in enumerate(blk.resnets):
                x = rn(x, temb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, ctx)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0].conv(x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, temb)

        for blk in self.up_blocks:
            for j, rn in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = rn(x, temb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, ctx)
            if hasattr(blk, "upsamplers"):
                target = skips[-1].shape[-1] if skips else x.shape[-1] * 2
                x = F.interpolate(x, size=target, mode="nearest")
                x = blk.upsamplers[0].conv(x)

        return self.conv_out(F.silu(self.conv_norm_out(x)))


class RefTTS(nn.Module):
    def __init__(self, cfg: ModelConfig):
        super().__init__()
        self.cfg = cfg
        te = nn.Module()
        te.word_embedding = nn.Embedding(cfg.cmu_vocab_len,
                                         cfg.cross_attention_dim)
        heads = cfg.cross_attention_dim // cfg.attention_head_dim
        te.transformer_blocks = nn.ModuleList(
            [RefBasicBlock(cfg.cross_attention_dim, heads)
             for _ in range(cfg.text_encoder_layers)])
        self.text_encoder = te
        self.unet = RefUNet(cfg)

    def forward(self, sample, timesteps, ids, mask):
        from prompt_tts_tpu.models.embeddings import (
            transposed_positional_encoding,
        )
        cfg = self.cfg
        bias = ((1 - mask.float()) * -10000.0)[:, None, None, :]
        h = self.text_encoder.word_embedding(ids)
        pos = torch.from_numpy(
            transposed_positional_encoding(
                cfg.cmu_seq_len, cfg.cross_attention_dim)).float()
        h = h + pos[None, : h.shape[1]]
        for blk in self.text_encoder.transformer_blocks:
            h = blk(h, self_bias=bias)
        return self.unet(sample, timesteps, h)
