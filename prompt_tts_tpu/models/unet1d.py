"""Conditional 1-D UNet denoiser, channels-last, Flax.

Behavioral twin of the reference ``Unet1DConditionModel``
(reference tts/ldm/unet_1d_condition.py:38,553-739) and its block zoo
(reference tts/ldm/unet_blocks.py, tts/ldm/resnet.py,
tts/ldm/transformer_1d.py), redesigned TPU-first:

* layout is ``[B, T, C]`` (lanes on channels) instead of torch ``[B, C, T]``;
* all lengths are static Python ints — the up path resizes to the recorded
  skip length at trace time instead of the reference's runtime
  ``forward_upsample_size`` check (unet_1d_condition.py:589-594, 712-715);
* activation checkpointing is applied at the train-step level with
  ``jax.checkpoint`` policies rather than per-block torch checkpoint calls
  (unet_blocks.py:186-194 etc.).

Parity quirks deliberately kept (SURVEY.md §7.3):
* cross-attention over padded text is UNMASKED — the reference computes an
  additive mask but never forwards it into any transformer stack
  (unet_1d_condition.py:596-599 vs unet_blocks.py:393-398, and explicitly
  ``None`` for up blocks at unet_1d_condition.py:721);
* the spatial transformer applies ``proj_in`` but NOT ``proj_out`` — the
  reference's continuous path leaves ``proj_out`` unused
  (transformer_1d.py:275-279, the 2-D application is commented out), which
  is why its DDP needs ``find_unused_parameters``.  ``apply_proj_out``
  restores the conventional behavior when set;
* in UNet blocks the config's ``attention_head_dim`` acts as the NUMBER of
  heads with head_dim = channels/heads (unet_blocks.py:317-319).
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import ModelConfig
from prompt_tts_tpu.models.embeddings import (
    GaussianFourierProjection, TimestepEmbedding, timestep_embedding,
)
from prompt_tts_tpu.models.layers import Conv1d, GroupNorm, TransformerBlock


def _nearest_resize(x: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Nearest-neighbor resize along T for ``[B, T, C]`` (torch semantics).

    torch ``F.interpolate(mode="nearest")`` picks ``src = floor(i * Tin/Tout)``.
    Implemented as a static gather, which XLA lowers efficiently.
    """
    t_in = x.shape[1]
    if t_in == target_len:
        return x
    if target_len == 2 * t_in:
        # exact 2x: repeat is cheaper than a gather and torch-identical
        return jnp.repeat(x, 2, axis=1)
    idx = (jnp.arange(target_len) * t_in) // target_len
    return x[:, idx, :]


class ResnetBlock1D(nn.Module):
    """GN -> SiLU -> conv -> +temb -> GN -> SiLU -> dropout -> conv -> +skip.

    Reference ``ResnetBlock1D`` (tts/ldm/resnet.py:99-283), "default"
    time-embedding norm, kernel 3, 1x1 shortcut when channels change.
    """

    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    dropout: float = 0.0
    output_scale_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, deterministic: bool = True):
        in_channels = x.shape[-1]
        h = GroupNorm(self.groups, self.eps, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = Conv1d(self.out_channels, 3, dtype=self.dtype, name="conv1")(h)

        t = nn.silu(temb)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(t)
        h = h + t[:, None, :]

        h = GroupNorm(self.groups, self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = Conv1d(self.out_channels, 3, dtype=self.dtype, name="conv2")(h)

        if in_channels != self.out_channels:
            x = Conv1d(self.out_channels, 1, padding=0, dtype=self.dtype,
                       name="conv_shortcut")(x)
        return (x + h) / self.output_scale_factor


class Downsample1D(nn.Module):
    """Strided conv downsample (k3, s2, pad1) — reference resnet.py:52-96.

    ``use_conv=False`` is the reference's (never-invoked) AvgPool variant
    (resnet.py:76-82: ``AvgPool1d(kernel_size=stride, stride=stride)``,
    which requires in == out channels).
    """

    channels: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if not self.use_conv:
            assert x.shape[-1] == self.channels, (
                "AvgPool downsample cannot change channels (reference "
                "resnet.py:76 asserts the same)")
            return nn.avg_pool(x, window_shape=(2,), strides=(2,))
        return Conv1d(self.channels, 3, stride=2, padding=1,
                      dtype=self.dtype, name="conv")(x)


class Upsample1D(nn.Module):
    """Nearest x2 (to a static target length) + conv k3 — resnet.py:11-49.

    ``use_conv_transpose=True`` is the reference's (never-invoked)
    ``ConvTranspose1d(channels, out, 4, 2, 1)`` variant (resnet.py:32,
    37-39): exact 2x length, no nearest interpolation.  Implemented as a
    dilated correlation with the flipped kernel — bit-equal to torch's
    transposed convolution (golden-tested in tests/test_models.py).
    """

    channels: int
    target_len: int
    use_conv_transpose: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv_transpose:
            assert self.target_len == 2 * x.shape[1], (
                "conv-transpose upsample is exactly 2x (reference "
                "resnet.py:38 returns self.conv(x) unconditionally)")
            # torch ConvTranspose1d(k=4, s=2, p=1): out[t] = sum_k
            # x[(t + p - k)/s] W[k]  ==  dilate x by 2, pad k-1-p=2,
            # correlate with the k-flipped kernel
            w = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (4, x.shape[-1], self.channels)).astype(self.dtype)
            b = self.param("bias", nn.initializers.zeros,
                           (self.channels,)).astype(self.dtype)
            out = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w[::-1],
                window_strides=(1,), padding=[(2, 2)], lhs_dilation=(2,),
                dimension_numbers=("NWC", "WIO", "NWC"))
            return out + b
        x = _nearest_resize(x, self.target_len)
        return Conv1d(self.channels, 3, dtype=self.dtype, name="conv")(x)


class SpatialTransformer1D(nn.Module):
    """GroupNorm -> 1x1 proj_in -> transformer block(s) -> +residual.

    Reference ``Transformer1DModel`` (tts/ldm/transformer_1d.py:26,199-310).
    ``apply_proj_out=False`` mirrors the reference bug where ``proj_out``
    exists but is never applied on the continuous path.
    """

    num_heads: int
    head_dim: int
    cross_attention_dim: int
    groups: int = 32
    num_layers: int = 1
    dropout: float = 0.0
    apply_proj_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, deterministic: bool = True,
                 cross_kv=None):
        inner = self.num_heads * self.head_dim
        residual = x
        h = GroupNorm(self.groups, 1e-6, dtype=self.dtype, name="norm")(x)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.num_layers):
            h = TransformerBlock(
                dim=inner, num_heads=self.num_heads, head_dim=self.head_dim,
                dropout=self.dropout,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype, name=f"block_{i}",
            )(h, context=context, deterministic=deterministic,
              cross_kv=None if cross_kv is None else cross_kv[i])
        if self.apply_proj_out:
            h = nn.Dense(x.shape[-1], dtype=self.dtype, name="proj_out")(h)
        return h + residual


class DownBlock1D(nn.Module):
    """N resnets (+ optional downsample); returns per-layer skips.

    Reference ``DownBlock1D`` (unet_blocks.py:205-281).
    """

    out_channels: int
    num_layers: int
    add_downsample: bool
    downsample_use_conv: bool
    groups: int
    eps: float
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, deterministic: bool = True):
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock1D(self.out_channels, self.groups, self.eps,
                              self.dropout, dtype=self.dtype,
                              name=f"resnet_{i}")(x, temb, deterministic)
            skips.append(x)
        if self.add_downsample:
            x = Downsample1D(self.out_channels,
                             use_conv=self.downsample_use_conv,
                             dtype=self.dtype, name="downsample")(x)
            skips.append(x)
        return x, skips


class CrossAttnDownBlock1D(nn.Module):
    """N x (resnet -> spatial transformer) (+ downsample) — unet_blocks.py:284-408."""

    out_channels: int
    num_layers: int
    num_heads: int
    cross_attention_dim: int
    add_downsample: bool
    downsample_use_conv: bool
    groups: int
    eps: float
    dropout: float = 0.0
    apply_proj_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, deterministic: bool = True,
                 cross_kv=None):
        skips = []
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            x = ResnetBlock1D(self.out_channels, self.groups, self.eps,
                              self.dropout, dtype=self.dtype,
                              name=f"resnet_{i}")(x, temb, deterministic)
            x = SpatialTransformer1D(
                num_heads=self.num_heads, head_dim=head_dim,
                cross_attention_dim=self.cross_attention_dim,
                groups=self.groups, dropout=self.dropout,
                apply_proj_out=self.apply_proj_out, dtype=self.dtype,
                name=f"attn_{i}",
            )(x, context, deterministic,
              cross_kv=None if cross_kv is None else cross_kv[f"attn_{i}"])
            skips.append(x)
        if self.add_downsample:
            x = Downsample1D(self.out_channels,
                             use_conv=self.downsample_use_conv,
                             dtype=self.dtype, name="downsample")(x)
            skips.append(x)
        return x, skips


class UpBlock1D(nn.Module):
    """N x (skip-concat -> resnet) (+ optional upsample) — unet_blocks.py:131-202."""

    out_channels: int
    num_layers: int
    add_upsample: bool
    upsample_target_len: int
    upsample_conv_transpose: bool
    groups: int
    eps: float
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, deterministic: bool = True):
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock1D(self.out_channels, self.groups, self.eps,
                              self.dropout, dtype=self.dtype,
                              name=f"resnet_{i}")(x, temb, deterministic)
        if self.add_upsample:
            x = Upsample1D(self.out_channels, self.upsample_target_len,
                           use_conv_transpose=self.upsample_conv_transpose,
                           dtype=self.dtype, name="upsample")(x)
        return x


class CrossAttnUpBlock1D(nn.Module):
    """N x (skip-concat -> resnet -> transformer) (+ upsample) — unet_blocks.py:411-529."""

    out_channels: int
    num_layers: int
    num_heads: int
    cross_attention_dim: int
    add_upsample: bool
    upsample_target_len: int
    upsample_conv_transpose: bool
    groups: int
    eps: float
    dropout: float = 0.0
    apply_proj_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context, deterministic: bool = True,
                 cross_kv=None):
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock1D(self.out_channels, self.groups, self.eps,
                              self.dropout, dtype=self.dtype,
                              name=f"resnet_{i}")(x, temb, deterministic)
            x = SpatialTransformer1D(
                num_heads=self.num_heads, head_dim=head_dim,
                cross_attention_dim=self.cross_attention_dim,
                groups=self.groups, dropout=self.dropout,
                apply_proj_out=self.apply_proj_out, dtype=self.dtype,
                name=f"attn_{i}",
            )(x, context, deterministic,
              cross_kv=None if cross_kv is None else cross_kv[f"attn_{i}"])
        if self.add_upsample:
            x = Upsample1D(self.out_channels, self.upsample_target_len,
                           use_conv_transpose=self.upsample_conv_transpose,
                           dtype=self.dtype, name="upsample")(x)
        return x


class MidBlock1DCrossAttn(nn.Module):
    """resnet -> (transformer -> resnet) x N — unet_blocks.py:532-620."""

    channels: int
    num_heads: int
    cross_attention_dim: int
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-5
    dropout: float = 0.0
    apply_proj_out: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, deterministic: bool = True,
                 cross_kv=None):
        head_dim = self.channels // self.num_heads
        x = ResnetBlock1D(self.channels, self.groups, self.eps, self.dropout,
                          dtype=self.dtype, name="resnet_0")(
            x, temb, deterministic)
        for i in range(self.num_layers):
            x = SpatialTransformer1D(
                num_heads=self.num_heads, head_dim=head_dim,
                cross_attention_dim=self.cross_attention_dim,
                groups=self.groups, dropout=self.dropout,
                apply_proj_out=self.apply_proj_out, dtype=self.dtype,
                name=f"attn_{i}",
            )(x, context, deterministic,
              cross_kv=None if cross_kv is None else cross_kv[f"attn_{i}"])
            x = ResnetBlock1D(self.channels, self.groups, self.eps,
                              self.dropout, dtype=self.dtype,
                              name=f"resnet_{i + 1}")(x, temb, deterministic)
        return x


class UNet1DCondition(nn.Module):
    """The full conditional denoiser: eps_hat(x_t, t, text_context).

    Input/output ``[B, T, C]`` channels-last; ``context`` is the text
    encoder output ``[B, S, cross_attention_dim]``.
    """

    config: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,     # [B, T, in_channels]
        timesteps: jnp.ndarray,  # [B] int
        context: jnp.ndarray,    # [B, S, cross_dim]
        class_emb: Optional[jnp.ndarray] = None,  # [B, time_embed_dim]
        class_labels: Optional[jnp.ndarray] = None,  # see class_embed_type
        deterministic: bool = True,
        cross_kv: Optional[dict] = None,  # see cross_attention_kv()
    ) -> jnp.ndarray:            # [B, T, out_channels]
        cfg = self.config
        ckv = cross_kv if cross_kv is not None else {}
        chans = cfg.block_out_channels
        n_blocks = len(chans)

        # 1. time conditioning.  "positional" is the reference's operative
        # path (unet_1d_condition.py:205-209: sinusoidal -> MLP to
        # 4*chans[0]); "fourier" is its optional random-Fourier variant
        # (:198-204: embedding_size chans[0] -> dim 2*chans[0]).
        if cfg.time_embedding_type == "fourier":
            time_embed_dim = chans[0] * 2
            time_proj = GaussianFourierProjection(
                chans[0], flip_sin_to_cos=cfg.flip_sin_to_cos,
                name="time_proj")
            t_feat = time_proj(timesteps).astype(self.dtype)
        else:
            time_embed_dim = chans[0] * 4
            time_proj = lambda t: timestep_embedding(
                t, chans[0], flip_sin_to_cos=cfg.flip_sin_to_cos,
                downscale_freq_shift=cfg.freq_shift)
            t_feat = time_proj(timesteps).astype(self.dtype)
        temb = TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                 name="time_embedding")(t_feat)

        # optional class conditioning (reference unet_1d_condition.py:
        # 229-256 init, :634-646 forward — additive to the time embedding).
        # ``class_emb`` is the already-embedded hook (the prompt-TTS
        # speaker embedding uses it); ``class_labels`` goes through the
        # configured class_embedding variant first.
        if class_labels is not None:
            if cfg.class_embed_type is None and cfg.num_class_embeds:
                cemb = nn.Embed(cfg.num_class_embeds, time_embed_dim,
                                dtype=self.dtype,
                                name="class_embedding")(class_labels)
            elif cfg.class_embed_type == "timestep":
                # labels are first run through the SAME time_proj
                # (unet_1d_condition.py:639-640)
                cemb = TimestepEmbedding(
                    time_embed_dim, dtype=self.dtype,
                    name="class_embedding")(
                    jnp.asarray(time_proj(class_labels)).astype(self.dtype))
            elif cfg.class_embed_type == "identity":
                cemb = class_labels.astype(temb.dtype)
            elif cfg.class_embed_type == "projection":
                # arbitrary-dim input vector through the embedding MLP
                # (unet_1d_condition.py:236-248)
                cemb = TimestepEmbedding(
                    time_embed_dim, dtype=self.dtype,
                    name="class_embedding")(class_labels.astype(self.dtype))
            else:
                raise ValueError(
                    "class_labels given but no class embedding configured "
                    "(set class_embed_type or num_class_embeds)")
            temb = temb + cemb.astype(temb.dtype)
        if class_emb is not None:
            temb = temb + class_emb.astype(temb.dtype)

        # 2. input projection
        x = Conv1d(chans[0], 3, dtype=self.dtype, name="conv_in")(sample)

        # 3. down path (track skips + their static lengths)
        skips = [x]
        skip_lens = [x.shape[1]]
        for i, block_type in enumerate(cfg.down_block_types):
            is_final = i == n_blocks - 1
            common = dict(
                out_channels=chans[i], num_layers=cfg.layers_per_block,
                add_downsample=not is_final,
                downsample_use_conv=not cfg.downsample_avg_pool,
                groups=cfg.norm_num_groups,
                eps=cfg.norm_eps, dropout=cfg.dropout, dtype=self.dtype,
                name=f"down_{i}",
            )
            if block_type == "CrossAttnDownBlock1D":
                x, new_skips = CrossAttnDownBlock1D(
                    num_heads=cfg.unet_num_heads,
                    cross_attention_dim=cfg.cross_attention_dim,
                    **common,
                )(x, temb, context, deterministic,
                  cross_kv=ckv.get(f"down_{i}"))
            elif block_type == "DownBlock1D":
                x, new_skips = DownBlock1D(**common)(x, temb, deterministic)
            else:
                raise ValueError(f"unknown down block {block_type}")
            skips.extend(new_skips)
            skip_lens.extend(s.shape[1] for s in new_skips)

        # 4. mid
        if cfg.mid_block_type == "UNetMidBlock1DCrossAttn":
            x = MidBlock1DCrossAttn(
                channels=chans[-1], num_heads=cfg.unet_num_heads,
                cross_attention_dim=cfg.cross_attention_dim,
                groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                dropout=cfg.dropout, dtype=self.dtype, name="mid",
            )(x, temb, context, deterministic, cross_kv=ckv.get("mid"))
        elif cfg.mid_block_type is not None:
            raise ValueError(f"unknown mid block {cfg.mid_block_type}")

        # 5. up path: each block consumes layers_per_block+1 skips and
        # upsamples to the length of the NEXT skip to be consumed (the
        # static-shape equivalent of the reference's forward_upsample_size).
        rev_chans = list(reversed(chans))
        up_layers = cfg.layers_per_block + 1
        for i, block_type in enumerate(cfg.up_block_types):
            is_final = i == n_blocks - 1
            remaining = len(skips) - up_layers
            target_len = skip_lens[remaining - 1] if remaining > 0 else x.shape[1]
            common = dict(
                out_channels=rev_chans[i], num_layers=up_layers,
                add_upsample=not is_final, upsample_target_len=target_len,
                upsample_conv_transpose=cfg.upsample_conv_transpose,
                groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                dropout=cfg.dropout, dtype=self.dtype, name=f"up_{i}",
            )
            if block_type == "CrossAttnUpBlock1D":
                x = CrossAttnUpBlock1D(
                    num_heads=cfg.unet_num_heads,
                    cross_attention_dim=cfg.cross_attention_dim,
                    **common,
                )(x, skips, temb, context, deterministic,
                  cross_kv=ckv.get(f"up_{i}"))
            elif block_type == "UpBlock1D":
                x = UpBlock1D(**common)(x, skips, temb, deterministic)
            else:
                raise ValueError(f"unknown up block {block_type}")

        # 6. output head
        x = GroupNorm(cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype,
                      name="conv_norm_out")(x)
        x = nn.silu(x)
        x = Conv1d(cfg.out_channels, 3, dtype=self.dtype, name="conv_out")(x)
        return x


def cross_attn_sites(cfg: ModelConfig):
    """Yield ``(block_name, attn_name, n_transformer_layers)`` for every
    cross-attention transformer in the UNet, in forward order."""
    for i, bt in enumerate(cfg.down_block_types):
        if bt == "CrossAttnDownBlock1D":
            for l in range(cfg.layers_per_block):
                yield f"down_{i}", f"attn_{l}", 1
    if cfg.mid_block_type == "UNetMidBlock1DCrossAttn":
        yield "mid", "attn_0", 1
    for i, bt in enumerate(cfg.up_block_types):
        if bt == "CrossAttnUpBlock1D":
            for l in range(cfg.layers_per_block + 1):
                yield f"up_{i}", f"attn_{l}", 1


def cross_attention_kv(unet_params: dict, context: jnp.ndarray,
                       cfg: ModelConfig, dtype=jnp.float32) -> dict:
    """Precompute every cross-attention (k, v) for a fixed ``context``.

    The DDIM sampler's context is loop-invariant, so the ``to_k``/``to_v``
    projections (~57 GFLOP per denoise step) can run once per utterance.
    (Measured end-to-end neutral on v5e — XLA hoists scan-invariant work
    itself — but this makes the invariant explicit and reusable across
    calls.)  Returns the ``cross_kv`` dict ``UNet1DCondition.__call__``
    accepts:
    ``{block: {attn: [(k, v)] per transformer layer}}`` with k/v shaped
    ``[B, S, heads, head_dim]`` in ``dtype``.

    The math is bit-identical to the in-call path: the same kernel applied
    with the same dtype promotion (f32 params cast to model dtype).
    """
    B, S, _ = context.shape
    H = cfg.unet_num_heads
    ctx = context.astype(dtype)
    out: dict = {}
    for block, attn, n_layers in cross_attn_sites(cfg):
        layers = []
        for l in range(n_layers):
            p = unet_params[block][attn][f"block_{l}"]["attn2"]
            kv = []
            for name in ("to_k", "to_v"):
                w = p[name]["kernel"].astype(dtype)   # [Cc, inner]
                proj = ctx @ w                         # [B, S, inner]
                kv.append(proj.reshape(B, S, H, w.shape[1] // H))
            layers.append(tuple(kv))
        out.setdefault(block, {})[attn] = layers
    return out
