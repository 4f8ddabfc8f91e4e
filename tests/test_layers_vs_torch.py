"""Golden numeric tests: Flax layers vs torch-primitive references.

Each test builds the torch equivalent of a layer from torch.nn primitives
(following the diffusers-0.15 semantics the reference composes, cited per
test), converts the torch weights into the Flax param tree, and compares
outputs on random inputs.  This validates cross-framework numerics of the
conv padding/stride, norm grouping, attention scale/bias, GEGLU chunk
order, and the timestep/positional embeddings.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from prompt_tts_tpu.models.embeddings import (
    timestep_embedding,
    transposed_positional_encoding,
)
from prompt_tts_tpu.models.layers import (
    Attention,
    Conv1d,
    GEGLUFeedForward,
    GroupNorm,
    TransformerBlock,
    mask_to_bias,
)
from prompt_tts_tpu.models.unet1d import ResnetBlock1D, _nearest_resize

ATOL = 2e-5

torch.manual_seed(0)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def linear_params(lin):
    return {"kernel": t2j(lin.weight).T, "bias": t2j(lin.bias)}


def linear_params_nobias(lin):
    return {"kernel": t2j(lin.weight).T}


def conv_params(conv):
    # torch [out, in, k] -> flax [k, in, out]
    p = {"kernel": jnp.transpose(t2j(conv.weight), (2, 1, 0))}
    if conv.bias is not None:
        p["bias"] = t2j(conv.bias)
    return p


def norm_params(norm):
    return {"scale": t2j(norm.weight), "bias": t2j(norm.bias)}


class TestConv1d:
    @pytest.mark.parametrize("stride,k,pad", [(1, 3, 1), (2, 3, 1), (1, 1, 0)])
    def test_matches_torch(self, stride, k, pad):
        tc = torch.nn.Conv1d(16, 32, k, stride=stride, padding=pad)
        x = torch.randn(2, 16, 50)
        ref = tc(x).detach().numpy()  # [B, C, T']

        fl = Conv1d(32, k, stride=stride, padding=pad)
        params = {"params": {"conv": conv_params(tc)}}
        out = fl.apply(params, t2j(x).transpose(0, 2, 1))  # [B, T, C]
        np.testing.assert_allclose(
            np.transpose(out, (0, 2, 1)), ref, atol=ATOL)


class TestGroupNorm:
    def test_matches_torch(self):
        tn = torch.nn.GroupNorm(8, 32, eps=1e-5)
        with torch.no_grad():
            tn.weight.normal_()
            tn.bias.normal_()
        x = torch.randn(2, 32, 40)
        ref = tn(x).detach().numpy()

        fl = GroupNorm(8, 1e-5)
        params = {"params": {"norm": norm_params(tn)}}
        out = fl.apply(params, t2j(x).transpose(0, 2, 1))
        np.testing.assert_allclose(np.transpose(out, (0, 2, 1)), ref, atol=ATOL)


def torch_attention(q_l, k_l, v_l, o_l, x, ctx, heads, bias=None):
    """diffusers-0.15 CrossAttention numerics (dependency of reference
    tts/ldm/transformer_1d.py:163-181)."""
    B, Tq, _ = x.shape
    Tk = ctx.shape[1]
    d = q_l.out_features // heads
    q = q_l(x).view(B, Tq, heads, d).transpose(1, 2)
    k = k_l(ctx).view(B, Tk, heads, d).transpose(1, 2)
    v = v_l(ctx).view(B, Tk, heads, d).transpose(1, 2)
    scores = q @ k.transpose(-1, -2) * d ** -0.5
    if bias is not None:
        scores = scores + bias
    probs = scores.softmax(-1)
    out = (probs @ v).transpose(1, 2).reshape(B, Tq, heads * d)
    return o_l(out)


class TestAttention:
    def _build(self, dim, ctx_dim, heads):
        q = torch.nn.Linear(dim, dim, bias=False)
        k = torch.nn.Linear(ctx_dim, dim, bias=False)
        v = torch.nn.Linear(ctx_dim, dim, bias=False)
        o = torch.nn.Linear(dim, dim)
        fl_params = {
            "to_q": linear_params_nobias(q),
            "to_k": linear_params_nobias(k),
            "to_v": linear_params_nobias(v),
            "to_out": linear_params(o),
        }
        return (q, k, v, o), fl_params

    def test_self_attention(self):
        (q, k, v, o), fl_params = self._build(64, 64, 4)
        x = torch.randn(2, 20, 64)
        ref = torch_attention(q, k, v, o, x, x, 4).detach().numpy()
        fl = Attention(num_heads=4, head_dim=16, out_dim=64)
        out = fl.apply({"params": fl_params}, t2j(x))
        np.testing.assert_allclose(out, ref, atol=ATOL)

    def test_cross_attention_with_key_bias(self):
        (q, k, v, o), fl_params = self._build(64, 96, 4)
        x = torch.randn(2, 20, 64)
        ctx = torch.randn(2, 30, 96)
        mask01 = (torch.rand(2, 30) > 0.3).int()
        # reference-style additive bias (tts/models.py:107-110)
        tbias = ((1 - mask01.float()) * -10000.0)[:, None, None, :]
        ref = torch_attention(q, k, v, o, x, ctx, 4, tbias).detach().numpy()

        fl = Attention(num_heads=4, head_dim=16, out_dim=64)
        jbias = mask_to_bias(t2j(mask01))
        out = fl.apply({"params": fl_params}, t2j(x), context=t2j(ctx),
                       bias=jbias)
        np.testing.assert_allclose(out, ref, atol=ATOL)


class TestGEGLU:
    def test_matches_torch(self):
        dim = 32
        proj = torch.nn.Linear(dim, dim * 8)
        out_l = torch.nn.Linear(dim * 4, dim)
        x = torch.randn(2, 10, dim)
        # diffusers GEGLU: value * gelu(gate), exact erf GELU
        h = proj(x)
        value, gate = h.chunk(2, dim=-1)
        ref = out_l(value * F.gelu(gate)).detach().numpy()

        fl = GEGLUFeedForward(dim=dim)
        params = {"params": {"proj": linear_params(proj),
                             "out": linear_params(out_l)}}
        got = fl.apply(params, t2j(x))
        np.testing.assert_allclose(got, ref, atol=ATOL)


class TorchBasicBlock(torch.nn.Module):
    """BasicTransformerBlock (diffusers 0.15) from torch.nn primitives."""

    def __init__(self, dim, heads, ctx_dim=None):
        super().__init__()
        self.heads = heads
        self.norm1 = torch.nn.LayerNorm(dim)
        self.q1 = torch.nn.Linear(dim, dim, bias=False)
        self.k1 = torch.nn.Linear(dim, dim, bias=False)
        self.v1 = torch.nn.Linear(dim, dim, bias=False)
        self.o1 = torch.nn.Linear(dim, dim)
        self.ctx_dim = ctx_dim
        if ctx_dim is not None:
            self.norm2 = torch.nn.LayerNorm(dim)
            self.q2 = torch.nn.Linear(dim, dim, bias=False)
            self.k2 = torch.nn.Linear(ctx_dim, dim, bias=False)
            self.v2 = torch.nn.Linear(ctx_dim, dim, bias=False)
            self.o2 = torch.nn.Linear(dim, dim)
        self.norm3 = torch.nn.LayerNorm(dim)
        self.ff_proj = torch.nn.Linear(dim, dim * 8)
        self.ff_out = torch.nn.Linear(dim * 4, dim)

    def forward(self, x, ctx=None, self_bias=None):
        h = torch_attention(self.q1, self.k1, self.v1, self.o1,
                            self.norm1(x), self.norm1(x), self.heads,
                            self_bias)
        x = x + h
        if self.ctx_dim is not None:
            h = torch_attention(self.q2, self.k2, self.v2, self.o2,
                                self.norm2(x), ctx, self.heads)
            x = x + h
        h = self.ff_proj(self.norm3(x))
        value, gate = h.chunk(2, dim=-1)
        x = x + self.ff_out(value * F.gelu(gate))
        return x

    def flax_params(self):
        p = {
            "norm1": norm_params(self.norm1),
            "attn1": {
                "to_q": linear_params_nobias(self.q1),
                "to_k": linear_params_nobias(self.k1),
                "to_v": linear_params_nobias(self.v1),
                "to_out": linear_params(self.o1),
            },
            "norm3": norm_params(self.norm3),
            "ff": {"proj": linear_params(self.ff_proj),
                   "out": linear_params(self.ff_out)},
        }
        if self.ctx_dim is not None:
            p["norm2"] = norm_params(self.norm2)
            p["attn2"] = {
                "to_q": linear_params_nobias(self.q2),
                "to_k": linear_params_nobias(self.k2),
                "to_v": linear_params_nobias(self.v2),
                "to_out": linear_params(self.o2),
            }
        return p


class TestTransformerBlock:
    def test_self_only_with_bias(self):
        tb = TorchBasicBlock(64, 4)
        x = torch.randn(2, 12, 64)
        mask01 = (torch.rand(2, 12) > 0.3).int()
        tbias = ((1 - mask01.float()) * -10000.0)[:, None, None, :]
        ref = tb(x, self_bias=tbias).detach().numpy()

        fl = TransformerBlock(dim=64, num_heads=4, head_dim=16)
        out = fl.apply({"params": tb.flax_params()}, t2j(x),
                       self_attn_bias=mask_to_bias(t2j(mask01)))
        np.testing.assert_allclose(out, ref, atol=ATOL)

    def test_with_cross_attention(self):
        tb = TorchBasicBlock(64, 4, ctx_dim=96)
        x = torch.randn(2, 12, 64)
        ctx = torch.randn(2, 9, 96)
        ref = tb(x, ctx=ctx).detach().numpy()

        fl = TransformerBlock(dim=64, num_heads=4, head_dim=16,
                              cross_attention_dim=96)
        out = fl.apply({"params": tb.flax_params()}, t2j(x), context=t2j(ctx))
        np.testing.assert_allclose(out, ref, atol=ATOL)


class TorchResnetBlock1D(torch.nn.Module):
    """Reference ResnetBlock1D semantics (tts/ldm/resnet.py:99-283) built
    from torch.nn primitives: GN-silu-conv, +temb, GN-silu-conv, shortcut."""

    def __init__(self, cin, cout, temb_ch, groups=8, eps=1e-5):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = torch.nn.Conv1d(cin, cout, 3, padding=1)
        self.time_emb_proj = torch.nn.Linear(temb_ch, cout)
        self.norm2 = torch.nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = torch.nn.Conv1d(cout, cout, 3, padding=1)
        self.shortcut = (torch.nn.Conv1d(cin, cout, 1)
                         if cin != cout else None)

    def forward(self, x, temb):
        h = F.silu(self.norm1(x))
        h = self.conv1(h)
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None]
        h = F.silu(self.norm2(h))
        h = self.conv2(h)
        if self.shortcut is not None:
            x = self.shortcut(x)
        return x + h

    def flax_params(self):
        p = {
            "norm1": {"norm": norm_params(self.norm1)},
            "conv1": {"conv": conv_params(self.conv1)},
            "time_emb_proj": linear_params(self.time_emb_proj),
            "norm2": {"norm": norm_params(self.norm2)},
            "conv2": {"conv": conv_params(self.conv2)},
        }
        if self.shortcut is not None:
            p["conv_shortcut"] = {"conv": conv_params(self.shortcut)}
        return p


class TestResnetBlock1D:
    @pytest.mark.parametrize("cin,cout", [(32, 32), (32, 64)])
    def test_matches_torch(self, cin, cout):
        tb = TorchResnetBlock1D(cin, cout, 128)
        x = torch.randn(2, cin, 40)
        temb = torch.randn(2, 128)
        ref = tb(x, temb).detach().numpy()

        fl = ResnetBlock1D(out_channels=cout, groups=8, eps=1e-5)
        out = fl.apply({"params": tb.flax_params()},
                       t2j(x).transpose(0, 2, 1), t2j(temb))
        np.testing.assert_allclose(
            np.transpose(out, (0, 2, 1)), ref, atol=ATOL)


class TestEmbeddings:
    def test_timestep_embedding_diffusers_formula(self):
        """diffusers get_timestep_embedding with flip_sin_to_cos=True,
        freq_shift=0 (reference unet_1d_condition.py:206-210)."""
        t = np.array([0, 1, 500, 999], dtype=np.int64)
        dim, half = 64, 32
        exponent = -np.log(10000.0) * np.arange(half) / half
        freqs = np.exp(exponent)
        ang = t[:, None].astype(np.float64) * freqs[None]
        ref = np.concatenate([np.cos(ang), np.sin(ang)], -1)  # flipped
        got = timestep_embedding(jnp.asarray(t), dim)
        # f32 sin/cos at angle ~1000 loses ~1e-4 vs the f64 reference
        np.testing.assert_allclose(got, ref, atol=3e-4)

    def test_transposed_positional_encoding_matches_torch_reference(self):
        """Replicates the reference PositionalEncodingPermute1D math
        (tts/models.py:11-70) in torch and compares tables."""
        seq_len, dim = 50, 24
        channels = int(np.ceil(seq_len / 2) * 2)
        inv_freq = 1.0 / (10000 ** (torch.arange(0, channels, 2).float()
                                    / channels))
        pos_x = torch.arange(dim).float()
        sin_inp = torch.einsum("i,j->ij", pos_x, inv_freq)
        emb_x = torch.flatten(
            torch.stack((sin_inp.sin(), sin_inp.cos()), dim=-1), -2, -1)
        ref = emb_x[:, :seq_len].T.numpy()  # [seq, dim]
        got = transposed_positional_encoding(seq_len, dim)
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestNearestResize:
    @pytest.mark.parametrize("tin,tout", [(10, 20), (113, 225), (5, 10)])
    def test_matches_torch_interpolate(self, tin, tout):
        x = torch.randn(2, 4, tin)
        ref = F.interpolate(x, size=tout, mode="nearest").numpy()
        got = _nearest_resize(t2j(x).transpose(0, 2, 1), tout)
        np.testing.assert_allclose(np.transpose(got, (0, 2, 1)), ref)
