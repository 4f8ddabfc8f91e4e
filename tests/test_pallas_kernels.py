"""Pallas kernel equivalence tests (interpreter mode on CPU).

The kernels are TPU-only at runtime; ``interpret=True``-style coverage on
CPU would diverge from Mosaic, so these tests check the WRAPPER logic
(padding, reshapes, fallbacks, dispatch gates) and the scan-reference
semantics they must match.  Numerical kernel-vs-XLA parity was measured on
the real chip (results recorded in each kernel's docstring):
  attention: bf16-noise-level agreement; LSTM: bit-exact; RVQ: ~1.5%
  near-tie divergence (documented, kernel stays experimental).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prompt_tts_tpu.ops.attention import _use_pallas, _xla_attention
from prompt_tts_tpu.ops.pallas.attention import _pad_to


class TestDispatchGate:
    def test_cpu_never_uses_pallas(self):
        q = jnp.zeros((2, 900, 8, 64))
        assert not _use_pallas(q, q, q, None)

    def test_env_override_respected(self, monkeypatch):
        monkeypatch.setenv("PROMPT_TTS_TPU_ATTN", "xla")
        q = jnp.zeros((2, 4096, 8, 64))
        assert not _use_pallas(q, q, q, None)

    def test_rich_bias_falls_back(self, monkeypatch):
        # even in pallas mode, a full [B,H,Tq,Tk] bias must use XLA
        monkeypatch.setenv("PROMPT_TTS_TPU_ATTN", "pallas")
        monkeypatch.setattr(
            "prompt_tts_tpu.ops.attention._on_tpu", lambda: True)
        q = jnp.zeros((2, 512, 8, 64))
        bias = jnp.zeros((2, 8, 512, 512))
        assert not _use_pallas(q, q, q, bias)
        key_bias = jnp.zeros((2, 1, 1, 512))
        assert _use_pallas(q, q, q, key_bias)


class TestPadHelper:
    def test_pad_to_multiples(self):
        x = jnp.ones((3, 900, 64))
        y = _pad_to(x, 1, 128)
        assert y.shape == (3, 1024, 64)
        np.testing.assert_array_equal(np.asarray(y[:, 900:]), 0.0)
        z = _pad_to(x, 1, 100)
        assert z.shape == (3, 900, 64)  # already multiple


class TestAttentionNumerics:
    def test_bf16_path_close_to_f32(self):
        """The bf16-score fast path must track the f32 path to bf16 noise."""
        rng = jax.random.PRNGKey(0)
        shapes = (2, 96, 4, 32)
        q32 = jax.random.normal(rng, shapes, jnp.float32)
        k32 = jax.random.normal(jax.random.PRNGKey(1), shapes, jnp.float32)
        v32 = jax.random.normal(jax.random.PRNGKey(2), shapes, jnp.float32)
        ref = _xla_attention(q32, k32, v32, None)
        out = _xla_attention(q32.astype(jnp.bfloat16),
                             k32.astype(jnp.bfloat16),
                             v32.astype(jnp.bfloat16), None)
        err = float(jnp.abs(ref - out.astype(jnp.float32)).max())
        assert err < 0.05, err

    def test_bf16_path_respects_bias(self):
        B, T, H, D = 1, 32, 2, 16
        q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D),
                              jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D),
                              jnp.bfloat16)
        # mask out the second half of keys entirely
        bias = jnp.where(jnp.arange(T) < T // 2, 0.0, -1e9)[
            None, None, None, :]
        out = _xla_attention(q, k, v, bias)
        # masked-key attention == attention over the first half only
        ref = _xla_attention(q, k[:, : T // 2], v[:, : T // 2], None)
        err = float(jnp.abs(out.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        assert err < 0.05, err


class TestLSTMScanReference:
    def test_scan_matches_torch_lstm(self):
        """The scan fallback (what the Pallas kernel is bit-exact to on
        TPU) must match torch nn.LSTM numerics."""
        import torch
        torch.manual_seed(0)
        T, B, C = 20, 3, 16
        lstm = torch.nn.LSTM(C, C, 1)
        x = torch.randn(T, B, C)
        with torch.no_grad():
            ref, _ = lstm(x)

        from prompt_tts_tpu.codec.layers import CodecLSTM
        m = CodecLSTM(hidden=C, num_layers=1, use_pallas=False)
        params = {"params": {
            "l0_w_ih": jnp.asarray(lstm.weight_ih_l0.detach().numpy()),
            "l0_w_hh": jnp.asarray(lstm.weight_hh_l0.detach().numpy()),
            "l0_b": jnp.asarray((lstm.bias_ih_l0
                                 + lstm.bias_hh_l0).detach().numpy()),
        }}
        # CodecLSTM adds a residual; subtract the input back out
        out = m.apply(params, jnp.asarray(
            x.numpy().transpose(1, 0, 2)))
        out = np.asarray(out) - x.numpy().transpose(1, 0, 2)
        np.testing.assert_allclose(out, ref.numpy().transpose(1, 0, 2),
                                   atol=2e-6)

    def test_transposed_kernel_matches_scan_interpret(self):
        """lstm_recurrence_t (stationary-state MXU schedule) must be
        bit-identical to the scan reference, incl. the T-padding path."""
        from jax.experimental.pallas import tpu as pltpu
        from prompt_tts_tpu.ops.pallas.lstm import lstm_recurrence_t

        T, B, H = 70, 8, 64  # T=70 with block_t=32 exercises padding
        key = jax.random.PRNGKey(0)
        xp = jax.random.normal(key, (T, B, 4 * H)) * 0.5
        w = jax.random.normal(jax.random.PRNGKey(1), (4 * H, H)) * 0.1

        def scan_rec(xp, w):
            def step(carry, g):
                h, c = carry
                gates = g + h @ w.T
                i, f, gg, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            init = (jnp.zeros((B, H)), jnp.zeros((B, H)))
            _, hs = jax.lax.scan(step, init, xp)
            return hs

        ref = scan_rec(xp, w)
        with pltpu.force_tpu_interpret_mode():
            out = lstm_recurrence_t(xp, w, block_t=32)
        assert out.shape == (T, B, H)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestRVQFusedWrapper:
    def test_interpret_mode_matches_xla_reference(self):
        """The fused kernel in Pallas interpreter mode (CPU) must agree
        with the XLA reference on well-separated codebooks (interpreter
        math has no Mosaic accumulation-order divergence)."""
        from prompt_tts_tpu.codec.rvq import rvq_encode
        from prompt_tts_tpu.ops.pallas.rvq import rvq_encode_fused
        rng = np.random.default_rng(0)
        cb = jnp.asarray(rng.normal(size=(2, 16, 8)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(1, 10, 8)).astype(np.float32))
        ref = rvq_encode(x, cb)
        out = rvq_encode_fused(x, cb, interpret=True)
        assert out.shape == (1, 2, 10) and out.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_interpret_mode_padding_path(self):
        """N not a multiple of the 256-vector block exercises pad+slice."""
        from prompt_tts_tpu.codec.rvq import rvq_encode
        from prompt_tts_tpu.ops.pallas.rvq import rvq_encode_fused
        rng = np.random.default_rng(1)
        cb = jnp.asarray(rng.normal(size=(3, 32, 16)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(2, 300, 16)).astype(np.float32))
        ref = rvq_encode(x, cb)
        out = rvq_encode_fused(x, cb, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


class TestFusedResnet:
    """ops/pallas/resnet.py — a measured-and-not-dispatched experiment;
    the kernel must still equal the flax ResnetBlock1D exactly enough
    (f32) so the scoreboard comparison stays meaningful."""

    @pytest.mark.parametrize("cin,cout", [(32, 32), (64, 32)])
    def test_matches_flax_block_interpret(self, cin, cout):
        from jax.experimental.pallas import tpu as pltpu
        from prompt_tts_tpu.models.unet1d import ResnetBlock1D
        from prompt_tts_tpu.ops.pallas.resnet import fused_resnet_block

        key = jax.random.PRNGKey(0)
        B, T, groups = 2, 48, 8
        x = jax.random.normal(key, (B, T, cin))
        temb = jax.random.normal(jax.random.PRNGKey(1), (B, 16))
        m = ResnetBlock1D(out_channels=cout, groups=groups)
        p = m.init(key, x, temb)["params"]
        ref = m.apply({"params": p}, x, temb)
        tp = (jax.nn.silu(temb) @ p["time_emb_proj"]["kernel"]
              + p["time_emb_proj"]["bias"])
        kw = {}
        if cin != cout:
            kw = dict(shortcut_w=p["conv_shortcut"]["conv"]["kernel"][0],
                      shortcut_b=p["conv_shortcut"]["conv"]["bias"])
        with pltpu.force_tpu_interpret_mode():
            out = fused_resnet_block(
                x, tp,
                p["norm1"]["norm"]["scale"], p["norm1"]["norm"]["bias"],
                p["conv1"]["conv"]["kernel"], p["conv1"]["conv"]["bias"],
                p["norm2"]["norm"]["scale"], p["norm2"]["norm"]["bias"],
                p["conv2"]["conv"]["kernel"], p["conv2"]["conv"]["bias"],
                groups=groups, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)
