"""Codec golden tests vs transformers.EncodecModel (same architecture and
weight layout as the facebook encodec package the reference uses).

BASELINE.md parity bar: bit-exact RVQ indices and near-exact decode.
Weights are randomly initialized (no network access for the pretrained
checkpoint); numerics are weight-independent.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from prompt_tts_tpu.codec import EncodecCodec, convert_torch_encodec
from prompt_tts_tpu.codec.encodec import EncodecConfig24k, EncodecEncoder
from prompt_tts_tpu.codec.rvq import rvq_decode, rvq_encode


@pytest.fixture(scope="module")
def torch_model():
    from transformers import EncodecConfig, EncodecModel
    torch.manual_seed(0)
    model = EncodecModel(EncodecConfig()).eval()  # 24 kHz defaults
    with torch.no_grad():
        for layer in model.quantizer.layers:
            layer.codebook.embed.normal_()
    return model


@pytest.fixture(scope="module")
def jax_params(torch_model):
    return convert_torch_encodec(torch_model)


@pytest.fixture(scope="module")
def codec():
    return EncodecCodec()


class TestStructuralConstants:
    def test_hop_and_frame_rate(self):
        cfg = EncodecConfig24k()
        assert cfg.hop_length == 320
        assert cfg.frame_rate == 75

    def test_bandwidth_to_n_q(self):
        cfg = EncodecConfig24k()
        assert cfg.num_quantizers_for_bandwidth(6.0) == 8
        assert cfg.num_quantizers_for_bandwidth(1.5) == 2
        assert cfg.num_quantizers_for_bandwidth(24.0) == 32


class TestEncoderParity:
    @pytest.mark.parametrize("samples", [24000, 23999, 3200])
    def test_latents_match(self, torch_model, jax_params, samples):
        torch.manual_seed(1)
        wav = torch.randn(2, 1, samples)
        with torch.no_grad():
            temb = torch_model.encoder(wav).numpy()  # [B, 128, F]
        jemb = EncodecEncoder().apply(
            {"params": jax_params["params"]["encoder"]},
            jnp.asarray(wav[:, 0, :, None].numpy()))
        np.testing.assert_allclose(
            np.asarray(jemb).transpose(0, 2, 1), temb, atol=1e-5)


class TestRVQParity:
    def test_bit_exact_codes(self, torch_model, jax_params, codec):
        torch.manual_seed(2)
        wav = torch.randn(2, 1, 24000)
        with torch.no_grad():
            tcodes = torch_model.encode(wav, bandwidth=6.0).audio_codes[0]
        jcodes = codec.apply(jax_params, jnp.asarray(wav[:, 0].numpy()),
                             6.0, method=EncodecCodec.encode)
        assert jcodes.shape == (2, 8, 75)
        # the BASELINE.md north-star: bit-exact indices
        np.testing.assert_array_equal(np.asarray(jcodes), tcodes.numpy())

    def test_rvq_exact_recovery(self):
        """Vectors built as sums of codebook entries (layer-0 entry large,
        layer-1 entry small) must round-trip to zero residual with their
        exact indices recovered."""
        rng = np.random.default_rng(0)
        cb0 = rng.normal(size=(16, 4)).astype(np.float32) * 10.0
        cb1 = rng.normal(size=(16, 4)).astype(np.float32) * 0.1
        cb = jnp.asarray(np.stack([cb0, cb1]))
        idx0 = rng.integers(0, 16, size=(1, 5))
        idx1 = rng.integers(0, 16, size=(1, 5))
        x = jnp.asarray(cb0[idx0] + cb1[idx1])
        codes = rvq_encode(x, cb)
        np.testing.assert_array_equal(np.asarray(codes[:, 0]), idx0)
        np.testing.assert_array_equal(np.asarray(codes[:, 1]), idx1)
        xq = rvq_decode(codes, cb)
        np.testing.assert_allclose(np.asarray(xq), np.asarray(x), atol=1e-5)


class TestDecoderParity:
    def test_decode_matches(self, torch_model, jax_params, codec):
        torch.manual_seed(3)
        codes = torch.randint(0, 1024, (1, 2, 8, 75))
        with torch.no_grad():
            twav = torch_model.decode(codes, [None]).audio_values
        jwav = codec.apply(jax_params, jnp.asarray(codes[0].numpy()),
                           method=EncodecCodec.decode)
        assert np.asarray(jwav).shape == (2, 24000)
        np.testing.assert_allclose(
            np.asarray(jwav), twav[:, 0].numpy(), atol=1e-5)

    def test_full_roundtrip_matches(self, torch_model, jax_params, codec):
        torch.manual_seed(4)
        wav = torch.randn(1, 1, 12000)
        with torch.no_grad():
            enc = torch_model.encode(wav, bandwidth=6.0)
            twav = torch_model.decode(enc.audio_codes,
                                      enc.audio_scales).audio_values
        jwav = codec.apply(jax_params, jnp.asarray(wav[:, 0].numpy()), 6.0)
        n = min(twav.shape[-1], np.asarray(jwav).shape[-1])
        np.testing.assert_allclose(
            np.asarray(jwav)[:, :n], twav[:, 0, :n].numpy(), atol=1e-5)


class TestBandwidthTiers:
    @pytest.mark.parametrize("bw,n_q", [(1.5, 2), (3.0, 4), (12.0, 16),
                                        (24.0, 32)])
    def test_bit_exact_codes_at_bandwidth(self, torch_model, jax_params,
                                          codec, bw, n_q):
        """Every EnCodec bandwidth tier must select the right number of
        quantizers and stay bit-exact (reference uses 6.0 only, but the
        codec supports the full ladder — generate_code.py:14)."""
        torch.manual_seed(int(bw * 10))
        wav = torch.randn(1, 1, 6400)
        with torch.no_grad():
            tcodes = torch_model.encode(wav, bandwidth=bw).audio_codes[0]
        jcodes = codec.apply(jax_params, jnp.asarray(wav[:, 0].numpy()),
                             bw, method=EncodecCodec.encode)
        assert jcodes.shape[1] == n_q
        np.testing.assert_array_equal(np.asarray(jcodes), tcodes.numpy())

    def test_decode_with_fewer_quantizers(self, torch_model, jax_params,
                                          codec):
        torch.manual_seed(9)
        codes = torch.randint(0, 1024, (1, 1, 2, 20))
        with torch.no_grad():
            twav = torch_model.decode(codes, [None]).audio_values
        jwav = codec.apply(jax_params, jnp.asarray(codes[0].numpy()),
                           method=EncodecCodec.decode)
        np.testing.assert_allclose(np.asarray(jwav), twav[:, 0].numpy(),
                                   atol=1e-5)
