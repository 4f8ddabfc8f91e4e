"""End-to-end pipeline tests (tiny config on CPU) + wav/resample utils."""

import numpy as np
import pytest

import jax.numpy as jnp

from prompt_tts_tpu.config import Config, ModelConfig, TrainConfig
from prompt_tts_tpu.pipeline import (
    Synthesizer,
    codes_to_latents,
    latents_to_codes,
)
from prompt_tts_tpu.utils.resample import resample
from prompt_tts_tpu.utils.wav import read_wav, write_wav


class TestCodeNormalization:
    def test_roundtrip(self):
        codes = jnp.asarray(
            np.random.default_rng(0).integers(0, 1024, (2, 8, 30)))
        lat = codes_to_latents(codes)
        assert lat.shape == (2, 30, 8)
        assert float(lat.min()) >= -1.0 and float(lat.max()) <= 1.0
        back = latents_to_codes(lat)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))

    def test_clipping(self):
        lat = jnp.full((1, 4, 8), 2.0)  # out of range
        codes = latents_to_codes(lat)
        assert int(codes.max()) == 1023
        codes = latents_to_codes(-lat)
        assert int(codes.min()) == 0


class TestWavIO:
    def test_roundtrip_pcm16(self, tmp_path):
        audio = np.sin(np.linspace(0, 100, 2400)).astype(np.float32) * 0.5
        path = str(tmp_path / "a.wav")
        write_wav(path, audio, 24000)
        back, sr = read_wav(path)
        assert sr == 24000
        np.testing.assert_allclose(back[:, 0], audio, atol=1e-4)


class TestResample:
    def test_tone_preserved(self):
        """A 440 Hz tone resampled 22050 -> 24000 keeps its frequency."""
        sr_in, sr_out = 22050, 24000
        t = np.arange(sr_in) / sr_in
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        out = resample(tone, sr_in, sr_out)
        assert abs(len(out) - sr_out) <= 2
        spec = np.abs(np.fft.rfft(out[1000:-1000]))
        freqs = np.fft.rfftfreq(len(out[1000:-1000]), 1 / sr_out)
        peak = freqs[np.argmax(spec)]
        assert abs(peak - 440) < 2, peak

    def test_identity(self):
        x = np.random.default_rng(0).normal(size=100).astype(np.float32)
        np.testing.assert_array_equal(resample(x, 24000, 24000), x)


@pytest.mark.slow
class TestSynthesizerSmoke:
    def test_text_to_wav_shapes(self):
        cfg = Config(
            model=ModelConfig(
                block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
                attention_head_dim=32, text_encoder_layers=1,
                cmu_seq_len=64, sample_size=40, layers_per_block=1,
                unet_num_heads=4),
            train=TrainConfig(),
        )
        synth = Synthesizer(config=cfg, num_inference_steps=4,
                            dtype=jnp.float32)
        wav, codes = synth.synthesize(
            ["hello world", "printing"], return_codes=True)
        assert wav.shape == (2, 40 * 320)
        assert codes.shape == (2, 8, 40)
        assert codes.min() >= 0 and codes.max() <= 1023
        assert np.isfinite(wav).all()

        # decode_codes path consumes the produced codes
        wav2 = synth.decode_codes(codes)
        np.testing.assert_allclose(wav2, wav, atol=1e-4)

        # encode_audio inverts shape-wise
        codes2 = synth.encode_audio(wav[:, : 10 * 320])
        assert codes2.shape == (2, 8, 10)

        # streaming synthesis: chunks concatenate to the SAME waveform
        # (causal decoder -> prefix decode == prefix of full decode)
        chunks = list(synth.synthesize_stream(
            ["hello world", "printing"], chunk_frames=16))
        assert len(chunks) == 3                      # 16 + 16 + 8 frames
        assert chunks[0].shape == (2, 16 * 320)
        assert chunks[-1].shape == (2, 8 * 320)
        np.testing.assert_allclose(
            np.concatenate(chunks, axis=1), wav, atol=2e-5)

        # device-side PCM16 (the serving wire format): bit-identical to
        # host-side pcm16_bytes of the float wav
        from prompt_tts_tpu.utils.wav import pcm16_bytes
        pcm = np.asarray(synth.synthesize_async(
            ["hello world", "printing"], pcm16=True))
        assert pcm.dtype == np.int16
        assert pcm.astype("<i2", copy=False).tobytes() == pcm16_bytes(wav)
        stream_pcm = np.concatenate(
            list(synth.synthesize_stream(
                ["hello world", "printing"], chunk_frames=16,
                pcm16=True)), axis=1)
        assert stream_pcm.dtype == np.int16
        full_f32 = np.concatenate(chunks, axis=1)
        assert (stream_pcm.astype("<i2", copy=False).tobytes()
                == pcm16_bytes(full_f32))


class TestLongFormSynthesis:
    def test_split_packs_sentences_within_token_limit(self):
        cfg = Config(
            model=ModelConfig(
                block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
                attention_head_dim=32, text_encoder_layers=1,
                cmu_seq_len=64, sample_size=40, layers_per_block=1,
                unet_num_heads=4),
            train=TrainConfig(),
        )
        synth = Synthesizer(config=cfg, num_inference_steps=2,
                            dtype=jnp.float32)
        text = ("The first sentence. A second one follows! "
                "Then a third; and a fourth? Finally the fifth.")
        chunks = synth.split_long_text(text)
        assert len(chunks) >= 2  # 64-token limit forces several chunks
        # every chunk fits the model's token window
        for c in chunks:
            assert len(synth.tokenizer.ids(c)) <= cfg.model.cmu_seq_len
        # no text lost (modulo injected whitespace)
        assert " ".join(chunks).split() == text.split()

    def test_overlong_single_sentence_is_hard_split(self):
        cfg = Config(
            model=ModelConfig(
                block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
                attention_head_dim=32, text_encoder_layers=1,
                cmu_seq_len=64, sample_size=40, layers_per_block=1,
                unet_num_heads=4),
            train=TrainConfig(),
        )
        synth = Synthesizer(config=cfg, num_inference_steps=2,
                            dtype=jnp.float32)
        text = "word " * 60  # one "sentence", way past 64 tokens
        chunks = synth.split_long_text(text)
        assert len(chunks) > 1
        for c in chunks:
            assert len(synth.tokenizer.ids(c)) <= cfg.model.cmu_seq_len

    @pytest.mark.slow
    def test_synthesize_long_end_to_end(self):
        cfg = Config(
            model=ModelConfig(
                block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
                attention_head_dim=32, text_encoder_layers=1,
                cmu_seq_len=32, sample_size=20, layers_per_block=1,
                unet_num_heads=4),
            train=TrainConfig(),
        )
        synth = Synthesizer(config=cfg, num_inference_steps=2,
                            dtype=jnp.float32)
        text = "Hello there. General synthesis! Another sentence here."
        wav = synth.synthesize_long(text, max_batch=2,
                                    trim_threshold_db=None)
        n_chunks = len(synth.split_long_text(text))
        assert wav.ndim == 1
        # untrimmed: exactly n_chunks full windows
        window = cfg.model.sample_size * 320
        assert len(wav) == n_chunks * window
        assert np.isfinite(wav).all()

        # pcm16 long path: bit-identical to host-quantizing the f32 path
        from prompt_tts_tpu.utils.wav import pcm16_bytes
        pcm = synth.synthesize_long(text, max_batch=2,
                                    trim_threshold_db=None, pcm16=True)
        assert pcm.dtype == np.int16
        assert pcm.astype("<i2", copy=False).tobytes() == pcm16_bytes(wav)

        # pad_groups: a single partial group padded up to max_batch (the
        # serve path reusing its warmed batch program) still returns
        # exactly the real windows
        wav_pad = synth.synthesize_long(text, max_batch=4,
                                        trim_threshold_db=None,
                                        pad_groups=True)
        assert len(wav_pad) == n_chunks * window

        # streaming long-form: one piece per window; untrimmed pieces are
        # full windows, trimmed pieces never exceed one
        pieces = list(synth.synthesize_long_stream(
            text, trim_threshold_db=None, pcm16=True))
        assert len(pieces) == n_chunks
        assert all(p.dtype == np.int16 and p.shape == (window,)
                   for p in pieces)
        trimmed = list(synth.synthesize_long_stream(text))
        assert len(trimmed) == n_chunks
        assert all(p.ndim == 1 and len(p) <= window for p in trimmed)
