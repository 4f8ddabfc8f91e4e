"""Utils tests: mel distance, debug guards, CFG loss path, guided sampling."""

import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import Config, ModelConfig, TrainConfig
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.train.step import make_loss_fn
from prompt_tts_tpu.utils.debug import check_finite, finite_or_warn
from prompt_tts_tpu.utils.mel import log_mel, mel_distance, mel_filterbank


class TestMel:
    def test_filterbank_shape_and_coverage(self):
        fb = mel_filterbank(24000, 1024, n_mels=80)
        assert fb.shape == (80, 513)
        # every filter has some mass; band centers increase
        assert (fb.sum(axis=1) > 0).all()

    def test_identical_wavs_zero_distance(self):
        wav = np.sin(np.arange(24000) * 0.01).astype(np.float32)
        assert mel_distance(wav, wav) == 0.0

    def test_different_tones_positive_distance(self):
        t = np.arange(24000) / 24000
        a = np.sin(2 * np.pi * 220 * t).astype(np.float32)
        b = np.sin(2 * np.pi * 880 * t).astype(np.float32)
        d = mel_distance(a, b)
        assert d > 1.0

    def test_small_gain_small_distance(self):
        # tiny gain change -> tiny log-mel distance (log is scale-sensitive
        # but bounded: 2*log(1.01) per bin)
        a = np.sin(np.arange(24000) * 0.05).astype(np.float32)
        d = mel_distance(a, a * 1.01)
        assert d < 0.05, d

    def test_log_mel_shape(self):
        wav = np.zeros(24000, np.float32)
        m = log_mel(wav)
        assert m.shape[1] == 80 and m.shape[0] == 1 + (24000 - 1024) // 256


class TestDebug:
    def test_check_finite_raises_with_path(self):
        tree = {"a": jnp.ones(3), "b": {"c": jnp.array([1.0, np.nan])}}
        with pytest.raises(FloatingPointError, match="b"):
            check_finite(tree)

    def test_check_finite_ok(self):
        check_finite({"a": jnp.ones(3)})

    def test_finite_or_warn(self):
        log = logging.getLogger("t")
        assert finite_or_warn({"loss": 1.0}, 1, log)
        assert not finite_or_warn({"loss": float("nan")}, 1, log)


TINY = ModelConfig(
    block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
    attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
    sample_size=48, layers_per_block=1, unet_num_heads=4)


class TestCFG:
    def test_cond_dropout_changes_loss(self):
        model = TTSSingleSpeaker(TINY)
        B = 4
        batch = {
            "codes": jnp.asarray(
                np.random.default_rng(0).normal(size=(B, 48, 8)),
                jnp.float32),
            "text_ids": jnp.ones((B, 32), jnp.int32),
            "text_mask": jnp.ones((B, 32), jnp.int32),
        }
        params = model.init(jax.random.PRNGKey(0), batch["codes"][:1],
                            jnp.zeros((1,), jnp.int32),
                            batch["text_ids"][:1], batch["text_mask"][:1])
        sched = linear_schedule()
        loss_plain = make_loss_fn(model.apply, sched)
        loss_cfg = make_loss_fn(model.apply, sched, cond_dropout_prob=1.0)
        rng = jax.random.PRNGKey(1)
        a = float(loss_plain(params, batch, rng))
        b = float(loss_cfg(params, batch, rng))
        # prob=1 nulls all conditioning -> different prediction -> loss shifts
        assert a != b
        assert np.isfinite(a) and np.isfinite(b)

    def test_guided_synthesizer_runs(self):
        from prompt_tts_tpu.pipeline import Synthesizer
        cfg = Config(model=ModelConfig(
            block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
            attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=64,
            sample_size=40, layers_per_block=1, unet_num_heads=4))
        synth = Synthesizer(config=cfg, num_inference_steps=2,
                            guidance_scale=3.0, dtype=jnp.float32)
        wav = synth.synthesize(["hello"])
        assert wav.shape == (1, 40 * 320)
        assert np.isfinite(wav).all()

    def test_cond_dropout_nulls_prompt_too(self):
        """Joint conditioning dropout: prompt latents are zeroed with the
        text, so the unconditional branch CFG pairs against at sampling
        (null text + null prompt) is the one seen in training."""
        from prompt_tts_tpu.models import TTSPromptSpeaker
        import dataclasses
        cfg = dataclasses.replace(
            TINY, prompt_conditioning=True, prompt_frames=16,
            block_out_channels=(32, 64), prompt_encoder_layers=1,
            prompt_tokens=8,
            down_block_types=("CrossAttnDownBlock1D", "DownBlock1D"),
            up_block_types=("UpBlock1D", "CrossAttnUpBlock1D"))
        model = TTSPromptSpeaker(cfg)
        B = 4
        rng0 = np.random.default_rng(0)
        batch = {
            "codes": jnp.asarray(rng0.normal(size=(B, 48, 8)), jnp.float32),
            "text_ids": jnp.ones((B, 32), jnp.int32),
            "text_mask": jnp.ones((B, 32), jnp.int32),
            "prompt": jnp.asarray(rng0.normal(size=(B, 16, 8)),
                                  jnp.float32),
        }
        params = model.init(jax.random.PRNGKey(0), batch["codes"][:1],
                            jnp.zeros((1,), jnp.int32),
                            batch["text_ids"][:1], batch["text_mask"][:1],
                            batch["prompt"][:1])
        sched = linear_schedule()
        rng = jax.random.PRNGKey(1)
        loss_drop = float(
            make_loss_fn(model.apply, sched, cond_dropout_prob=1.0)(
                params, batch, rng))
        # prob=1 zeroes ids/mask/prompt -> identical to feeding explicit
        # nulls with no dropout
        null_batch = dict(batch,
                          text_ids=jnp.zeros_like(batch["text_ids"]),
                          text_mask=jnp.zeros_like(batch["text_mask"]),
                          prompt=jnp.zeros_like(batch["prompt"]))
        loss_null = float(
            make_loss_fn(model.apply, sched)(params, null_batch, rng))
        assert np.isclose(loss_drop, loss_null, rtol=1e-6)
        # and differs from the conditioned loss
        loss_cond = float(
            make_loss_fn(model.apply, sched)(params, batch, rng))
        assert loss_cond != loss_drop

    def test_guided_prompted_synthesizer_runs(self):
        from prompt_tts_tpu.pipeline import Synthesizer
        cfg = Config(model=ModelConfig(
            block_out_channels=(32, 64), cross_attention_dim=64,
            attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=64,
            sample_size=40, layers_per_block=1, unet_num_heads=4,
            down_block_types=("CrossAttnDownBlock1D", "DownBlock1D"),
            up_block_types=("UpBlock1D", "CrossAttnUpBlock1D"),
            prompt_conditioning=True, prompt_frames=16,
            prompt_encoder_layers=1, prompt_tokens=8))
        synth = Synthesizer(config=cfg, num_inference_steps=2,
                            guidance_scale=3.0, dtype=jnp.float32)
        prompt_codes = np.zeros((1, 8, 16), np.int32) + 512
        wav = synth.synthesize(["hello"], prompt_codes=prompt_codes)
        assert wav.shape == (1, 40 * 320)
        assert np.isfinite(wav).all()
        # guidance actually changes the output vs scale 1
        synth1 = Synthesizer(config=cfg, num_inference_steps=2,
                             guidance_scale=1.0, dtype=jnp.float32,
                             model_params=synth.model_params,
                             codec_params=synth.codec_params)
        wav1 = synth1.synthesize(["hello"], prompt_codes=prompt_codes)
        assert not np.allclose(wav, wav1)
