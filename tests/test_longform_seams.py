"""Long-form seam quality (round-3 verdict #6).

Windows of a long-form synthesis draw INDEPENDENT noise, so a hard
concatenation steps discontinuously at every join — the first thing a
listener hears.  These tests measure that seam (sample-level step +
short-window spectral distance) and certify the two treatments:

* ``crossfade_ms`` — equal-power overlap-add at each join
  (``utils.wav.crossfade_join``),
* ``continuity_prompt`` — the prompt-conditioned family carries each
  window's generated tail codes as the next window's prompt.

The metric-level tests run on deterministic synthetic pieces (where the
seam is exactly known); the pipeline tests run the tiny random-weight
model end to end.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from prompt_tts_tpu.config import Config, ModelConfig, TrainConfig
from prompt_tts_tpu.pipeline import Synthesizer
from prompt_tts_tpu.utils.wav import crossfade_join

TINY = ModelConfig(
    block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
    attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
    sample_size=20, layers_per_block=1, unet_num_heads=4)

LONG_TEXT = "Hello there. General synthesis! Another sentence here."


def max_step(wav: np.ndarray) -> float:
    return float(np.abs(np.diff(np.asarray(wav, np.float32))).max())


def spectral_distance(wav: np.ndarray, center: int, win: int = 512):
    """Log-magnitude spectral distance of the ``win``-sample window
    straddling ``center`` vs the mean of its two neighbours — a seam
    that belongs with its surroundings scores ~0."""
    wav = np.asarray(wav, np.float32)
    h = win // 2

    def spec(s):
        seg = wav[s: s + win] * np.hanning(win)
        return np.log(np.abs(np.fft.rfft(seg)) + 1e-6)

    at = spec(center - h)
    near = 0.5 * (spec(center - h - win) + spec(center - h + win))
    return float(np.abs(at - near).mean())


class TestCrossfadeJoin:
    def test_lengths_and_dtype(self):
        a = np.random.default_rng(0).normal(size=1000).astype(np.float32)
        b = np.random.default_rng(1).normal(size=800).astype(np.float32)
        out = crossfade_join([a, b], 200)
        assert out.shape == (1600,)
        assert out.dtype == np.float32
        # n=0 degenerates to plain concatenation
        np.testing.assert_array_equal(crossfade_join([a, b], 0),
                                      np.concatenate([a, b]))
        # untouched regions pass through exactly
        np.testing.assert_array_equal(out[:800], a[:800])
        np.testing.assert_array_equal(out[-600:], b[-600:])

    def test_int16_requantizes(self):
        a = (np.random.default_rng(0).normal(size=500) * 10000).astype(
            np.int16)
        b = (np.random.default_rng(1).normal(size=500) * 10000).astype(
            np.int16)
        out = crossfade_join([a, b], 100)
        assert out.dtype == np.int16
        assert out.shape == (900,)
        # matches the float path within the quantization LSB
        ref = crossfade_join([a.astype(np.float32), b.astype(np.float32)],
                             100)
        assert np.abs(out.astype(np.float32) - ref).max() <= 0.5 + 1e-6

    def test_piece_shorter_than_fade(self):
        a = np.ones(100, np.float32)
        b = np.ones(30, np.float32)
        out = crossfade_join([a, b], 50)  # overlap clamps to 30
        assert out.shape == (100,)
        assert np.isfinite(out).all()

    def test_seam_step_and_spectrum_repaired(self):
        """The defining case: two windows with a DC offset between them.
        The hard join steps by the full offset; the crossfaded join's
        step must drop to the intra-window level, and the short-window
        spectral distance at the seam must shrink."""
        rng = np.random.default_rng(2)
        noise_a = rng.normal(scale=0.01, size=4000).astype(np.float32)
        noise_b = rng.normal(scale=0.01, size=4000).astype(np.float32)
        a = (noise_a + 0.5).astype(np.float32)
        b = (noise_b - 0.5).astype(np.float32)
        intra = max(max_step(a), max_step(b))

        hard = np.concatenate([a, b])
        assert max_step(hard) > 0.9  # the seam dominates

        n = 480  # 20 ms @ 24 kHz
        faded = crossfade_join([a, b], n)
        # seam region = the overlap; steps there must be intra-level.
        # The fade ramps 1.0 of DC offset over 480 samples (~2e-3/sample)
        # on top of the noise's own steps.
        seam = faded[4000 - n - 1: 4000 + 1]
        assert max_step(seam) < intra + 1.2 * (1.0 / n)

        # spectral seam: the window straddling the hard join is an
        # outlier vs its neighbours; crossfading pulls it back in line
        d_hard = spectral_distance(hard, 4000)
        d_fade = spectral_distance(faded, 4000 - n // 2)
        assert d_fade < d_hard

    def test_equal_power_holds_energy_through_overlap(self):
        """Uncorrelated pieces: RMS through the overlap stays ~flat
        (a linear fade would dip ~3 dB at the midpoint)."""
        rng = np.random.default_rng(3)
        a = rng.normal(scale=0.3, size=8000).astype(np.float32)
        b = rng.normal(scale=0.3, size=8000).astype(np.float32)
        n = 2000
        out = crossfade_join([a, b], n)
        mid = out[8000 - n + n // 4: 8000 - n // 4]  # overlap interior
        rms_mid = float(np.sqrt((mid ** 2).mean()))
        rms_ref = float(np.sqrt((a ** 2).mean()))
        assert abs(rms_mid - rms_ref) / rms_ref < 0.15


@pytest.mark.slow
class TestPipelineSeams:
    @pytest.fixture(scope="class")
    def synth(self):
        cfg = Config(model=TINY, train=TrainConfig())
        return Synthesizer(config=cfg, num_inference_steps=2,
                           dtype=jnp.float32)

    def test_crossfade_length_and_seam_metric(self, synth):
        n_chunks = len(synth.split_long_text(LONG_TEXT))
        assert n_chunks >= 2
        window = TINY.sample_size * 320
        fade_ms = 10.0
        n_fade = int(fade_ms * 24)

        hard = synth.synthesize_long(LONG_TEXT, max_batch=2,
                                     trim_threshold_db=None)
        faded = synth.synthesize_long(LONG_TEXT, max_batch=2,
                                      trim_threshold_db=None,
                                      crossfade_ms=fade_ms)
        assert len(hard) == n_chunks * window
        assert len(faded) == n_chunks * window - (n_chunks - 1) * n_fade

        # seam metric: every crossfaded join's local step stays at or
        # below the worst intra-window step (the hard join's step is
        # recorded for the report; with a random-weight codec it may or
        # may not exceed the noise floor, so only the crossfaded bound
        # is asserted)
        intra = max(max_step(hard[j * window + 8: (j + 1) * window - 8])
                    for j in range(n_chunks))
        for j in range(1, n_chunks):
            center = j * window - (2 * j - 1) * n_fade // 2
            seam = faded[max(0, center - n_fade): center + n_fade]
            assert max_step(seam) <= intra * 1.05, j
        print(f"seam steps: hard {max_step(hard):.4f}, intra {intra:.4f}")

    def test_stream_matches_nonstream_crossfade(self, synth):
        faded = synth.synthesize_long(LONG_TEXT, max_batch=1,
                                      trim_threshold_db=None,
                                      crossfade_ms=10.0)
        pieces = list(synth.synthesize_long_stream(
            LONG_TEXT, trim_threshold_db=None, crossfade_ms=10.0))
        np.testing.assert_array_equal(np.concatenate(pieces), faded)

    def test_continuity_prompt_requires_prompted_family(self, synth):
        with pytest.raises(ValueError, match="continuity_prompt"):
            synth.synthesize_long(LONG_TEXT, continuity_prompt=True)
        with pytest.raises(ValueError, match="continuity_prompt"):
            list(synth.synthesize_long_stream(LONG_TEXT,
                                              continuity_prompt=True))


PROMPTED = ModelConfig(
    block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
    attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
    sample_size=20, layers_per_block=1, unet_num_heads=4,
    prompt_conditioning=True, prompt_frames=8, prompt_encoder_layers=1,
    prompt_tokens=4)


@pytest.mark.slow
class TestContinuityPrompt:
    @pytest.fixture(scope="class")
    def synth(self):
        cfg = Config(model=PROMPTED, train=TrainConfig())
        return Synthesizer(config=cfg, num_inference_steps=2,
                           dtype=jnp.float32)

    def test_windows_are_conditioned_on_previous_tails(self, synth):
        prompt = np.random.default_rng(0).integers(
            0, 1024, size=(1, 8, 8), dtype=np.int64)
        # batch-1 baseline: the continuity path runs batch-1, and a
        # batch-2 program differs at f32-reassociation level (~2e-6),
        # which would drown the window-0 bit-identity check below
        base = synth.synthesize_long(LONG_TEXT, max_batch=1,
                                     trim_threshold_db=None,
                                     prompt_codes=prompt)
        cont = synth.synthesize_long(LONG_TEXT, trim_threshold_db=None,
                                     prompt_codes=prompt,
                                     continuity_prompt=True)
        window = PROMPTED.sample_size * 320
        n_chunks = len(synth.split_long_text(LONG_TEXT))
        assert len(cont) == n_chunks * window
        assert np.isfinite(np.asarray(cont, np.float32)).all()
        # window 0 sees the same user prompt and the same seed fold in
        # both modes -> identical; later windows see DIFFERENT prompts
        # (the generated tails), so continuity actually changed the
        # conditioning
        np.testing.assert_array_equal(cont[:window], base[:window])
        assert np.abs(np.asarray(cont[window:], np.float32)
                      - np.asarray(base[window:], np.float32)).max() > 1e-5

    def test_stream_matches_nonstream_continuity(self, synth):
        prompt = np.random.default_rng(1).integers(
            0, 1024, size=(1, 8, 8), dtype=np.int64)
        cont = synth.synthesize_long(LONG_TEXT, trim_threshold_db=None,
                                     prompt_codes=prompt,
                                     continuity_prompt=True)
        pieces = list(synth.synthesize_long_stream(
            LONG_TEXT, trim_threshold_db=None, prompt_codes=prompt,
            continuity_prompt=True))
        np.testing.assert_array_equal(np.concatenate(pieces), cont)
