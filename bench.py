"""Headline benchmark: end-to-end text->speech RTF on one chip.

Prints ONE JSON line:
  {"metric": "rtf_text_to_wav", "value": N, "unit": "x_realtime",
   "vs_baseline": N}

Measures the BASELINE.json north-star config: batch-8, 50-step DDIM over
[8, 900, 8] code latents with the flagship 245M-param denoiser (bf16) and
EnCodec decode to 24 kHz audio, all in ONE jitted device program
(prompt_tts_tpu.pipeline.Synthesizer).  96 s of audio per batch.
``vs_baseline`` is value / 50 — the >=50x real-time-per-chip target
(BASELINE.md; the reference itself publishes no benchmark numbers).
"""

import json
import time

BATCH = 8
STEPS = 50
AUDIO_SECONDS_PER_ITEM = 12.0  # 900 frames @ 75 Hz
TARGET_RTF = 50.0

TEXTS = [
    "Printing, in the only sense with which we are at present concerned.",
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "In being comparatively modern, the art of printing differs from most.",
    "The invention of movable metal letters in the fifteenth century.",
    "May justly be considered as the invention of the art of printing.",
    "Speech synthesis has advanced rapidly in the last decade of research.",
    "Neural codecs compress audio into discrete tokens at low bitrates.",
    "Latent diffusion models denoise those tokens conditioned on text.",
]


def main():
    import jax
    import jax.numpy as jnp

    from prompt_tts_tpu.pipeline import Synthesizer

    synth = Synthesizer(num_inference_steps=STEPS)

    # Time the DEVICE program (tokenize once, outputs stay on device and
    # are blocked on): host-pulling 9 MB of audio through this dev setup's
    # TPU tunnel per iteration adds +-15% noise that has nothing to do
    # with synthesis throughput. One full host round-trip validates the
    # output below.
    ids, mask = synth.tokenizer.encode_batch(TEXTS)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    x_Ts = [jax.random.normal(
        jax.random.PRNGKey(i),
        (BATCH, synth.config.model.sample_size,
         synth.config.model.in_channels)) for i in range(6)]

    wav, codes = synth._synth_fn(synth.model_params, synth.codec_params,
                                 x_Ts[0], ids, mask)
    jax.block_until_ready(wav)  # compile + warmup

    n_iters = 5
    t_start = time.perf_counter()
    for i in range(n_iters):
        wav, _ = synth._synth_fn(synth.model_params, synth.codec_params,
                                 x_Ts[i + 1], ids, mask)
    jax.block_until_ready(wav)
    elapsed = (time.perf_counter() - t_start) / n_iters

    audio_seconds = BATCH * AUDIO_SECONDS_PER_ITEM
    rtf = audio_seconds / elapsed
    import numpy as np
    host_wav = np.asarray(wav)
    assert host_wav.shape == (BATCH, 288000), host_wav.shape
    assert np.isfinite(host_wav).all()

    # Frozen methodology (round 1 changed definitions mid-round; keep BOTH
    # from now on so the cross-round series stays comparable):
    #   value / rtf_device_program — device program timed with inputs
    #     pre-staged, outputs blocked on device (the throughput number);
    #   rtf_with_host_transfers — every call pulls the 9 MB audio batch to
    #     the host through the tunnel (the strict serving-style number).
    t_start = time.perf_counter()
    for i in range(n_iters):
        wav, _ = synth._synth_fn(synth.model_params, synth.codec_params,
                                 x_Ts[i + 1], ids, mask)
        np.asarray(wav)
    elapsed_xfer = (time.perf_counter() - t_start) / n_iters
    rtf_xfer = audio_seconds / elapsed_xfer

    print(json.dumps({
        "metric": "rtf_text_to_wav",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / TARGET_RTF, 3),
        "rtf_device_program": round(rtf, 2),
        "rtf_with_host_transfers": round(rtf_xfer, 2),
    }))


if __name__ == "__main__":
    main()
