"""Prompt-conditioned (multi-speaker) flagship synthesis RTF on real TPU.

Chained-difference methodology (tools/abl_unet.py).  Covers the second
model family end-to-end on hardware: text + 3 s reference-audio prompt
-> 24 kHz wav, batch 8, 50-step DDIM, bf16.

Run: python -u tools/abl_prompted.py
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import Config, ModelConfig
from prompt_tts_tpu.pipeline import Synthesizer

TEXTS = ["The quick brown fox jumps over the lazy dog."] * 8


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = Config(model=ModelConfig(prompt_conditioning=True))
    synth = Synthesizer(config=cfg, num_inference_steps=50)
    ids, mask = synth.tokenizer.encode_batch(TEXTS)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    mcfg = cfg.model
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (8, mcfg.sample_size, mcfg.in_channels))
    prompt = jax.random.uniform(jax.random.PRNGKey(1),
                                (8, mcfg.prompt_frames, mcfg.in_channels),
                                minval=-1.0, maxval=1.0)

    def chain(iters):
        @jax.jit
        def run(mp, cp, x0, pr):
            def body(c, _):
                wav, _codes = synth._synthesize_device(
                    mp, cp, x0 * c, ids, mask, prompt=pr)
                return 1.0 + jnp.mean(wav).astype(jnp.float32) * 1e-20, None

            c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
            return c

        float(run(synth.model_params, synth.codec_params, x, prompt))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(synth.model_params, synth.codec_params, x, prompt))
            best = min(best, time.perf_counter() - t0)
        return best

    per_iter = (chain(4) - chain(2)) / 2
    rtf = 96.0 / per_iter
    print(f"prompted synthesis ddim-50 batch-8: {per_iter*1e3:.1f} ms "
          f"({rtf:.1f}x RT)", flush=True)


if __name__ == "__main__":
    main()
