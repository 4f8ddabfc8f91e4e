"""Batch-1 single-utterance latency decomposition on real TPU.

Chained-diff timing of the full synthesis device program at batch 1 for
DDIM-50 / DPM-25 / DPM-20, with the folded decoder tail active
(pipeline.codec_decode default).  VERDICT round-2 target: <35 ms device.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/abl_batch1.py
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.pipeline import Synthesizer

TEXT = ["Printing, in the only sense with which we are at present "
        "concerned."]


def chain_s(fn, args, iters, trials=3):
    def run(*a):
        def body(c, _):
            z = (c * 1e-38).astype(jnp.int32)
            out = fn(a[0], a[1], a[2] * c, a[3] + z, a[4] + z)
            w = out[0] if isinstance(out, tuple) else out
            return 1.0 + jnp.mean(w).astype(jnp.float32) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    jfn = jax.jit(run)
    float(jfn(*args))
    best = float("inf")
    for trial in range(trials):
        a = list(args)
        a[2] = a[2] * (1.0 + 1e-6 * (trial + 1))
        t0 = time.perf_counter()
        float(jfn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    for sampler, steps in (("dpm", 25), ("dpm", 20), ("ddim", 50)):
        synth = Synthesizer(num_inference_steps=steps, sampler=sampler)
        ids, mask = synth.tokenizer.encode_batch(TEXT)
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        x_T = jax.random.normal(
            jax.random.PRNGKey(0),
            (1, synth.config.model.sample_size,
             synth.config.model.in_channels))
        args = (synth.model_params, synth.codec_params, x_T, ids, mask)
        k = 2
        t1 = chain_s(synth._synthesize_device, args, k)
        t2 = chain_s(synth._synthesize_device, args, 2 * k)
        ms = (t2 - t1) / k * 1e3
        print(f"{sampler}-{steps:2d}  {ms:7.2f} ms/utt (batch 1, "
              f"{12.0 / (ms / 1e3):.0f}x RT)", flush=True)


if __name__ == "__main__":
    main()
