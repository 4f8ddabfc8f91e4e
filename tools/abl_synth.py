"""End-to-end synthesis A/B on the real TPU: sampler x hoist configs.

Chained-difference methodology (see tools/abl_unet.py).  Produced the
numbers in ARCHITECTURE.md "Where the time actually goes":
ddim-50 hoist on/off 522.7/522.0 ms (hoist end-to-end neutral),
dpm-25 272.1 ms = 352.8x RT.

Run: python -u tools/abl_synth.py
"""

import time, os
import jax, jax.numpy as jnp

def per_ms(make_fn, iters, trials=3):
    def chain(n):
        fn = make_fn(n)
        float(fn())
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter(); float(fn())
            best = min(best, time.perf_counter() - t0)
        return best
    return (chain(2 * iters) - chain(iters)) / iters * 1e3

def synth_timer(sampler, steps, hoist):
    os.environ["PROMPT_TTS_HOIST"] = "1" if hoist else "0"
    from prompt_tts_tpu.pipeline import Synthesizer
    synth = Synthesizer(num_inference_steps=steps, sampler=sampler)
    TEXTS = ["The quick brown fox jumps over the lazy dog."] * 8
    ids, mask = synth.tokenizer.encode_batch(TEXTS)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    mcfg = synth.config.model
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (8, mcfg.sample_size, mcfg.in_channels))
    def make(n):
        @jax.jit
        def run(mp, cp, x0):
            def body(c, _):
                w, _codes = synth._synthesize_device(mp, cp, x0 * c, ids, mask)
                return 1.0 + jnp.mean(w).astype(jnp.float32) * 1e-20, None
            c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=n)
            return c
        return lambda: run(synth.model_params, synth.codec_params, x)
    return per_ms(make, iters=2)

print("backend:", jax.default_backend(), flush=True)
for sampler, steps, hoist in [("ddim", 50, True), ("ddim", 50, False),
                              ("dpm", 25, True)]:
    ms = synth_timer(sampler, steps, hoist)
    rtf = 96.0 / (ms / 1e3)
    print(f"synthesis {sampler}-{steps} hoist={hoist}: {ms:.1f} ms "
          f"({rtf:.1f}x RT)", flush=True)
