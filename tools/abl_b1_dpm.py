import time
import jax, jax.numpy as jnp
from prompt_tts_tpu.pipeline import Synthesizer

print("backend:", jax.default_backend(), flush=True)

def measure(sampler, steps, bs):
    synth = Synthesizer(num_inference_steps=steps, sampler=sampler)
    texts = ["The quick brown fox jumps over the lazy dog."] * bs
    ids, mask = synth.tokenizer.encode_batch(texts)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    mcfg = synth.config.model
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (bs, mcfg.sample_size, mcfg.in_channels))
    def chain(n):
        @jax.jit
        def run(mp, cp, x0):
            def body(c, _):
                w, _ = synth._synthesize_device(mp, cp, x0 * c, ids, mask)
                return 1.0 + jnp.mean(w).astype(jnp.float32) * 1e-20, None
            c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=n)
            return c
        float(run(synth.model_params, synth.codec_params, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(synth.model_params, synth.codec_params, x))
            best = min(best, time.perf_counter() - t0)
        return best
    return (chain(6) - chain(3)) / 3

s = measure("dpm", 25, 1)
print(f"batch-1 dpm-25 device latency: {s*1e3:.1f} ms "
      f"({12.0/s:.1f}x RT)", flush=True)
