"""Does the denoise scan re-read f32 params every step, or does XLA hoist
the f32->bf16 casts?

The flagship model computes in bf16 but stores params f32 (flax
param_dtype).  Inside the 50-step DDIM ``lax.scan`` the casts are
loop-invariant; if XLA hoists them, weight traffic is ~490 MB/step (bf16)
and pre-casting can't help.  If it does NOT hoist (a hoisted cast would
materialize a second full weight copy), every step reads ~980 MB f32 and
pre-casting params to bf16 halves the dominant batch-1 traffic — with
BIT-IDENTICAL numerics wherever apply casts to bf16 anyway.

A/B: per-step time of a chained batch-1 (and batch-8) denoise step with
(a) f32-stored params vs (b) the same params pre-cast to bf16 on device.

Chained-difference methodology (CLAUDE.md): carry-dependent inputs,
per-trial perturbation, K-vs-2K difference, min of 3.

Run: python -u tools/abl_param_cast.py   (background, 1500s+)
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import Config
from prompt_tts_tpu.models import TTSSingleSpeaker

print("backend:", jax.default_backend(), flush=True)
cfg = Config()
model = TTSSingleSpeaker(cfg.model, dtype=jnp.bfloat16)

B_LIST = (1, 8)
mcfg = cfg.model
ids0 = jnp.zeros((1, mcfg.cmu_seq_len), jnp.int32)
params = jax.jit(model.init)(
    jax.random.PRNGKey(0),
    jnp.zeros((1, mcfg.sample_size, mcfg.in_channels)),
    jnp.zeros((1,), jnp.int32), ids0, jnp.ones_like(ids0))

n_bytes = sum(x.size * x.dtype.itemsize
              for x in jax.tree.leaves(params))
print(f"param bytes f32: {n_bytes/1e6:.0f} MB", flush=True)

params_bf16 = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
    params)


def measure(p, B, iters=8, trials=3):
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (B, mcfg.sample_size, mcfg.in_channels))
    ids = jnp.zeros((B, mcfg.cmu_seq_len), jnp.int32)
    mask = jnp.ones((B, mcfg.cmu_seq_len), jnp.int32)

    def run(p_, x_, ids_, mask_, n):
        def body(c, i):
            z = (c * 1e-38).astype(jnp.int32)  # runtime zero via carry
            t = jnp.full((B,), 500, jnp.int32) + z
            eps = model.apply(p_, x_ * c, t, ids_ + z, mask_ + z)
            return 1.0 + jnp.mean(eps).astype(jnp.float32) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(1.0), jnp.arange(n))
        return c

    import functools
    def timed(n):
        fn = jax.jit(functools.partial(run, n=n))
        float(fn(p, x, ids, mask))
        best = float("inf")
        for trial in range(trials):
            x0 = x * (1.0 + 1e-6 * (trial + 1))
            t0 = time.perf_counter()
            float(fn(p, x0, ids, mask))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(2 * iters) - timed(iters)) / iters


for B in B_LIST:
    a = measure(params, B)
    b = measure(params_bf16, B)
    print(f"B={B}: f32-stored {a*1e3:.2f} ms/step | bf16-stored "
          f"{b*1e3:.2f} ms/step | delta {100*(a-b)/a:+.1f}%", flush=True)
