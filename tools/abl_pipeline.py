"""Stage decomposition of the jitted synthesis program (real TPU).

Times, with the K-vs-2K chained-difference methodology:
  * one denoise step exactly as the DDIM scan runs it (hoisted cross-kv)
  * the same step WITHOUT the hoist (cross-kv projected in-call)
  * codec decode
  * conditioning (text encode + cross-kv hoist)

Run: python -u tools/abl_pipeline.py
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.pipeline import Synthesizer
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.codec import EncodecCodec

TEXTS = ["The quick brown fox jumps over the lazy dog near the bank."] * 8


def chain_us(fn, *args, iters, trials=3):
    def run(*a):
        def body(c, _):
            y = fn(a[0] * c, *a[1:])
            return 1.0 + jnp.mean(y).astype(jnp.float32) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    jfn = jax.jit(run)
    float(jfn(*args))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter_ms(fn, *args, iters):
    t1 = chain_us(fn, *args, iters=iters)
    t2 = chain_us(fn, *args, iters=2 * iters)
    return (t2 - t1) / iters * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    synth = Synthesizer(num_inference_steps=50)
    mp, cp = synth.model_params, synth.codec_params
    ids, mask = synth.tokenizer.encode_batch(TEXTS)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    mcfg = synth.config.model
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (8, mcfg.sample_size, mcfg.in_channels))
    t = jnp.full((8,), 500, jnp.int32)

    ctx = synth.model.apply(mp, ids, mask,
                            method=TTSSingleSpeaker.encode_text)
    kv = synth._cross_kv(mp, ctx)

    # kv/ctx/params go in as jit ARGUMENTS — closed-over arrays become
    # program constants and the ~150 MB kv dict chokes the remote compile.
    def step_hoisted(xx, mp_, ctx_, kv_):
        return synth.model.apply(mp_, xx, t, ctx_, cross_kv=kv_,
                                 method=TTSSingleSpeaker.denoise)

    def step_inline(xx, mp_, ctx_):
        return synth.model.apply(mp_, xx, t, ctx_,
                                 method=TTSSingleSpeaker.denoise)

    ms = per_iter_ms(step_hoisted, x, mp, ctx, kv, iters=40)
    print(f"denoise step (hoisted kv): {ms:.2f} ms", flush=True)
    ms = per_iter_ms(step_inline, x, mp, ctx, iters=40)
    print(f"denoise step (inline kv):  {ms:.2f} ms", flush=True)

    def cond(ids_f, mp_):
        c = synth.model.apply(mp_, ids_f.astype(jnp.int32), mask,
                              method=TTSSingleSpeaker.encode_text)
        kv2 = synth._cross_kv(mp_, c)
        leaves = jax.tree_util.tree_leaves(kv2)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    ms = per_iter_ms(cond, ids.astype(jnp.float32), mp, iters=20)
    print(f"conditioning (text enc + hoist): {ms:.2f} ms", flush=True)

    codes = jax.random.randint(jax.random.PRNGKey(1), (8, 8, 900), 0, 1024)

    def dec(scale, cp_):
        zero = jnp.int32(scale[0, 0] * 1e-38)
        return synth._codec_fast.apply(cp_, jnp.clip(codes + zero, 0, 1023),
                                       method=EncodecCodec.decode)

    ms = per_iter_ms(dec, jnp.ones((1, 1)), cp, iters=8)
    print(f"codec decode: {ms:.2f} ms", flush=True)

    def full(x0, mp_, cp_):
        wav, _ = synth._synthesize_device(mp_, cp_, x0, ids, mask)
        return wav

    ms = per_iter_ms(full, x, mp, cp, iters=2)
    print(f"full synthesis program: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
