"""Per-stage timing of the EnCodec SEANet decoder (real TPU).

Chained-difference methodology (see tools/abl_unet.py).  Each row times
one decoder stage at its true operating point, f32, batch 8, so the
22.7 ms decode budget can be attributed before optimizing anything.

Run: python -u tools/abl_decoder.py
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.codec.layers import (CodecConv1d, CodecConvTranspose1d,
                                         CodecLSTM, CodecResnetBlock)

B = 8


def chain_s(fn, params, x, iters, trials=3):
    def run(p, xx):
        def body(c, _):
            y = fn(p, xx * c)
            return 1.0 + jnp.mean(y).astype(jnp.float32) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    jfn = jax.jit(run)
    float(jfn(params, x))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(jfn(params, x))
        best = min(best, time.perf_counter() - t0)
    return best


def per_ms(mod, x, iters):
    params = mod.init(jax.random.PRNGKey(0), x)
    t1 = chain_s(lambda p, xx: mod.apply(p, xx), params, x, iters)
    t2 = chain_s(lambda p, xx: mod.apply(p, xx), params, x, 2 * iters)
    return (t2 - t1) / iters * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    stages = [
        ("conv_in 128->512 k7 @900", CodecConv1d(512, 7), (900, 128), 40),
        ("lstm 2x512 @900", CodecLSTM(512), (900, 512), 20),
        ("tconv 512->256 k16 s8 @900", CodecConvTranspose1d(256, 16, 8),
         (900, 512), 40),
        ("resnet 256 @7200", CodecResnetBlock(256), (7200, 256), 40),
        ("tconv 256->128 k10 s5 @7200", CodecConvTranspose1d(128, 10, 5),
         (7200, 256), 40),
        ("resnet 128 @36000", CodecResnetBlock(128), (36000, 128), 40),
        ("tconv 128->64 k8 s4 @36000", CodecConvTranspose1d(64, 8, 4),
         (36000, 128), 40),
        ("resnet 64 @144000", CodecResnetBlock(64), (144000, 64), 20),
        ("tconv 64->32 k4 s2 @144000", CodecConvTranspose1d(32, 4, 2),
         (144000, 64), 20),
        ("resnet 32 @288000", CodecResnetBlock(32), (288000, 32), 20),
        ("conv_out 32->1 k7 @288000", CodecConv1d(1, 7), (288000, 32), 20),
    ]
    total = 0.0
    for name, mod, (T, C), iters in stages:
        x = jax.random.normal(key, (B, T, C), jnp.float32)
        ms = per_ms(mod, x, iters)
        total += ms
        print(f"{name:32s}: {ms:7.2f} ms", flush=True)
    print(f"{'SUM of stages':32s}: {total:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
