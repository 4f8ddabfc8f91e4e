"""Folded decoder-tail vs stock decode on real TPU (chained-diff timing).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/abl_folded.py
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.codec import EncodecCodec
from prompt_tts_tpu.codec.folded import decode_folded

B, T = 8, 900


def chain_s(fn, params, codes, iters, trials=3):
    def run(p, cc):
        def body(c, _):
            zero = jnp.int32(c * 1e-38)
            y = fn(p, jnp.clip(cc + zero, 0, 1023))
            return 1.0 + jnp.mean(y).astype(jnp.float32) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    jfn = jax.jit(run)
    float(jfn(params, codes))
    best = float("inf")
    for trial in range(trials):
        # roll by trial+1: trial 0 must not repeat the warmup bytes
        # (relay cache — CLAUDE.md)
        cc = jnp.roll(codes, trial + 1, axis=2)
        t0 = time.perf_counter()
        float(jfn(params, cc))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    codec = EncodecCodec(dtype=jnp.float32)
    params = jax.jit(
        lambda r: codec.init(r, jnp.zeros((1, 3200)), 6.0)
    )(jax.random.PRNGKey(1))
    codes = jax.random.randint(jax.random.PRNGKey(2), (B, 8, T), 0, 1024)

    stock = lambda p, c: codec.apply(p, c, method=EncodecCodec.decode)
    folded = lambda p, c: decode_folded(codec, p, c)
    head = lambda p, c: codec.apply(p, c, method=EncodecCodec.decode_head)

    for name, fn in (("stock", stock), ("folded", folded), ("head", head)):
        k = 4
        t1 = chain_s(fn, params, codes, k)
        t2 = chain_s(fn, params, codes, 2 * k)
        ms = (t2 - t1) / k * 1e3
        print(f"{name:8s} {ms:8.2f} ms/decode (batch {B})", flush=True)


if __name__ == "__main__":
    main()
