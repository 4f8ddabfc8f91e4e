"""Codec decode timing breakdown on the real TPU.

Same methodology as tools/abl_unet.py: K-vs-2K chained scans with a host
read (through the axon relay ``block_until_ready`` returns without
waiting; the fixed ~25-30 ms RPC+read floor cancels in the difference).

Measures:
  - full codec decode (RVQ dequant + SEANet decoder) at [8, 8, 900]
  - the 2-layer LSTM block alone at the decoder operating point [8,900,512]
  - one LSTM recurrence: lax.scan vs the Pallas kernels (f32 and
    transposed-layout variants)

Run: python -u tools/abl_codec.py   (background, 1500s+ budget)
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.codec import EncodecCodec
from prompt_tts_tpu.codec.layers import CodecLSTM

B, T, H = 8, 900, 512
K = 10


def chain_time_s(fn, *args, iters, trials=3):
    def run(*a):
        def body(c, _):
            y = fn(a[0] * c, *a[1:])
            return 1.0 + jnp.mean(y).astype(jnp.float32) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    jfn = jax.jit(run)
    float(jfn(*args))  # compile + warmup
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(jfn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter_us(fn, *args, iters=K):
    t1 = chain_time_s(fn, *args, iters=iters)
    t2 = chain_time_s(fn, *args, iters=2 * iters)
    return (t2 - t1) / iters * 1e6


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)

    # full decode at the flagship shape (scale latents, not int codes)
    codec = EncodecCodec()
    codes = jax.random.randint(key, (B, 8, T), 0, 1024)
    params = jax.jit(
        lambda r: codec.init(r, jnp.zeros((1, 3200)), 6.0))(key)

    def decode_fn(scale, p, c):
        # the decode must DEPEND on the chained carry or XLA hoists it out
        # of the timing loop: perturb the codes by a runtime-zero int
        zero = jnp.int32(scale[0, 0] * 1e-38)  # runtime 0, not foldable
        wav = codec.apply(p, jnp.clip(c + zero, 0, 1023),
                          method=EncodecCodec.decode)
        return wav

    us = per_iter_us(lambda s, p, c: decode_fn(s, p, c),
                     jnp.ones((1, 1)), params, codes, iters=4)
    print(f"full decode [8,8,900]: {us / 1e3:.2f} ms", flush=True)

    # the decoder LSTM block alone (2 layers + residual) at [B, 900, 512]
    x = jax.random.normal(key, (B, T, H), jnp.float32)
    lstm = CodecLSTM(hidden=H)
    lp = lstm.init(key, x)
    us = per_iter_us(lambda xx, p: lstm.apply(p, xx), x, lp)
    print(f"CodecLSTM 2-layer scan [8,900,512]: {us / 1e3:.2f} ms",
          flush=True)

    # single recurrence: scan vs pallas kernels, f32
    w_hh = jax.random.normal(key, (H, 4 * H), jnp.float32) * 0.02
    xp = jax.random.normal(key, (T, B, 4 * H), jnp.float32)

    def scan_rec(xp, w):
        def step(carry, g):
            h, c = carry
            gates = g + h @ w
            i, f, gg, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((B, H), w.dtype), jnp.zeros((B, H), w.dtype))
        _, hs = jax.lax.scan(step, init, xp, unroll=8)
        return hs

    us = per_iter_us(lambda xx, ww: scan_rec(xx, ww), xp, w_hh)
    print(f"recurrence scan f32 [900 steps]: {us / 1e3:.2f} ms "
          f"({us / T:.2f} us/step)", flush=True)

    try:
        from prompt_tts_tpu.ops.pallas.lstm import lstm_recurrence
        us = per_iter_us(lambda xx, ww: lstm_recurrence(xx, ww), xp, w_hh)
        print(f"recurrence pallas v1 [900 steps]: {us / 1e3:.2f} ms "
              f"({us / T:.2f} us/step)", flush=True)
    except Exception as e:
        print("pallas v1 failed:", e, flush=True)

    try:
        from prompt_tts_tpu.ops.pallas.lstm import lstm_recurrence_t
        # same x layout as v1; w_hh in torch layout [4H, H]
        us = per_iter_us(
            lambda xx, ww: lstm_recurrence_t(xx, ww), xp, w_hh.T)
        print(f"recurrence pallas vT [900 steps]: {us / 1e3:.2f} ms "
              f"({us / T:.2f} us/step)", flush=True)
    except Exception as e:
        print("pallas vT failed:", e, flush=True)


if __name__ == "__main__":
    main()
