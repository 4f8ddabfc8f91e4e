"""Codec decode timing breakdown on the real TPU (scan-based methodology).

Measures, with K chained iterations inside one jitted program:
  - full codec decode (RVQ dequant + SEANet decoder) at [8, 8, 900]
  - the 2-layer LSTM alone at its decoder operating point [8, 113?, ...]
    (EnCodec decoder LSTM runs at the latent rate: T=900, C=512)
  - one LSTM layer via lax.scan vs the Pallas kernel
  - bf16-weight recurrence variant (numerics probe for a fast path)

Run: python -u tools/abl_codec.py   (background, 1500s+ budget)
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.codec import EncodecCodec
from prompt_tts_tpu.codec.layers import CodecLSTM

B, T, H = 8, 900, 512
K = 20


def timed(run, iters):
    out = run()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6


def chain_time_us(apply_fn, params, x, iters=K):
    def body(carry, _):
        c = carry
        y = apply_fn(params, x * c)
        return 1.0 + jnp.mean(y).astype(jnp.float32) * 1e-20, None

    @jax.jit
    def run():
        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    return timed(run, iters)


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)

    # full decode at the flagship shape
    codec = EncodecCodec()
    codes = jax.random.randint(key, (B, 8, T), 0, 1024)
    params = jax.jit(
        lambda r: codec.init(r, jnp.zeros((1, 3200)), 6.0))(key)

    def body(carry, _):
        wav = codec.apply(params, codes, method=EncodecCodec.decode)
        return carry + jnp.mean(wav).astype(jnp.float32) * 1e-20, None

    @jax.jit
    def run_decode():
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=5)
        return c

    us = timed(run_decode, 5)
    print(f"full decode [8,8,900]: {us / 1e3:.2f} ms", flush=True)

    # the decoder LSTM block alone (2 layers + residual) at [B, 900, 512]
    x = jax.random.normal(key, (B, T, H), jnp.float32)
    lstm = CodecLSTM(hidden=H)
    lp = lstm.init(key, x)
    us = chain_time_us(lambda p, xx: lstm.apply(p, xx), lp, x)
    print(f"CodecLSTM 2-layer scan [8,900,512]: {us / 1e3:.2f} ms",
          flush=True)

    # single recurrence: scan vs pallas kernel, f32
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

    for name, fn in [
        ("scan f32", lambda xx, ww: scan_rec(xx, ww)),
        ("scan bf16", lambda xx, ww: scan_rec(
            xx.astype(jnp.bfloat16), ww.astype(jnp.bfloat16))),
    ]:
        def body2(carry, _, fn=fn):
            hs = fn(xp * carry, w_hh)
            return 1.0 + jnp.mean(hs).astype(jnp.float32) * 1e-20, None

        @jax.jit
        def run2():
            c, _ = jax.lax.scan(body2, jnp.float32(1.0), None, length=K)
            return c

        us = timed(run2, K)
        print(f"recurrence {name} [900 steps]: {us / 1e3:.2f} ms "
              f"({us / T:.2f} us/step)", flush=True)

    try:
        from prompt_tts_tpu.ops.pallas.lstm import lstm_recurrence

        def body3(carry, _):
            hs = lstm_recurrence(xp * carry, w_hh)
            return 1.0 + jnp.mean(hs).astype(jnp.float32) * 1e-20, None

        @jax.jit
        def run3():
            c, _ = jax.lax.scan(body3, jnp.float32(1.0), None, length=K)
            return c

        us = timed(run3, K)
        print(f"recurrence pallas [900 steps]: {us / 1e3:.2f} ms "
              f"({us / T:.2f} us/step)", flush=True)
    except Exception as e:
        print("pallas recurrence failed:", e, flush=True)

    # numerics probe: bf16 recurrence error vs f32 over 900 steps
    hs32 = scan_rec(xp, w_hh)
    hs16 = scan_rec(xp.astype(jnp.bfloat16),
                    w_hh.astype(jnp.bfloat16)).astype(jnp.float32)
    err = jnp.max(jnp.abs(hs32 - hs16))
    print(f"bf16 recurrence max abs err vs f32: {float(err):.3e}",
          flush=True)


if __name__ == "__main__":
    main()
