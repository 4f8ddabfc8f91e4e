"""Ablation timing for attention paths at flagship UNet shapes (real TPU).

Same methodology as tools/abl_unet.py: K-vs-2K chained scans with a host
read (through the axon relay ``block_until_ready`` returns without
waiting; the fixed ~25-30 ms RPC+read floor cancels in the difference).

Times, per (Tq, Tk, D) the flagship UNet actually runs (B=8, H=8):
  - xla: the current default (bf16 score storage, f32-stable softmax)
  - pallas: prompt_tts_tpu.ops.pallas.attention.flash_attention
  - jaxflash: jax's shipped TPU flash kernel (if importable)

Run: python -u tools/abl_attention.py   (background, 1500s+ budget)
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.ops.attention import _xla_attention

B, H = 8, 8
K = 50
# (Tq, Tk, D): self-attn at each UNet level + cross-attn (Tk=550)
SHAPES = [
    (900, 900, 32), (450, 450, 64), (225, 225, 96), (113, 113, 96),
    (900, 550, 32), (450, 550, 64), (225, 550, 96), (113, 550, 96),
]


def chain_time_s(fn, q, k, v, iters):
    def run(q, k, v):
        def body(c, _):
            o = fn(q * c, k, v)
            return 1.0 + jnp.mean(o).astype(jnp.float32) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    jfn = jax.jit(run)
    float(jfn(q, k, v))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(q, k, v))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter_us(fn, q, k, v, iters=K):
    t1 = chain_time_s(fn, q, k, v, iters)
    t2 = chain_time_s(fn, q, k, v, 2 * iters)
    return (t2 - t1) / iters * 1e6


def main():
    print("backend:", jax.default_backend(), flush=True)
    paths = {}
    paths["xla"] = lambda q, k, v: _xla_attention(q, k, v, None)

    from prompt_tts_tpu.ops.pallas.attention import flash_attention
    paths["pallas"] = lambda q, k, v: flash_attention(q, k, v, bias=None)

    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash,
        )

        def jf(q, k, v):
            # jax kernel wants [B, H, T, D]
            qt = q.transpose(0, 2, 1, 3)
            kt = k.transpose(0, 2, 1, 3)
            vt = v.transpose(0, 2, 1, 3)
            o = jax_flash(qt, kt, vt, causal=False,
                          sm_scale=q.shape[-1] ** -0.5)
            return o.transpose(0, 2, 1, 3)

        paths["jaxflash"] = jf
    except Exception as e:
        print("jaxflash unavailable:", e, flush=True)

    header = f"{'shape':>18} | " + " | ".join(f"{n:>9}" for n in paths)
    print(header, flush=True)
    for Tq, Tk, D in SHAPES:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, Tq, H, D), jnp.bfloat16)
        k = jax.random.normal(key, (B, Tk, H, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, Tk, H, D), jnp.bfloat16)
        row = []
        for name, fn in paths.items():
            try:
                us = per_iter_us(fn, q, k, v)
            except Exception as e:
                us = float("nan")
                print(f"  {name} failed at {(Tq, Tk, D)}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
            row.append(us)
        cells = " | ".join(f"{us:9.1f}" for us in row)
        print(f"{str((Tq, Tk, D)):>18} | {cells}", flush=True)


if __name__ == "__main__":
    main()
