"""Component-wise UNet timing at flagship shapes (real TPU).

Measurement methodology (validated against a 4096^3 matmul chain hitting
~96% of v5e bf16 peak):
  * K chained iterations of the op inside ONE jitted ``lax.scan`` with a
    scalar data dependency between iterations so XLA cannot hoist the body;
  * the result is pulled to the HOST (``float(out)``) — through this dev
    setup's axon relay ``block_until_ready`` returns without waiting, so
    device-side "timings" without a host read are fiction;
  * each op is timed at depth K and 2K and the per-iteration time is the
    DIFFERENCE / K — the ~25-30 ms fixed RPC+read floor cancels exactly.

Run: python -u tools/abl_unet.py   (background, 1500s+ budget)
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import ModelConfig
from prompt_tts_tpu.models.unet1d import (
    ResnetBlock1D, SpatialTransformer1D, Downsample1D, Upsample1D,
    UNet1DCondition,
)

B = 8
K = 50
DT = jnp.bfloat16
CFG = ModelConfig()


def chain_time_s(apply_fn, params, x, *rest, iters):
    """Wall time of K chained applies in one jit, host-read included."""

    def run(p, xx, *rr):
        def body(c, _):
            y = apply_fn(p, xx * c, *rr)
            return 1.0 + jnp.mean(y).astype(jnp.float32) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    fn = jax.jit(run)
    float(fn(params, x, *rest))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(params, x, *rest))
        best = min(best, time.perf_counter() - t0)
    return best


def device_time_us(apply_fn, params, x, *rest, iters=K):
    """Per-iteration device time via the 2K-vs-K difference."""
    t1 = chain_time_s(apply_fn, params, x, *rest, iters=iters)
    t2 = chain_time_s(apply_fn, params, x, *rest, iters=2 * iters)
    return (t2 - t1) / iters * 1e6


def time_module(mod, x, *rest):
    params = mod.init(jax.random.PRNGKey(0), x, *rest)
    return device_time_us(
        lambda p, xx, *r: mod.apply(p, xx, *r), params, x, *rest)


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    temb = jax.random.normal(key, (B, 1024), DT)
    ctx = jax.random.normal(key, (B, 550, 768), DT)

    points = [(900, 256), (450, 512), (225, 768), (113, 768)]
    for T, C in points:
        x = jax.random.normal(key, (B, T, C), DT)
        r = time_module(ResnetBlock1D(out_channels=C, dtype=DT), x, temb)
        s = time_module(
            SpatialTransformer1D(
                num_heads=8, head_dim=C // 8, cross_attention_dim=768,
                dtype=DT), x, ctx)
        x2 = jax.random.normal(key, (B, T, 2 * C), DT)
        r2 = time_module(ResnetBlock1D(out_channels=C, dtype=DT), x2, temb)
        print(f"T={T:4d} C={C:3d}: resnet={r:7.1f} transformer={s:7.1f} "
              f"up-resnet2C={r2:7.1f}  us", flush=True)

    x = jax.random.normal(key, (B, 900, 256), DT)
    d = time_module(Downsample1D(256, dtype=DT), x)
    xu = jax.random.normal(key, (B, 450, 256), DT)
    u = time_module(Upsample1D(256, target_len=900, dtype=DT), xu)
    print(f"down@900/256={d:.1f}us  up@450->900/256={u:.1f}us", flush=True)

    model = UNet1DCondition(CFG, dtype=DT)
    sample = jax.random.normal(key, (B, 900, 8))
    t = jnp.zeros((B,), jnp.int32)
    params = jax.jit(model.init)(key, sample, t, ctx)
    full = device_time_us(
        lambda p, s_, t_, c_: model.apply(p, s_, t_, c_),
        params, sample, t, ctx, iters=10)
    print(f"full UNet forward: {full / 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
