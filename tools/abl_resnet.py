import time
import jax, jax.numpy as jnp
from prompt_tts_tpu.models.unet1d import ResnetBlock1D
from prompt_tts_tpu.ops.pallas.resnet import fused_resnet_block

B, K = 8, 100
DT = jnp.bfloat16

def per_us(fn, *args, iters=K, trials=3):
    def chain(n):
        @jax.jit
        def run(*a):
            def body(c, _):
                y = fn(a[0] * c, *a[1:])
                return 1.0 + jnp.mean(y).astype(jnp.float32) * 1e-20, None
            c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=n)
            return c
        float(run(*args))
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter(); float(run(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    return (chain(2 * iters) - chain(iters)) / iters * 1e6

print("backend:", jax.default_backend(), flush=True)
key = jax.random.PRNGKey(0)
temb = jax.random.normal(key, (B, 1024), DT)

for (T, Cin, Cout) in [(900, 256, 256), (900, 512, 256), (450, 512, 512),
                       (225, 768, 768), (113, 768, 768)]:
    x = jax.random.normal(key, (B, T, Cin), DT)
    m = ResnetBlock1D(out_channels=Cout, dtype=DT)
    p = m.init(key, x, temb)["params"]

    xla_us = per_us(
        lambda xx, pp, tt: ResnetBlock1D(out_channels=Cout, dtype=DT).apply(
            {"params": pp}, xx, tt), x, p, temb)

    tw = p["time_emb_proj"]["kernel"]; tb = p["time_emb_proj"]["bias"]
    args = [p["norm1"]["norm"]["scale"], p["norm1"]["norm"]["bias"],
            p["conv1"]["conv"]["kernel"], p["conv1"]["conv"]["bias"],
            p["norm2"]["norm"]["scale"], p["norm2"]["norm"]["bias"],
            p["conv2"]["conv"]["kernel"], p["conv2"]["conv"]["bias"]]
    kw = {}
    if Cin != Cout:
        kw = dict(shortcut_w=p["conv_shortcut"]["conv"]["kernel"][0],
                  shortcut_b=p["conv_shortcut"]["conv"]["bias"])

    def fused(xx, tt, *aa, kw=kw):
        tp = jax.nn.silu(tt) @ aa[-2] + aa[-1]
        return fused_resnet_block(xx, tp, *aa[:-2], **kw)

    fus_us = per_us(fused, x, temb, *args, tw, tb)
    print(f"T={T:4d} {Cin}->{Cout}: xla={xla_us:7.1f}us "
          f"pallas-fused={fus_us:7.1f}us", flush=True)
