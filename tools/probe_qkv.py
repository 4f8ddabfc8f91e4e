import time
import jax, jax.numpy as jnp

def per_us(fn, *args, iters=200, trials=3):
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
# per-level shapes: (tokens, C) for self-attn qkv at each UNet level
for (M, C) in [(7200, 256), (3600, 512), (1800, 768)]:
    x = jax.random.normal(key, (M, C), jnp.bfloat16)
    w1 = jax.random.normal(key, (C, C), jnp.bfloat16)
    w2 = jax.random.normal(key, (C, C), jnp.bfloat16)
    w3 = jax.random.normal(key, (C, C), jnp.bfloat16)
    wf = jax.random.normal(key, (C, 3 * C), jnp.bfloat16)

    sep = per_us(lambda xx, a, b, c: (xx @ a) + (xx @ b) + (xx @ c),
                 x, w1, w2, w3)
    fus = per_us(lambda xx, w: jnp.sum(
        (xx @ w).reshape(M, 3, C), axis=1), x, wf)
    # concat-inside variant: what production would pay keeping params split
    cat = per_us(lambda xx, a, b, c: jnp.sum(
        (xx @ jnp.concatenate([a, b, c], 1)).reshape(M, 3, C), axis=1),
        x, w1, w2, w3)
    print(f"M={M} C={C}: separate={sep:.1f}us fused={fus:.1f}us "
          f"concat-in-jit={cat:.1f}us", flush=True)
