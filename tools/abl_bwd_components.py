"""Backward-pass component micro-bench on the real TPU (round-3 verdict #1).

If the train step's backward runs far below the forward's 55%-of-peak,
one (or more) of the UNet's primitive backwards is lowering badly.  This
times fwd-only vs fwd+bwd for each primitive at flagship train shapes
([32, T, C] — the UNet's per-level widths), chained per CLAUDE.md:

  conv_k3      stock channels-last lax conv (flax nn.Conv)
  conv_unfold  same k=3 conv as pad -> 3 shifted matmuls (bwd = matmuls)
  groupnorm    GN(32 groups) at the same shapes
  attn         self-attention at level shapes (heads = dim/64)
  gn_silu_conv the resnet's GN->SiLU->conv fusion unit

A conv_unfold >> conv_k3 gap at fwd+bwd (with equal fwd) fingers XLA's
conv backward layouts; a groupnorm gap fingers the reduction backward.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/abl_bwd_components.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

TRIALS = 3
B = 32


def k_for(flop, nbytes):
    """Chain length so the K-vs-2K delta is >= ~80 ms: the relay's RPC
    floor breathes by a few ms between calls, which swamped sub-ms
    per-iter deltas at fixed K=8 (first r4 run: negative times, >100%
    of peak).  Estimate per-iter as the slower of 60 TF/s MXU and
    600 GB/s HBM; scan is rolled so compile cost is K-independent."""
    est = max(flop / 60e12, nbytes / 600e9, 1e-5)
    return int(min(2048, max(16, 0.08 / est)))

# flagship UNet level shapes (block_out_channels=(256,512,768,768),
# T halves per level: 900/450/225/113)
SHAPES = [(900, 256), (450, 512), (225, 768), (113, 768)]


def timed_chain(body, args, n):
    @jax.jit
    def run(*a):
        def step(c, i):
            return body(c, i, *a), None
        c, _ = jax.lax.scan(step, jnp.float32(1.0), jnp.arange(n))
        return c
    float(run(*args))
    best = float("inf")
    for t in range(TRIALS):
        a2 = (args[0] * (1.0 + 1e-6 * (t + 1)),) + args[1:]
        t0 = time.perf_counter()
        float(run(*a2))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(body, args, K):
    return (timed_chain(body, args, 2 * K) - timed_chain(body, args, K)) / K


def bench(name, f, x, w, flop):
    """Time fwd and fwd+bwd of y=f(x, w); report TFLOPS vs v5e peak."""
    nbytes = x.nbytes * 3 + (w[0].nbytes if isinstance(w, tuple) else w.nbytes)
    K = k_for(flop, nbytes)
    def body_fwd(c, i, x, w):
        y = f((x * c).astype(x.dtype), w)
        return 1.0 + jnp.mean(y).astype(jnp.float32) * 1e-20

    def loss(x, w):
        return jnp.mean(f(x, w).astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1))

    def body_bwd(c, i, x, w):
        gx, gw = g((x * c).astype(x.dtype), w)
        return 1.0 + (jnp.mean(gx) + jnp.mean(gw[0] if isinstance(gw, tuple)
                                              else gw)).astype(
            jnp.float32) * 1e-20

    t_f = per_iter(body_fwd, (x, w), K)
    t_b = per_iter(body_bwd, (x, w), max(16, K // 3))
    tf_f = flop / 1e12 / t_f
    tf_b = 3 * flop / 1e12 / t_b  # bwd ~= 2x fwd FLOPs
    print(f"{name:22s}: fwd {t_f*1e3:7.2f} ms ({tf_f:5.1f} TF, "
          f"{100*tf_f/197:4.1f}%)  fwd+bwd {t_b*1e3:7.2f} ms "
          f"({tf_b:5.1f} TF, {100*tf_b/197:4.1f}%)  bwd/fwd "
          f"{(t_b-t_f)/t_f:4.1f}x  [K={K}]", flush=True)


print("backend:", jax.default_backend(), flush=True)
key = jax.random.PRNGKey(0)

for T, C in SHAPES:
    x = jax.random.normal(key, (B, T, C), jnp.bfloat16)
    w = jax.random.normal(key, (3, C, C), jnp.bfloat16) * 0.02
    flop = 2 * B * T * 3 * C * C  # MACs*2

    def conv_k3(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"))

    def conv_unfold(x, w):
        # pad T by 1 each side, three shifted [B*T, C] @ [C, C] matmuls
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        T = x.shape[1]
        return (xp[:, 0:T] @ w[0] + xp[:, 1:T + 1] @ w[1]
                + xp[:, 2:T + 2] @ w[2])

    bench(f"conv_k3   T={T:3d} C={C}", conv_k3, x, w, flop)
    bench(f"conv_unf  T={T:3d} C={C}", conv_unfold, x, w, flop)

    # GroupNorm (f32 params like the model; bandwidth-bound: report ms)
    gamma = jnp.ones((C,), jnp.float32)

    def gn(x, gamma):
        xf = x.astype(jnp.float32).reshape(B, T_ := x.shape[1], 32, -1)
        mu = xf.mean(axis=(1, 3), keepdims=True)
        var = ((xf - mu) ** 2).mean(axis=(1, 3), keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return (y.reshape(x.shape) * gamma).astype(x.dtype)

    bench(f"groupnorm T={T:3d} C={C}", gn, x, gamma,
          2 * B * T * C * 6)  # rough byte-ish proxy, % peak meaningless

# attention at the two attention-bearing levels
for T, C in SHAPES:
    H, D = C // 64, 64
    x = jax.random.normal(key, (B, T, C), jnp.bfloat16)
    wqkv = jax.random.normal(key, (C, 3 * C), jnp.bfloat16) * 0.02
    proj_flop = 2 * B * T * C * 3 * C
    attn_flop = 2 * 2 * B * H * T * T * D
    flop = proj_flop + attn_flop

    def attn(x, wqkv):
        q, k, v = jnp.split(x @ wqkv, 3, axis=-1)
        q = q.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        s = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2))
                           * (D ** -0.5), axis=-1)
        o = (s @ v).transpose(0, 2, 1, 3)
        return o.reshape(x.shape)

    bench(f"attn      T={T:3d} C={C}", attn, x, wqkv, flop)
