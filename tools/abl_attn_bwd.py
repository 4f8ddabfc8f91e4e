"""Fused attention backward A/B on the real TPU (r4 roofline attack).

Micro: grad-of-attention at the flagship train shapes (B=32 bf16), XLA
autodiff vs the Pallas fused backward (ops/pallas/attention_bwd.py).
In context: the full flagship batch-32 train step with the fused
backward armed (bucketed optimizer on, threefry dropout), against the
253.8 ms r4 baseline / the bucketed number from tools/abl_step_final.py.

Chained per CLAUDE.md (K-vs-2K scan, carry-dependent inputs, host read).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/abl_attn_bwd.py
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.ops.attention import _xla_attention, fused_bwd_scope
from prompt_tts_tpu.ops.pallas.attention_bwd import attention_fused_bwd

B = 32
TRIALS = 3

print("backend:", jax.default_backend(), flush=True)
key = jax.random.PRNGKey(0)

# (label, Tq, Tk, H, D) — the UNet's self-attn per level, the T=900
# cross-attn, and the text encoder's self-attn
CASES = [
    ("self T=900 C=256", 900, 900, 8, 32),
    ("self T=450 C=512", 450, 450, 8, 64),
    ("self T=225 C=768", 225, 225, 8, 96),
    ("self T=113 C=768", 113, 113, 8, 96),
    ("cross T=900 S=550", 900, 550, 8, 32),
    ("text  S=550 C=768", 550, 550, 12, 64),
]


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


for label, Tq, Tk, H, D in CASES:
    q = jax.random.normal(key, (B, Tq, H, D), jnp.bfloat16)
    k = jax.random.normal(key, (B, Tk, H, D), jnp.bfloat16)
    v = jax.random.normal(key, (B, Tk, H, D), jnp.bfloat16)
    flop = 3 * 4 * B * H * Tq * Tk * D      # fwd + ~2x bwd
    K = int(min(512, max(16, 0.08 / max(flop / 40e12, 1e-5))))

    for name, fn in (("xla", _xla_attention), ("fused", attention_fused_bwd)):
        def loss(q, k, v):
            return jnp.mean(fn(q, k, v, None).astype(jnp.float32) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))

        def body(c, i, q, k, v):
            gq, gk, gv = g((q * c).astype(q.dtype), k, v)
            return 1.0 + (jnp.mean(gq) + jnp.mean(gk)
                          + jnp.mean(gv)).astype(jnp.float32) * 1e-20

        s = per_iter(body, (q, k, v), K)
        tf = flop / 1e12 / s
        print(f"{label:18s} {name:5s}: {s*1e3:7.2f} ms "
              f"({tf:5.1f} TF, {100*tf/197:4.1f}%)  [K={K}]", flush=True)


# ---- in context: the full flagship train step, fused bwd armed ----
from prompt_tts_tpu.config import Config
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.train import create_train_state
from prompt_tts_tpu.train.step import make_train_step

cfg = Config()
model = TTSSingleSpeaker(cfg.model, dtype=jnp.bfloat16)
data = SyntheticDataset(n=64, frames=cfg.model.sample_size,
                        max_seq_length=cfg.model.cmu_seq_len)
batch = {k2: jnp.asarray(v2) for k2, v2 in next(data.batches(B)).items()}
params = jax.jit(model.init)(
    jax.random.PRNGKey(0), batch["codes"][:1], jnp.zeros((1,), jnp.int32),
    batch["text_ids"][:1], batch["text_mask"][:1])
sched = linear_schedule()
base_rng = jax.random.PRNGKey(7)
step = make_train_step(model.apply, sched)


def time_step_chain(n, armed):
    @jax.jit
    def run(state, b):
        def body(carry, i):
            st, _ = carry
            s2, m = step(st, b, jax.random.fold_in(base_rng, i))
            return (s2, m["loss"]), None
        (st, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)), jnp.arange(n))
        return loss
    state0 = create_train_state(model, params, cfg.train, 1000,
                                bucketed_opt=True)
    with fused_bwd_scope(armed):
        float(run(state0, batch))        # trace happens armed
        best = float("inf")
        for trial in range(TRIALS):
            b2 = dict(batch)
            b2["codes"] = batch["codes"] * (1.0 + 1e-6 * (trial + 1))
            t0 = time.perf_counter()
            float(run(state0, b2))
            best = min(best, time.perf_counter() - t0)
    return best


KS = 3
for armed in (True,):
    s = (time_step_chain(2 * KS, armed) - time_step_chain(KS, armed)) / KS
    print(f"full step bucketed + fused attn bwd: {s*1e3:7.1f} ms",
          flush=True)
