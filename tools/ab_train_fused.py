"""Fused attention backward: on-chip TRAINING A/B (descent equivalence).

The numerics tool (tools/verify_attn_bwd_tpu.py) proves per-call gradient
equivalence on the chip; this one proves the thing users care about —
that a real training run with the fused backward armed descends the same
way XLA autodiff does:

- f32 short-horizon tracking: 20 flagship steps, same data/seed; per-step
  losses must agree to f32-reorder tolerance (the kernel's grads match
  autodiff at ~1e-5 rel, so the curves track step-for-step).
- bf16 production run: 150 steps each arm, same data/seed. At bf16 the
  O(eps) gradient difference compounds chaotically, so we compare the
  CURVES (both descend; mean loss over the last 30 steps agrees within
  a few percent), not the trajectories.

Chained inside one jitted lax.scan per arm (one program, losses stacked),
losses pulled to host — per CLAUDE.md the host read is what makes the
result real.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/ab_train_fused.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import Config
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.ops.attention import fused_bwd_scope
from prompt_tts_tpu.train import create_train_state
from prompt_tts_tpu.train.step import make_train_step

B = 32
N_BATCHES = 8

print("backend:", jax.default_backend(), flush=True)
cfg = Config()
sched = linear_schedule()
data = SyntheticDataset(n=N_BATCHES * B, frames=cfg.model.sample_size,
                        max_seq_length=cfg.model.cmu_seq_len)
batches = list(data.batches(B))[:N_BATCHES]
stacked = {k: jnp.stack([jnp.asarray(b[k]) for b in batches])
           for k in batches[0]}


def run_arm(dtype, n_steps, armed, lr=1e-4):
    model = TTSSingleSpeaker(cfg.model, dtype=dtype)
    b0 = {k: v[0] for k, v in stacked.items()}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), b0["codes"][:1], jnp.zeros((1,), jnp.int32),
        b0["text_ids"][:1], b0["text_mask"][:1])
    import dataclasses
    tcfg = dataclasses.replace(cfg.train, learning_rate=lr,
                               lr_warmup_steps=0)
    state = create_train_state(model, params, tcfg, 1000)
    step = make_train_step(model.apply, sched)
    rng = jax.random.PRNGKey(7)

    @jax.jit
    def run(state, stacked):
        def body(st, i):
            b = {k: v[i % N_BATCHES] for k, v in stacked.items()}
            s2, m = step(st, b, jax.random.fold_in(rng, i))
            return s2, m["loss"]
        _, losses = jax.lax.scan(body, state, jnp.arange(n_steps))
        return losses

    with fused_bwd_scope(armed):
        losses = np.asarray(run(state, stacked), np.float64)
    return losses


# ---- f32 short-horizon tracking ----
f32_xla = run_arm(jnp.float32, 20, armed=False)
f32_fused = run_arm(jnp.float32, 20, armed=True)
d = np.abs(f32_xla - f32_fused)
print("f32 20-step |dloss| max:", f"{d.max():.3e}",
      " (losses", f"{f32_xla[0]:.4f}->{f32_xla[-1]:.4f}", ")", flush=True)
f32_ok = d.max() < 5e-3

# ---- bf16 production-descent comparison ----
bf_xla = run_arm(jnp.bfloat16, 150, armed=False)
bf_fused = run_arm(jnp.bfloat16, 150, armed=True)
for name, ls in (("xla  ", bf_xla), ("fused", bf_fused)):
    tail = ls[-30:].mean()
    print(f"bf16 {name}: loss[0]={ls[0]:.4f} tail30={tail:.4f} "
          f"curve(every 25): {np.round(ls[::25], 4).tolist()}", flush=True)
tail_xla, tail_fused = bf_xla[-30:].mean(), bf_fused[-30:].mean()
descend = bf_xla[-30:].mean() < bf_xla[0] and bf_fused[-30:].mean() < bf_fused[0]
agree = abs(tail_fused - tail_xla) / tail_xla < 0.05
print(f"bf16 tail agreement: {abs(tail_fused - tail_xla) / tail_xla:.3%}",
      flush=True)

ok = f32_ok and descend and agree
print("RESULT:", "PASS" if ok else "FAIL", flush=True)
raise SystemExit(0 if ok else 1)
