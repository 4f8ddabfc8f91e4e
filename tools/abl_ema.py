"""EMA train-step overhead A/B on the real TPU.

Measures the flagship batch-32 bf16 train step with ema_decay off vs on
(0.9999) — the EMA is one fused lerp over the param tree inside the same
jitted program (train/step.py), so the expected overhead is bandwidth-bound:
~3 x 245M x 4B = ~2.9 GB/s-step extra HBM traffic ≈ 0.4 ms at v5e's ~820
GB/s, against a ~256 ms step.

Chained-difference methodology (CLAUDE.md): K-vs-2K scan chains with the
state carried (every input the step consumes depends on the carry through
params/ema; the batch is perturbed per trial), host value read, min of 3.

Run: python -u tools/abl_ema.py   (minutes-scale compiles; background it)
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import Config, TrainConfig
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.train import create_train_state, make_train_step

print("backend:", jax.default_backend(), flush=True)
cfg = Config()
model = TTSSingleSpeaker(cfg.model, dtype=jnp.bfloat16)
data = SyntheticDataset(n=128, frames=cfg.model.sample_size,
                        max_seq_length=cfg.model.cmu_seq_len)
base_rng = jax.random.PRNGKey(7)
BS = 32


def measure(ema_decay, iters=4, trials=3):
    batch = {k: jnp.asarray(v) for k, v in next(data.batches(BS)).items()}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["codes"][:1],
        jnp.zeros((1,), jnp.int32), batch["text_ids"][:1],
        batch["text_mask"][:1])
    tcfg = TrainConfig(ema_decay=ema_decay) if ema_decay else cfg.train
    state0 = create_train_state(model, params, tcfg, 1000)
    step = make_train_step(model.apply, linear_schedule(),
                           ema_decay=ema_decay)

    def timed(n):
        @jax.jit
        def run(state, b):
            def body(carry, i):
                st, _ = carry
                st, m = step(st, b, jax.random.fold_in(base_rng, i))
                return (st, m["loss"]), None
            (st, loss), _ = jax.lax.scan(
                body, (state, jnp.float32(0.0)), jnp.arange(n))
            return loss
        float(run(state0, batch))  # warmup compile
        best = float("inf")
        for t in range(trials):
            # perturb one input per trial so no two executions are
            # byte-identical (relay-cache caution, CLAUDE.md)
            b = dict(batch)
            b["codes"] = batch["codes"] + jnp.float32(1e-7 * (t + 1))
            t0 = time.perf_counter()
            float(run(state0, b))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(2 * iters) - timed(iters)) / iters


off = measure(0.0)
print(f"train step bs={BS} ema=off:    {off*1e3:.1f} ms "
      f"({BS/off:.1f} ex/s)", flush=True)
on = measure(0.9999)
print(f"train step bs={BS} ema=0.9999: {on*1e3:.1f} ms "
      f"({BS/on:.1f} ex/s)  overhead {100*(on-off)/off:+.2f}%", flush=True)
