"""Final train-step A/B: shipped step vs bucketed optimizer (+rbg).

Baseline (tools/abl_train_roofline.py, r4): full step 253.8 ms at the
flagship batch-32 bf16 config.  tools/abl_opt_shape.py isolated the
optimizer at 58.0 ms/update per-leaf vs 9.5 ms bucketed; this measures
the SHIPPED integration (create_train_state(bucketed_opt=True), i.e.
what `ptts-train` now runs by default on a TP-free mesh), with and
without the rbg dropout stream, chained per CLAUDE.md.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/abl_step_final.py
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import Config
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.train import create_train_state
from prompt_tts_tpu.train.step import make_train_step

BS = 32
K = 3
TRIALS = 3

print("backend:", jax.default_backend(), flush=True)
cfg = Config()
model = TTSSingleSpeaker(cfg.model, dtype=jnp.bfloat16)
data = SyntheticDataset(n=64, frames=cfg.model.sample_size,
                        max_seq_length=cfg.model.cmu_seq_len)
batch = {k: jnp.asarray(v) for k, v in next(data.batches(BS)).items()}
params = jax.jit(model.init)(
    jax.random.PRNGKey(0), batch["codes"][:1], jnp.zeros((1,), jnp.int32),
    batch["text_ids"][:1], batch["text_mask"][:1])
sched = linear_schedule()
base_rng = jax.random.PRNGKey(7)


def time_state_chain(step_like, make_state, n):
    @jax.jit
    def run(state, b):
        def body(carry, i):
            st, _ = carry
            s2, m = step_like(st, b, jax.random.fold_in(base_rng, i))
            return (s2, m["loss"]), None
        (st, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)), jnp.arange(n))
        return loss
    state0 = make_state()
    float(run(state0, batch))
    best = float("inf")
    for trial in range(TRIALS):
        b2 = dict(batch)
        b2["codes"] = batch["codes"] * (1.0 + 1e-6 * (trial + 1))
        t0 = time.perf_counter()
        float(run(state0, b2))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(step_like, make_state):
    return (time_state_chain(step_like, make_state, 2 * K)
            - time_state_chain(step_like, make_state, K)) / K


def make_state(bucketed):
    return lambda: create_train_state(model, params, cfg.train, 1000,
                                      bucketed_opt=bucketed)


for bucketed in (False, True):
    for impl in ("threefry", "rbg"):
        step = make_train_step(model.apply, sched, dropout_rng_impl=impl)
        s = per_iter(step, make_state(bucketed))
        print(f"full step bucketed={bucketed!s:5s} dropout={impl:8s}: "
              f"{s*1e3:7.1f} ms", flush=True)
