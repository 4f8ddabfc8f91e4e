"""Train-step scaling A/B on the real TPU: batch size x remat.

Chained-difference methodology (see tools/abl_unet.py).  Produced the
training-roofline row in ARCHITECTURE.md: 256 ms @ batch 32 (125 ex/s),
flat across batch 16/32/64.

Run: python -u tools/abl_train.py
"""

import time
import jax, jax.numpy as jnp
from prompt_tts_tpu.config import Config
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

def measure(bs, remat, iters=4, trials=3):
    batch = {k: jnp.asarray(v) for k, v in next(data.batches(bs)).items()}
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["codes"][:1],
        jnp.zeros((1,), jnp.int32), batch["text_ids"][:1],
        batch["text_mask"][:1])
    state0 = create_train_state(model, params, cfg.train, 1000)
    step = make_train_step(model.apply, linear_schedule(), remat=remat)

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
        float(run(state0, batch))
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter(); float(run(state0, batch))
            best = min(best, time.perf_counter() - t0)
        return best
    return (timed(2 * iters) - timed(iters)) / iters

for bs, remat in [(32, False), (64, False), (16, False), (32, True)]:
    s = measure(bs, remat)
    print(f"train step bs={bs} remat={remat}: {s*1e3:.1f} ms "
          f"({bs/s:.1f} ex/s)", flush=True)
