"""Train-step ROOFLINE decomposition on the real TPU (round-3 verdict #1).

The round-3 open question: the flagship batch-32 bf16 train step runs at
0.257 s (~25% of v5e bf16 peak by XLA's own FLOP count) while the
inference denoise step runs at 55% — batch-flatness ruled out
under-batching but nothing decomposed WHERE the other 30 points go
(forward? backward? optimizer? dropout RNG?).  This tool measures each
layer of the step with the frozen chained-difference methodology
(CLAUDE.md): K-vs-2K `lax.scan` chains, every input carry-dependent,
a host value read, min of 3 trials.

Variants:
  fwd       loss only, training mode (dropout on)       — forward cost
  fwd_det   loss only, dropout off                      — RNG/dropout delta
  grad      value_and_grad, no update                   — fwd+bwd cost
  full      value_and_grad + AdamW update + grad norm   — the shipped step
  opt       apply_gradients only (carry-scaled grads)   — optimizer cost

Derived: bwd = grad - fwd; step overhead = full - grad - opt.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/abl_train_roofline.py
"""

import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import Config
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.train import create_train_state
from prompt_tts_tpu.train.step import make_loss_fn, make_train_step

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
state0 = create_train_state(model, params, cfg.train, 1000)
sched = linear_schedule()
base_rng = jax.random.PRNGKey(7)

loss_fn = make_loss_fn(model.apply, sched)


def det_loss_fn(p, b, rng):
    """Training loss with dropout OFF (deterministic forward)."""
    from prompt_tts_tpu.diffusion.schedule import add_noise
    codes = b["codes"]
    B = codes.shape[0]
    rng_noise, rng_t = jax.random.split(rng)
    noise = jax.random.normal(rng_noise, codes.shape, codes.dtype)
    t = jax.random.randint(rng_t, (B,), 0, sched.num_train_timesteps,
                           dtype=jnp.int32)
    noisy = add_noise(sched, codes, noise, t)
    pred = model.apply(p, noisy, t, b["text_ids"], b["text_mask"],
                       deterministic=True)
    return jnp.mean((pred.astype(jnp.float32)
                     - noise.astype(jnp.float32)) ** 2)


def chain_scalar(make_body, n):
    """Chain n iterations whose body returns a scalar carry."""
    @jax.jit
    def run(p, b):
        def body(c, i):
            return make_body(p, b, c, i), None
        c, _ = jax.lax.scan(body, jnp.float32(1.0), jnp.arange(n))
        return c
    return run


def timed(run, *args):
    float(run(*args))                       # compile + warm
    best = float("inf")
    for trial in range(TRIALS):
        a0 = args[1]
        b2 = dict(a0)
        b2["codes"] = a0["codes"] * (1.0 + 1e-6 * (trial + 1))
        t0 = time.perf_counter()
        float(run(args[0], b2))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(make_body):
    t1 = timed(chain_scalar(make_body, K), params, batch)
    t2 = timed(chain_scalar(make_body, 2 * K), params, batch)
    return (t2 - t1) / K


def body_fwd(p, b, c, i):
    b2 = dict(b); b2["codes"] = b["codes"] * c
    loss = loss_fn(p, b2, jax.random.fold_in(base_rng, i))
    return 1.0 + loss * 1e-20


def body_fwd_det(p, b, c, i):
    b2 = dict(b); b2["codes"] = b["codes"] * c
    loss = det_loss_fn(p, b2, jax.random.fold_in(base_rng, i))
    return 1.0 + loss * 1e-20


def body_grad(p, b, c, i):
    b2 = dict(b); b2["codes"] = b["codes"] * c
    loss, grads = jax.value_and_grad(loss_fn)(
        p, b2, jax.random.fold_in(base_rng, i))
    # fold ONE grad leaf into the carry (cheap, keeps bwd live)
    g0 = jax.tree_util.tree_leaves(grads)[0]
    return 1.0 + (loss + jnp.sum(g0.astype(jnp.float32))) * 1e-20


results = {}
for name, body in [("fwd", body_fwd), ("fwd_det", body_fwd_det),
                   ("grad", body_grad)]:
    s = per_iter(body)
    results[name] = s
    print(f"{name:8s}: {s*1e3:7.1f} ms", flush=True)

# --- full step: carry the TrainState (params move every iteration) ---
step = make_train_step(model.apply, sched)


def time_state_chain(step_like, n):
    @jax.jit
    def run(state, b):
        def body(s, i):
            s2, m = step_like(s, b, jax.random.fold_in(base_rng, i))
            return s2, m["loss"]
        s, losses = jax.lax.scan(body, state, jnp.arange(n))
        return losses[-1]
    float(run(state0, batch))
    best = float("inf")
    for trial in range(TRIALS):
        b2 = dict(batch)
        b2["codes"] = batch["codes"] * (1.0 + 1e-6 * (trial + 1))
        t0 = time.perf_counter()
        float(run(state0, b2))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter_state(step_like):
    return (time_state_chain(step_like, 2 * K)
            - time_state_chain(step_like, K)) / K


results["full"] = per_iter_state(step)
print(f"{'full':8s}: {results['full']*1e3:7.1f} ms", flush=True)


# --- optimizer-only: fixed grads scaled by a live carry ---
grads0 = jax.jit(lambda p, b, r: jax.grad(loss_fn)(p, b, r))(
    params, batch, base_rng)


def opt_step(state, b, rng):
    c = 1.0 + jnp.mean(b["codes"][0, 0]).astype(jnp.float32) * 1e-20
    g = jax.tree.map(lambda x: x * c, grads0)
    s2 = state.apply_gradients(grads=g)
    return s2, {"loss": jnp.float32(0.0)
                + jax.tree_util.tree_leaves(s2.params)[0].astype(
                    jnp.float32).sum() * 1e-20}


results["opt"] = per_iter_state(opt_step)
print(f"{'opt':8s}: {results['opt']*1e3:7.1f} ms", flush=True)

fwd, grad, full, opt = (results["fwd"], results["grad"],
                        results["full"], results["opt"])
print("\n--- decomposition (flagship, batch 32, bf16) ---")
print(f"forward            : {fwd*1e3:7.1f} ms")
print(f"dropout/RNG delta  : {(fwd-results['fwd_det'])*1e3:7.1f} ms")
print(f"backward (grad-fwd): {(grad-fwd)*1e3:7.1f} ms  "
      f"({(grad-fwd)/fwd:.2f}x forward)")
print(f"optimizer (AdamW)  : {opt*1e3:7.1f} ms")
print(f"residual (full-grad-opt): {(full-grad-opt)*1e3:7.1f} ms")
print(f"full step          : {full*1e3:7.1f} ms ({BS/full:.1f} ex/s)")

# %-of-peak: denoise fwd = 1.066 TFLOP at batch 8 (XLA count,
# ARCHITECTURE.md) -> batch 32 fwd ~= 4.26 TFLOP, bwd ~= 2x fwd
FWD_TFLOP = 1.066 * (BS / 8)
for name, s, tf in [("fwd", fwd, FWD_TFLOP),
                    ("bwd", grad - fwd, 2 * FWD_TFLOP),
                    ("fwd+bwd", grad, 3 * FWD_TFLOP),
                    ("full", full, 3 * FWD_TFLOP)]:
    print(f"{name:8s}: {tf/s:6.1f} TFLOPS = {100*tf/s/197:4.1f}% "
          f"of v5e bf16 peak")
