"""Train-step follow-up ablations (after tools/abl_train_roofline.py).

Round-4 decomposition found (flagship batch-32 bf16, v5e):
  fwd 63.5 ms (dropout ON) vs 43.8 ms (dropout OFF)  -> ~20 ms of
      threefry bits for ~180M dropout draws in the text encoder
  grad 183.4 ms (bwd/fwd = 1.9x — backward is proportionate)
  full 253.8 ms -> full - grad = 70 ms for "AdamW + clip + metrics",
      ~7x the ~10 ms HBM-traffic floor

This measures the candidate fixes, all chained per CLAUDE.md:

  grad_rbg       value_and_grad with the dropout rng converted to the
                 XLA-native 'rbg' generator (threefry->RngBitGenerator;
                 the dropout STREAM has no parity contract)
  full_rbg       full step with rbg dropout
  full_flat      full step with optax.flatten(tx) — one fused update
                 over a single flattened vector instead of ~1.1k
                 per-leaf chains (candidate for per-leaf launch
                 overhead; NOT TP-compatible, so it could only ever
                 default for pure-dp)
  full_rbg_flat  both fixes together
  opt            apply_gradients only (donated state rebuilt per trial;
                 the roofline tool's version OOMed) — run LAST, best
                 effort

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/abl_train_opt.py
"""

import time

import jax
import jax.numpy as jnp
import optax

from prompt_tts_tpu.config import Config
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.train import create_train_state
from prompt_tts_tpu.train.state import TrainState, make_optimizer
from prompt_tts_tpu.train.step import make_loss_fn, optax_global_norm

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
loss_fn = make_loss_fn(model.apply, sched)


def rbg_loss_fn(p, b, rng):
    """make_loss_fn's body but with the dropout stream on 'rbg'."""
    from prompt_tts_tpu.diffusion.schedule import add_noise
    codes = b["codes"]
    B = codes.shape[0]
    rng_noise, rng_t, rng_drop, _ = jax.random.split(rng, 4)
    noise = jax.random.normal(rng_noise, codes.shape, codes.dtype)
    t = jax.random.randint(rng_t, (B,), 0, sched.num_train_timesteps,
                           dtype=jnp.int32)
    noisy = add_noise(sched, codes, noise, t)
    drop = jax.random.wrap_key_data(jnp.tile(rng_drop, 2), impl="rbg")
    pred = model.apply(p, noisy, t, b["text_ids"], b["text_mask"],
                       deterministic=False, rngs={"dropout": drop})
    return jnp.mean((pred.astype(jnp.float32)
                     - noise.astype(jnp.float32)) ** 2)


def chain_scalar(body, n):
    @jax.jit
    def run(p, b):
        def step(c, i):
            return body(p, b, c, i), None
        c, _ = jax.lax.scan(step, jnp.float32(1.0), jnp.arange(n))
        return c
    return run


def timed_scalar(body, n):
    run = chain_scalar(body, n)
    float(run(params, batch))
    best = float("inf")
    for trial in range(TRIALS):
        b2 = dict(batch)
        b2["codes"] = batch["codes"] * (1.0 + 1e-6 * (trial + 1))
        t0 = time.perf_counter()
        float(run(params, b2))
        best = min(best, time.perf_counter() - t0)
    return best


def body_grad_rbg(p, b, c, i):
    b2 = dict(b); b2["codes"] = b["codes"] * c
    loss, grads = jax.value_and_grad(rbg_loss_fn)(
        p, b2, jax.random.fold_in(base_rng, i))
    g0 = jax.tree_util.tree_leaves(grads)[0]
    return 1.0 + (loss + jnp.sum(g0.astype(jnp.float32))) * 1e-20


s = (timed_scalar(body_grad_rbg, 2 * K) - timed_scalar(body_grad_rbg, K)) / K
print(f"grad with rbg dropout   : {s*1e3:7.1f} ms  (vs 183.4 threefry)",
      flush=True)


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


def per_iter_state(step_like, make_state):
    return (time_state_chain(step_like, make_state, 2 * K)
            - time_state_chain(step_like, make_state, K)) / K


def make_step(lfn):
    def train_step(state, b, rng):
        loss, grads = jax.value_and_grad(lfn)(state.params, b, rng)
        s2 = state.apply_gradients(grads=grads)
        return s2, {"loss": loss, "grad_norm": optax_global_norm(grads)}
    return train_step


def plain_state():
    return create_train_state(model, params, cfg.train, 1000)


def flat_state():
    return TrainState.create(
        apply_fn=model.apply, params=params,
        tx=optax.flatten(make_optimizer(cfg.train, 1000)), ema_params=None)


s = per_iter_state(make_step(rbg_loss_fn), plain_state)
print(f"full with rbg dropout   : {s*1e3:7.1f} ms  (vs 253.8 threefry)",
      flush=True)

s = per_iter_state(make_step(loss_fn), flat_state)
print(f"full with flattened opt : {s*1e3:7.1f} ms  (vs 253.8 per-leaf)",
      flush=True)

s = per_iter_state(make_step(rbg_loss_fn), flat_state)
print(f"full rbg + flattened    : {s*1e3:7.1f} ms", flush=True)


# ---- opt-only, best effort: donated state rebuilt per call ----
try:
    grads0 = jax.jit(jax.grad(loss_fn))(params, batch, base_rng)

    def time_opt_chain(n):
        def run(state, b, grads):
            def body(carry, i):
                st, _ = carry
                c = (1.0 + jnp.mean(b["codes"][0, 0]).astype(jnp.float32)
                     * 1e-20 + i.astype(jnp.float32) * 0.0)
                g = jax.tree.map(lambda x: x * c, grads)
                s2 = st.apply_gradients(grads=g)
                leaf = jax.tree_util.tree_leaves(s2.params)[0]
                return (s2, leaf.astype(jnp.float32).sum() * 1e-20), None
            (st, v), _ = jax.lax.scan(
                body, (state, jnp.float32(0.0)), jnp.arange(n))
            return v
        run2 = jax.jit(run, donate_argnums=(0,))
        float(run2(plain_state(), batch, grads0))  # compile
        best = float("inf")
        for trial in range(TRIALS):
            st = plain_state()                     # donated -> rebuild
            b2 = dict(batch)
            b2["codes"] = batch["codes"] * (1.0 + 1e-6 * (trial + 1))
            t0 = time.perf_counter()
            float(run2(st, b2, grads0))
            best = min(best, time.perf_counter() - t0)
        return best

    s = (time_opt_chain(2 * K) - time_opt_chain(K)) / K
    print(f"opt only (donated)      : {s*1e3:7.1f} ms", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"opt only: FAILED ({type(e).__name__}: {e})"[:200], flush=True)
