"""The jitted SPMD training step.

One XLA program per step: sample per-example noise and timesteps, run the
forward process, predict epsilon, MSE, grads, clip+AdamW update — the whole
reference inner loop (train.py:86-120) fused into a single device program.

Distribution: the step is jitted with data-sharded batch inputs and
replicated params over a ``(data, model)`` mesh; XLA inserts the gradient
all-reduce over ICI (the SPMD equivalent of DDP backward, train.py:115) and
the loss mean is global (the equivalent of accelerator.gather().mean(),
train.py:110).

Memory: optional rematerialization via ``jax.checkpoint`` with a
dots-saveable policy — the TPU equivalent of the reference's per-block
torch gradient checkpointing (unet_blocks.py:186-194 etc.).
"""

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prompt_tts_tpu.diffusion.schedule import DiffusionSchedule, add_noise
from prompt_tts_tpu.train.state import TrainState


def make_loss_fn(apply_fn: Callable, schedule: DiffusionSchedule,
                 remat: bool = False,
                 cond_dropout_prob: float = 0.0,
                 dropout_rng_impl: str = "threefry") -> Callable:
    """Build the DDPM epsilon-MSE loss over one batch.

    Batch: ``codes [B,T,C]`` in [-1,1], ``text_ids [B,S]``, ``mask [B,S]``.
    ``cond_dropout_prob`` > 0 randomly nulls the text conditioning per
    sample (classifier-free guidance training).

    ``dropout_rng_impl="rbg"`` generates the DROPOUT stream with the
    XLA-native RngBitGenerator instead of threefry: the flagship text
    encoder draws ~180M dropout bits per step and threefry costs ~20 ms
    of the 63.5 ms forward; rbg measured 253.8 -> 250.4 ms on the full
    batch-32 step (tools/abl_train_opt.py, v5e).  Only the dropout
    stream changes — noise/timestep/CFG streams stay threefry, so data
    order, the forward process, and checkpoint-resume reproducibility
    (within a run, the impl is part of the program) are unaffected.
    The dropout stream has no parity contract with the reference (torch
    RNG differs anyway); opt-in because rbg's bits are
    generator-versioned rather than key-stable across XLA releases.
    """
    if dropout_rng_impl not in ("threefry", "rbg"):
        raise ValueError(f"dropout_rng_impl must be 'threefry' or 'rbg', "
                         f"got {dropout_rng_impl!r}")
    if remat:
        # bind the static kwargs BEFORE jax.checkpoint: checkpoint treats
        # every argument as dynamic, and a traced `deterministic` bool
        # crashes flax Dropout's `if ... or deterministic:` whenever any
        # dropout rate is non-zero (the flagship text encoder uses 0.1)
        def _train_apply(params, *cond, rngs):
            return apply_fn(params, *cond, deterministic=False, rngs=rngs)

        model_fn = jax.checkpoint(
            _train_apply,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    else:
        def model_fn(params, *cond, rngs):
            return apply_fn(params, *cond, deterministic=False, rngs=rngs)

    def loss_fn(params, batch, rng):
        codes = batch["codes"]
        B = codes.shape[0]
        rng_noise, rng_t, rng_drop, rng_cfg = jax.random.split(rng, 4)
        noise = jax.random.normal(rng_noise, codes.shape, codes.dtype)
        timesteps = jax.random.randint(
            rng_t, (B,), 0, schedule.num_train_timesteps, dtype=jnp.int32)
        noisy = add_noise(schedule, codes, noise, timesteps)
        text_ids = batch["text_ids"]
        text_mask = batch["text_mask"]
        prompt = batch.get("prompt")  # prompt-conditioned model only
        if cond_dropout_prob > 0.0:
            drop = jax.random.bernoulli(
                rng_cfg, cond_dropout_prob, (B, 1))
            text_ids = jnp.where(drop, jnp.zeros_like(text_ids), text_ids)
            text_mask = jnp.where(drop, jnp.zeros_like(text_mask), text_mask)
            if prompt is not None:
                # null-prompt = zero latents, jointly with null-text: the
                # unconditional branch the sampler's CFG pairs against
                # (pipeline._synthesize_device encodes zeros the same way)
                prompt = jnp.where(drop[:, :, None],
                                   jnp.zeros_like(prompt), prompt)
        cond = (noisy, timesteps, text_ids, text_mask)
        if prompt is not None:
            cond = cond + (prompt,)
        if dropout_rng_impl == "rbg":
            # rbg keys are 4 uint32 words; derive them from the 2-word
            # threefry-split key so the stream is still a pure function
            # of the step rng
            rng_drop = jax.random.wrap_key_data(
                jnp.tile(rng_drop, 2), impl="rbg")
        pred = model_fn(params, *cond, rngs={"dropout": rng_drop})
        loss = jnp.mean(
            (pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)
        return loss

    return loss_fn


def make_train_step(
    apply_fn: Callable,
    schedule: DiffusionSchedule,
    remat: bool = False,
    cond_dropout_prob: float = 0.0,
    ema_decay: float = 0.0,
    dropout_rng_impl: str = "threefry",
) -> Callable[[TrainState, Dict, jax.Array], Tuple[TrainState, Dict]]:
    """Un-jitted train step; jit/shard with :func:`jit_train_step`.

    ``ema_decay`` > 0 maintains ``state.ema_params`` inside the same XLA
    program (one fused lerp over the param tree, measured +0.9% at the
    flagship batch-32 step — tools/abl_ema.py). Under gradient
    accumulation the boundary is derived from the optimizer state itself
    (``optax.MultiSteps.mini_step`` wraps to 0 exactly when the update
    applied), so the EMA timescale cannot drift from the accumulation
    config, and a ``lax.cond`` skips the lerp's HBM traffic entirely on
    non-boundary micro-steps.
    """
    loss_fn = make_loss_fn(apply_fn, schedule, remat=remat,
                           cond_dropout_prob=cond_dropout_prob,
                           dropout_rng_impl=dropout_rng_impl)

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        new_state = state.apply_gradients(grads=grads)
        if ema_decay > 0.0 and state.ema_params is not None:
            def lerp():
                return jax.tree.map(
                    lambda e, p: (e.astype(jnp.float32) * ema_decay
                                  + p.astype(jnp.float32) * (1.0 - ema_decay)
                                  ).astype(e.dtype),
                    state.ema_params, new_state.params)
            opt = new_state.opt_state
            if hasattr(opt, "mini_step"):
                # optax.MultiSteps (gradient accumulation): params moved
                # iff mini_step wrapped to 0 on this micro-step
                ema = jax.lax.cond(opt.mini_step == 0, lerp,
                                   lambda: state.ema_params)
            else:
                ema = lerp()
            new_state = new_state.replace(ema_params=ema)
        metrics = {
            "loss": loss,
            "grad_norm": optax_global_norm(grads),
        }
        return new_state, metrics

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def jit_train_step(
    train_step: Callable,
    mesh: Mesh,
    state_sharding=None,
    batch_sharding=None,
) -> Callable:
    """Jit with explicit shardings: data-sharded batch, replicated rng.

    ``state_sharding``: None replicates the TrainState (pure data
    parallelism); pass ``parallel.tp.state_shardings(state, mesh)`` to
    shard params+moments over the ``model`` axis (tensor parallelism) —
    GSPMD then inserts the TP collectives over ICI.  Donates the state so
    optimizer buffers update in place.

    ``batch_sharding``: None shards every batch leaf's leading dim over
    ``data``; pass ``parallel.mesh.batch_shardings(mesh, batch)`` (a
    per-key dict) to additionally shard latent time over ``seq``
    (sequence parallelism — arm ``parallel.sp`` so attention dispatches
    to the ring path too).
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    batch_sh = data if batch_sharding is None else batch_sharding
    state_sh = repl if state_sharding is None else state_sharding
    return jax.jit(
        train_step,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,),
    )


def make_eval_step(apply_fn: Callable, schedule: DiffusionSchedule):
    """Deterministic eval loss (fixed rng folding for reproducibility)."""
    def eval_step(params, batch, rng):
        codes = batch["codes"]
        B = codes.shape[0]
        rng_noise, rng_t = jax.random.split(rng)
        noise = jax.random.normal(rng_noise, codes.shape, codes.dtype)
        timesteps = jax.random.randint(
            rng_t, (B,), 0, schedule.num_train_timesteps, dtype=jnp.int32)
        noisy = add_noise(schedule, codes, noise, timesteps)
        cond = (noisy, timesteps, batch["text_ids"], batch["text_mask"])
        if "prompt" in batch:
            cond = cond + (batch["prompt"],)
        pred = apply_fn(params, *cond, deterministic=True)
        return jnp.mean(
            (pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)
    return eval_step


def make_eval_step_at(apply_fn: Callable, schedule: DiffusionSchedule):
    """Eval loss at a CALLER-FIXED diffusion timestep.

    Same deterministic ε-MSE as :func:`make_eval_step` but every example
    in the batch is noised to the given timestep ``t`` — evaluating at a
    fixed grid of timesteps profiles WHERE on the noise schedule a model
    is weak (low t ≈ fine detail, high t ≈ coarse structure), which a
    single scalar loss averages away. ``t`` is a traced scalar, so one
    compiled program serves the whole grid.
    """
    def eval_step(params, batch, rng, t):
        codes = batch["codes"]
        noise = jax.random.normal(rng, codes.shape, codes.dtype)
        timesteps = jnp.full((codes.shape[0],), t, jnp.int32)
        noisy = add_noise(schedule, codes, noise, timesteps)
        cond = (noisy, timesteps, batch["text_ids"], batch["text_mask"])
        if "prompt" in batch:
            cond = cond + (batch["prompt"],)
        pred = apply_fn(params, *cond, deterministic=True)
        return jnp.mean(
            (pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)
    return eval_step
