"""Learning-rate schedules matching diffusers ``get_scheduler`` names.

The reference selects a schedule by name from its JSON config and counts
warmup/total in micro-steps (reference train.py:60-65).  These are optax
schedules with the same shapes: every schedule is a function of the
optimizer update count.
"""

import math
from typing import Callable

import optax


def get_schedule(
    name: str,
    learning_rate: float,
    num_warmup_steps: int = 0,
    num_training_steps: int = 0,
    num_cycles: float = 0.5,
    power: float = 1.0,
) -> Callable[[int], float]:
    """Schedule by diffusers name: constant, constant_with_warmup, linear,
    cosine, cosine_with_restarts, polynomial."""
    import jax.numpy as jnp

    warm = max(num_warmup_steps, 0)

    def warmup_frac(step):
        return jnp.minimum(1.0, step / jnp.maximum(warm, 1))

    if name == "constant":
        return lambda step: jnp.asarray(learning_rate)

    if name == "constant_with_warmup":
        # the `step < warm` guard matters at warm=0: diffusers returns 1.0
        # there (its warmup branch is unreachable), while a bare
        # min(1, step/max(warm,1)) yields 0 at step 0 — silently making
        # the FIRST optimizer update a no-op
        return lambda step: learning_rate * jnp.where(
            step < warm, warmup_frac(step), 1.0)

    if name == "linear":
        def sched(step):
            decay = jnp.maximum(
                0.0,
                (num_training_steps - step)
                / jnp.maximum(num_training_steps - warm, 1),
            )
            return learning_rate * jnp.where(step < warm, warmup_frac(step),
                                             decay)
        return sched

    if name == "cosine":
        def sched(step):
            progress = jnp.clip(
                (step - warm) / jnp.maximum(num_training_steps - warm, 1),
                0.0, 1.0,
            )
            cos = 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * num_cycles * progress))
            return learning_rate * jnp.where(step < warm, warmup_frac(step),
                                             jnp.maximum(0.0, cos))
        return sched

    if name == "cosine_with_restarts":
        def sched(step):
            progress = jnp.clip(
                (step - warm) / jnp.maximum(num_training_steps - warm, 1),
                0.0, 1.0,
            )
            cycle_pos = (progress * num_cycles) % 1.0
            cos = 0.5 * (1.0 + jnp.cos(jnp.pi * cycle_pos))
            return learning_rate * jnp.where(
                step < warm, warmup_frac(step),
                jnp.where(progress >= 1.0, 0.0, jnp.maximum(0.0, cos)),
            )
        return sched

    if name == "polynomial":
        lr_end = 1e-7

        def sched(step):
            progress = jnp.clip(
                (step - warm) / jnp.maximum(num_training_steps - warm, 1),
                0.0, 1.0,
            )
            decay = (learning_rate - lr_end) * (1 - progress) ** power + lr_end
            return jnp.where(step < warm, learning_rate * warmup_frac(step),
                             decay)
        return sched

    raise ValueError(f"unknown lr scheduler: {name}")
