"""Noise schedules and the forward (noising) process.

Matches the reference's training configuration — DDPM with 1000 train steps,
**linear** beta schedule, epsilon prediction (reference train.py:32-36) —
with the same constants diffusers uses for ``beta_schedule="linear"``
(beta_start=1e-4, beta_end=0.02).

Everything is a pure function over a :class:`DiffusionSchedule` pytree of
precomputed f32 tables, so it can live inside jit/scan and be vmapped over
per-sample timesteps.
"""

from typing import NamedTuple

import jax.numpy as jnp


class DiffusionSchedule(NamedTuple):
    """Precomputed schedule tables (all f32, length ``num_train_timesteps``)."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray

    @property
    def num_train_timesteps(self) -> int:
        return self.betas.shape[0]


def linear_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
) -> DiffusionSchedule:
    """The diffusers-compatible linear beta schedule (train.py:32-36)."""
    betas = jnp.linspace(beta_start, beta_end, num_train_timesteps,
                         dtype=jnp.float32)
    alphas = 1.0 - betas
    return DiffusionSchedule(
        betas=betas,
        alphas=alphas,
        alphas_cumprod=jnp.cumprod(alphas),
    )


def _broadcast_t(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample table values and reshape to broadcast over data."""
    vals = table[t]
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def add_noise(
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Forward process: ``x_t = sqrt(acp_t) x0 + sqrt(1-acp_t) eps``.

    Semantics of ``DDPMScheduler.add_noise`` (reference train.py:96-98);
    ``t`` is int per-sample ``[B]`` (or scalar).
    """
    acp = _broadcast_t(schedule.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(acp) * x0 + jnp.sqrt(1.0 - acp) * noise


def velocity_target(
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """v-prediction target ``v = sqrt(acp) eps - sqrt(1-acp) x0``.

    Not used by the reference objective (epsilon, train.py:35) but part of
    the framework's diffusion surface.
    """
    acp = _broadcast_t(schedule.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * x0


def predict_x0_from_eps(
    schedule: DiffusionSchedule,
    x_t: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Invert the forward process: ``x0 = (x_t - sqrt(1-acp) eps)/sqrt(acp)``."""
    acp = _broadcast_t(schedule.alphas_cumprod, t, x_t.ndim)
    return (x_t - jnp.sqrt(1.0 - acp) * eps) / jnp.sqrt(acp)


def snr(schedule: DiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """Signal-to-noise ratio ``acp/(1-acp)`` at timestep(s) ``t``."""
    acp = schedule.alphas_cumprod[t]
    return acp / (1.0 - acp)
