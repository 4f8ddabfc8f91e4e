"""Ancestral DDPM sampler (full-length reverse process) as ``lax.scan``.

Complements :mod:`prompt_tts_tpu.diffusion.ddim`; implements the classic
epsilon-parameterized posterior step with the "fixed small" variance
``beta_t * (1-acp_{t-1})/(1-acp_t)``, matching the diffusers DDPMScheduler
defaults the reference trains against (reference train.py:32-36).
"""

import jax
import jax.numpy as jnp

from prompt_tts_tpu.diffusion.schedule import DiffusionSchedule
from prompt_tts_tpu.diffusion.ddim import DenoiseFn


def ddpm_sample(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    x_T: jnp.ndarray,
    rng: jax.Array,
    clip_sample: bool = True,
) -> jnp.ndarray:
    """Full T-step ancestral sampling from noise ``x_T``."""
    T = schedule.num_train_timesteps
    batch = x_T.shape[0]
    timesteps = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(rng, T)

    acp = schedule.alphas_cumprod
    alphas = schedule.alphas
    betas = schedule.betas

    def body(x, inputs):
        t, key = inputs
        t_batch = jnp.full((batch,), t, dtype=jnp.int32)
        eps = denoise_fn(x, t_batch)

        acp_t = acp[t]
        acp_prev = jnp.where(t > 0, acp[jnp.maximum(t - 1, 0)], 1.0)

        x0 = (x - jnp.sqrt(1.0 - acp_t) * eps) / jnp.sqrt(acp_t)
        if clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)

        # posterior mean coefficients (Ho et al. 2020, eq. 7)
        coef_x0 = jnp.sqrt(acp_prev) * betas[t] / (1.0 - acp_t)
        coef_xt = jnp.sqrt(alphas[t]) * (1.0 - acp_prev) / (1.0 - acp_t)
        mean = coef_x0 * x0 + coef_xt * x

        var = betas[t] * (1.0 - acp_prev) / (1.0 - acp_t)
        noise = jax.random.normal(key, x.shape, x.dtype)
        x_prev = mean + jnp.where(t > 0, jnp.sqrt(jnp.maximum(var, 1e-20)), 0.0) * noise
        return x_prev, None

    x0_final, _ = jax.lax.scan(body, x_T, (timesteps, keys))
    return x0_final
