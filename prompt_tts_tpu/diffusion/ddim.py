"""DDIM sampler as a single ``lax.scan`` — the whole loop is one XLA program.

The reference repo has NO sampler (SURVEY.md §2b: the inference loop is
absent); this implements the deterministic DDIM update (Song et al. 2020)
with diffusers-compatible "leading" timestep spacing, so a model trained
under the reference objective samples the same way a diffusers user would
expect.

TPU notes: the denoiser is invoked inside ``lax.scan`` with static shapes;
per-step schedule scalars are gathered from precomputed tables, so nothing
leaves the device between steps.
"""

from typing import Callable

import jax
import jax.numpy as jnp

from prompt_tts_tpu.diffusion.schedule import DiffusionSchedule

# denoise_fn(x_t [B,...], t [B] int32) -> eps_hat [B,...]
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def ddim_timesteps(num_train_timesteps: int, num_inference_steps: int):
    """Descending timestep sequence (diffusers 0.15 "leading" spacing)."""
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (jnp.arange(num_inference_steps) * step_ratio).astype(jnp.int32)
    return ts[::-1]


def ddim_sample(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    x_T: jnp.ndarray,
    num_inference_steps: int = 50,
    eta: float = 0.0,
    clip_sample: bool = True,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Run DDIM from pure noise ``x_T`` to a sample.

    Args:
      denoise_fn: epsilon-prediction model closure.
      schedule: training schedule tables.
      x_T: initial noise ``[B, ...]``.
      num_inference_steps: sampler steps (<= num_train_timesteps).
      eta: DDIM stochasticity (0 = deterministic).
      clip_sample: clamp the x0 estimate to [-1, 1] — correct for this
        framework's code latents, which live in [-1, 1] by construction
        (reference tts/dataloader.py:64,168-170).
      rng: required iff ``eta > 0``.
    """
    T = schedule.num_train_timesteps
    timesteps = ddim_timesteps(T, num_inference_steps)
    step_ratio = T // num_inference_steps
    batch = x_T.shape[0]

    if eta > 0.0 and rng is None:
        raise ValueError("eta > 0 requires an rng key")
    # Per-step keys precomputed so the scan body is key-free when eta == 0.
    keys = (jax.random.split(rng, num_inference_steps) if eta > 0.0
            else jnp.zeros((num_inference_steps, 2), dtype=jnp.uint32))

    acp = schedule.alphas_cumprod

    def body(x, inputs):
        t, key = inputs
        t_batch = jnp.full((batch,), t, dtype=jnp.int32)
        eps = denoise_fn(x, t_batch)

        acp_t = acp[t]
        prev_t = t - step_ratio
        acp_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], 1.0)

        x0 = (x - jnp.sqrt(1.0 - acp_t) * eps) / jnp.sqrt(acp_t)
        if clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)
        # re-derive eps from the (possibly clipped) x0, as diffusers does
        eps_dir = (x - jnp.sqrt(acp_t) * x0) / jnp.sqrt(1.0 - acp_t)

        if eta > 0.0:
            var = (1.0 - acp_prev) / (1.0 - acp_t) * (1.0 - acp_t / acp_prev)
            sigma = eta * jnp.sqrt(var)
        else:
            sigma = 0.0

        dir_xt = jnp.sqrt(1.0 - acp_prev - sigma**2) * eps_dir
        x_prev = jnp.sqrt(acp_prev) * x0 + dir_xt
        if eta > 0.0:
            noise = jax.random.normal(key, x.shape, x.dtype)
            x_prev = x_prev + sigma * noise
        return x_prev, None

    x0_final, _ = jax.lax.scan(body, x_T, (timesteps, keys))
    return x0_final
