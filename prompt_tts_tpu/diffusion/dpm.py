"""DPM-Solver++(2M) sampler as a single ``lax.scan``.

A second-order multistep ODE solver (Lu et al. 2022, "DPM-Solver++") for
epsilon-prediction diffusion models: comparable sample quality to 50-step
DDIM at ~20-25 steps, i.e. ~2x cheaper synthesis.  The reference repo has
NO sampler at all (SURVEY.md §2b); diffusers users know this one as
``DPMSolverMultistepScheduler(algorithm_type="dpmsolver++",
solver_order=2, lower_order_final=True)`` and this implementation follows
those semantics (leading timestep spacing, x0-prediction update form,
first-order first and final steps).

TPU notes: all per-step coefficients (sigma ratios, ``expm1(-h)``,
step-size ratios) are precomputed as float64 numpy tables at trace time
and gathered inside the scan — the body is pure tensor math at static
shapes, nothing leaves the device between steps.
"""

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from prompt_tts_tpu.diffusion.schedule import DiffusionSchedule

DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def dpm_solver_sample(
    denoise_fn: DenoiseFn,
    schedule: DiffusionSchedule,
    x_T: jnp.ndarray,
    num_inference_steps: int = 25,
    clip_sample: bool = True,
) -> jnp.ndarray:
    """Run DPM-Solver++(2M) from pure noise ``x_T`` to a sample.

    Args:
      denoise_fn: epsilon-prediction model closure ``(x, t[B]) -> eps``.
      schedule: training schedule tables (linear betas here).
      x_T: initial noise ``[B, ...]``.
      num_inference_steps: sampler steps (2nd-order: ~20-25 matches
        50-step DDIM quality).
      clip_sample: clamp the x0 estimate to [-1, 1] (correct for this
        framework's code latents, reference tts/dataloader.py:64,168-170).
    """
    T = schedule.num_train_timesteps
    N = int(num_inference_steps)
    step_ratio = T // N
    batch = x_T.shape[0]

    # ---- host-side coefficient tables (float64 for lambda precision) ----
    acp = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    ts = (np.arange(N) * step_ratio)[::-1].astype(np.int64)  # descending
    alpha = np.sqrt(acp[ts])
    sigma = np.sqrt(1.0 - acp[ts])
    lam = np.log(alpha) - np.log(sigma)

    # the step i update moves t_i -> t_{i+1}; the final step lands on the
    # clean manifold (acp -> 1: alpha=1, sigma=0, lambda=+inf)
    alpha_prev = np.concatenate([alpha[1:], [1.0]])
    sigma_prev = np.concatenate([sigma[1:], [0.0]])
    with np.errstate(divide="ignore"):
        lam_prev = np.concatenate(
            [lam[1:], [np.inf]])

    h = lam_prev - lam                        # current interval
    c_x = np.where(sigma > 0, sigma_prev / np.maximum(sigma, 1e-30), 0.0)
    c_d = -alpha_prev * np.expm1(-h)          # exp(-inf)-1 -> -1 (finite)
    c_d = np.where(np.isfinite(c_d), c_d, alpha_prev)

    # 2M extrapolation ratio r_i = h_{i-1} / h_i (prev interval / current)
    h_last = np.concatenate([[np.nan], h[:-1]])
    with np.errstate(invalid="ignore", divide="ignore"):
        r = h_last / h
    # first step has no history; final step is forced first-order
    # (lower_order_final — exact for the terminal interval where h=inf)
    second = np.ones(N, dtype=bool)
    second[0] = False
    second[-1] = False
    r = np.where(second, r, 1.0)
    ext = np.where(second, 1.0 / (2.0 * r), 0.0)  # D = (1+ext)x0 - ext*x0_prev

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    tables = (jnp.asarray(ts, jnp.int32), f32(c_x), f32(c_d), f32(ext))

    def body(carry, inputs):
        x, x0_prev = carry
        t, cx, cd, ex = inputs
        t_batch = jnp.full((batch,), t, dtype=jnp.int32)
        eps = denoise_fn(x, t_batch)

        acp_t = schedule.alphas_cumprod[t]
        x0 = (x - jnp.sqrt(1.0 - acp_t) * eps) / jnp.sqrt(acp_t)
        if clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)

        d = (1.0 + ex) * x0 - ex * x0_prev
        x_next = cx * x + cd * d
        return (x_next, x0), None

    (x_final, _), _ = jax.lax.scan(body, (x_T, jnp.zeros_like(x_T)), tables)
    return x_final
