"""Diffusion math: schedules, the DDPM training objective, and samplers.

The reference delegates all of this to ``diffusers.DDPMScheduler``
(reference train.py:32-36, 96-98) and ships no sampler at all; here both are
first-class, implemented as pure functions over precomputed tables so the
whole denoising loop stays inside one XLA program (``lax.scan``), never
bouncing to the host between steps.
"""

from prompt_tts_tpu.diffusion.schedule import (
    DiffusionSchedule,
    linear_schedule,
    add_noise,
    velocity_target,
)
from prompt_tts_tpu.diffusion.ddim import ddim_sample, ddim_timesteps
from prompt_tts_tpu.diffusion.ddpm import ddpm_sample
from prompt_tts_tpu.diffusion.dpm import dpm_solver_sample

__all__ = [
    "DiffusionSchedule",
    "linear_schedule",
    "add_noise",
    "velocity_target",
    "ddim_sample",
    "ddim_timesteps",
    "ddpm_sample",
    "dpm_solver_sample",
]
