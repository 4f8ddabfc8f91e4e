"""Diffusion schedule + sampler tests.

Golden values for the linear schedule come from the closed-form diffusers
construction (linspace 1e-4..0.02 over 1000 steps) the reference trains with
(reference train.py:32-36).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prompt_tts_tpu.diffusion import (
    add_noise,
    ddim_sample,
    ddim_timesteps,
    ddpm_sample,
    dpm_solver_sample,
    linear_schedule,
)
from prompt_tts_tpu.diffusion.schedule import predict_x0_from_eps, snr


@pytest.fixture(scope="module")
def sched():
    return linear_schedule()


class TestSchedule:
    def test_beta_endpoints(self, sched):
        np.testing.assert_allclose(sched.betas[0], 1e-4, rtol=1e-6)
        np.testing.assert_allclose(sched.betas[-1], 0.02, rtol=1e-6)
        assert sched.num_train_timesteps == 1000

    def test_alphas_cumprod_golden(self, sched):
        # closed-form reference computed in f64 numpy
        betas = np.linspace(1e-4, 0.02, 1000)
        acp = np.cumprod(1.0 - betas)
        np.testing.assert_allclose(sched.alphas_cumprod, acp, rtol=2e-5)

    def test_snr_monotone_decreasing(self, sched):
        s = snr(sched, jnp.arange(1000))
        assert bool(jnp.all(jnp.diff(s) < 0))

    def test_add_noise_shape_and_endpoints(self, sched):
        x0 = jnp.ones((2, 8, 16))
        eps = jnp.zeros_like(x0)
        t = jnp.array([0, 999])
        xt = add_noise(sched, x0, eps, t)
        # at t=0 signal nearly intact; at t=999 heavily destroyed
        assert float(xt[0].mean()) > 0.99
        assert float(xt[1].mean()) < 0.1

    def test_add_noise_inverts(self, sched):
        rng = jax.random.PRNGKey(0)
        x0 = jax.random.normal(rng, (4, 8, 32))
        eps = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 32))
        t = jnp.array([10, 200, 500, 900])
        xt = add_noise(sched, x0, eps, t)
        x0_rec = predict_x0_from_eps(sched, xt, eps, t)
        np.testing.assert_allclose(x0_rec, x0, atol=1e-4)


class TestSamplers:
    def test_ddim_timesteps_spacing(self):
        ts = ddim_timesteps(1000, 50)
        assert ts.shape == (50,)
        assert int(ts[0]) == 980 and int(ts[-1]) == 0
        assert int(ts[0] - ts[1]) == 20

    def test_ddim_recovers_x0_with_oracle(self, sched):
        """With an oracle eps-predictor, DDIM must recover x0 (up to clip)."""
        x0_true = jnp.clip(
            jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16)) * 0.5,
            -1.0, 1.0,
        )
        acp = sched.alphas_cumprod

        def oracle(x, t):
            a = acp[t].reshape(-1, 1, 1)
            return (x - jnp.sqrt(a) * x0_true) / jnp.sqrt(1.0 - a)

        x_T = add_noise(
            sched, x0_true,
            jax.random.normal(jax.random.PRNGKey(3), x0_true.shape),
            jnp.full((2,), 999),
        )
        out = ddim_sample(oracle, sched, x_T, num_inference_steps=50)
        np.testing.assert_allclose(out, x0_true, atol=5e-3)

    def test_ddim_jits_and_is_deterministic(self, sched):
        def denoise(x, t):
            return 0.1 * x

        f = jax.jit(
            lambda x: ddim_sample(denoise, sched, x, num_inference_steps=10)
        )
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 16))
        out1, out2 = f(x), f(x)
        np.testing.assert_array_equal(out1, out2)
        assert out1.shape == x.shape

    def test_ddim_eta_requires_rng(self, sched):
        with pytest.raises(ValueError):
            ddim_sample(lambda x, t: x, sched, jnp.zeros((1, 2, 4)), eta=0.5)

    def test_dpm_solver_recovers_x0_with_oracle(self, sched):
        """DPM-Solver++(2M) at 20 steps must recover x0 from an oracle
        eps-predictor at least as well as 50-step DDIM does."""
        x0_true = jnp.clip(
            jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16)) * 0.5,
            -1.0, 1.0,
        )
        acp = sched.alphas_cumprod

        def oracle(x, t):
            a = acp[t].reshape(-1, 1, 1)
            return (x - jnp.sqrt(a) * x0_true) / jnp.sqrt(1.0 - a)

        x_T = add_noise(
            sched, x0_true,
            jax.random.normal(jax.random.PRNGKey(3), x0_true.shape),
            jnp.full((2,), 999),
        )
        out = dpm_solver_sample(oracle, sched, x_T, num_inference_steps=20)
        np.testing.assert_allclose(out, x0_true, atol=5e-3)

    def test_dpm_solver_jits_and_is_deterministic(self, sched):
        def denoise(x, t):
            return 0.1 * x

        f = jax.jit(lambda x: dpm_solver_sample(
            denoise, sched, x, num_inference_steps=12))
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 16))
        out1, out2 = f(x), f(x)
        np.testing.assert_array_equal(out1, out2)
        assert out1.shape == x.shape
        assert bool(jnp.isfinite(out1).all())

    def test_dpm_solver_small_step_counts(self, sched):
        """N=1 and N=2 exercise the forced-first-order edges."""
        def denoise(x, t):
            return 0.05 * x

        x = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 8))
        for n in (1, 2, 3):
            out = dpm_solver_sample(denoise, sched, x, num_inference_steps=n)
            assert out.shape == x.shape
            assert bool(jnp.isfinite(out).all()), n

    def test_ddpm_oracle(self, sched):
        x0_true = jnp.clip(
            jax.random.normal(jax.random.PRNGKey(5), (1, 4, 8)) * 0.5,
            -1.0, 1.0,
        )
        acp = sched.alphas_cumprod

        def oracle(x, t):
            a = acp[t].reshape(-1, 1, 1)
            return (x - jnp.sqrt(a) * x0_true) / jnp.sqrt(1.0 - a)

        out = ddpm_sample(
            oracle, sched,
            jax.random.normal(jax.random.PRNGKey(6), x0_true.shape),
            rng=jax.random.PRNGKey(7),
        )
        # ancestral sampling is stochastic; oracle keeps it near x0
        np.testing.assert_allclose(out, x0_true, atol=0.15)
