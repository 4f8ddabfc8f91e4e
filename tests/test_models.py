"""Model-level tests: shapes, masking behavior, parity quirks, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prompt_tts_tpu.config import ModelConfig
from prompt_tts_tpu.models import TextEncoder, TTSSingleSpeaker, UNet1DCondition

TINY = ModelConfig(
    block_out_channels=(32, 64, 64, 64),
    cross_attention_dim=64,
    attention_head_dim=32,
    text_encoder_layers=1,
    cmu_seq_len=32,
    sample_size=48,
    layers_per_block=1,
    unet_num_heads=4,
)


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = TTSSingleSpeaker(TINY)
    B, T, S = 2, TINY.sample_size, TINY.cmu_seq_len
    args = (
        jax.random.normal(jax.random.PRNGKey(42), (B, T, 8)),
        jnp.array([5, 900]),
        jnp.zeros((B, S), jnp.int32),
        jnp.ones((B, S), jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, args


class TestTextEncoder:
    def test_shapes_and_mask_effect(self):
        enc = TextEncoder(vocab_len=160, seq_len=16, dim=32,
                          attention_head_dim=16, num_layers=1)
        ids = jnp.array([[1, 2, 3, 4] + [0] * 12])
        mask_a = jnp.array([[1, 1, 1, 1] + [0] * 12])
        mask_b = jnp.ones((1, 16), jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), ids, mask_a)
        out_a = enc.apply(params, ids, mask_a)
        out_b = enc.apply(params, ids, mask_b)
        assert out_a.shape == (1, 16, 32)
        # masking padded keys must change the contextualized output
        assert float(jnp.abs(out_a - out_b).max()) > 1e-6

    def test_bad_head_dim_raises(self):
        enc = TextEncoder(vocab_len=160, seq_len=8, dim=32,
                          attention_head_dim=7, num_layers=1)
        with pytest.raises(ValueError):
            enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                     jnp.ones((1, 8), jnp.int32))


class TestUNetParityQuirks:
    def test_no_proj_out_param(self, tiny_model_and_params):
        """The spatial transformer must NOT create proj_out by default
        (reference transformer_1d.py:275-279 leaves it unused)."""
        _, params, _ = tiny_model_and_params
        flat = jax.tree_util.tree_leaves_with_path(params)
        names = ["/".join(str(k) for k in path) for path, _ in flat]
        assert not any("proj_out" in n for n in names)
        assert any("proj_in" in n for n in names)

    def test_cross_attention_unmasked(self, tiny_model_and_params):
        """UNet output must NOT depend on the text mask beyond the text
        encoder (reference quirk: mask never reaches UNet cross-attn)."""
        model, params, (sample, t, ids, mask) = tiny_model_and_params
        # Same text context, different "mask" fed only to the UNet is not
        # possible through the public API (mask feeds the text encoder), so
        # instead check the UNet directly with identical context.
        cfg = TINY
        unet = UNet1DCondition(cfg)
        ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64))
        uparams = unet.init(jax.random.PRNGKey(0), sample, t, ctx)
        out = unet.apply(uparams, sample, t, ctx)
        assert out.shape == sample.shape


class TestFullModel:
    def test_forward_shape_and_finite(self, tiny_model_and_params):
        model, params, args = tiny_model_and_params
        out = model.apply(params, *args)
        assert out.shape == (2, TINY.sample_size, 8)
        assert bool(jnp.isfinite(out).all())

    def test_timestep_conditioning_matters(self, tiny_model_and_params):
        model, params, (sample, _, ids, mask) = tiny_model_and_params
        out_a = model.apply(params, sample, jnp.array([0, 0]), ids, mask)
        out_b = model.apply(params, sample, jnp.array([999, 999]), ids, mask)
        assert float(jnp.abs(out_a - out_b).max()) > 1e-4

    def test_text_conditioning_matters(self, tiny_model_and_params):
        model, params, (sample, t, ids, mask) = tiny_model_and_params
        ids_b = ids.at[:, :4].set(jnp.array([10, 20, 30, 40]))
        out_a = model.apply(params, sample, t, ids, mask)
        out_b = model.apply(params, sample, t, ids_b, mask)
        assert float(jnp.abs(out_a - out_b).max()) > 1e-5

    def test_cross_kv_hoist_is_bit_exact(self, tiny_model_and_params):
        """denoise with precomputed cross-attn k/v (the sampler hoist)
        must equal the in-call projection path exactly."""
        from prompt_tts_tpu.models.unet1d import cross_attention_kv

        model, params, (sample, t, ids, mask) = tiny_model_and_params
        ctx = model.apply(params, ids, mask,
                          method=TTSSingleSpeaker.encode_text)
        eps_ref = model.apply(params, sample, t, ctx,
                              method=TTSSingleSpeaker.denoise)
        kv = cross_attention_kv(params["params"]["unet"], ctx, TINY)
        eps_kv = model.apply(params, sample, t, ctx, cross_kv=kv,
                             method=TTSSingleSpeaker.denoise)
        np.testing.assert_array_equal(np.asarray(eps_ref),
                                      np.asarray(eps_kv))

    def test_gradients_flow_to_all_params(self, tiny_model_and_params):
        model, params, args = tiny_model_and_params

        def loss(p):
            return (model.apply(p, *args) ** 2).mean()

        grads = jax.grad(loss)(params)
        zero_grads = [
            "/".join(str(k) for k in path)
            for path, g in jax.tree_util.tree_leaves_with_path(grads)
            if float(jnp.abs(g).max()) == 0.0
        ]
        # No dead parameters: unlike the reference (which needs DDP
        # find_unused_parameters for its unused proj_out), every param
        # here must receive gradient.
        assert zero_grads == [], zero_grads

    def test_dropout_rng_changes_training_output(self):
        cfg = ModelConfig(
            block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
            attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
            sample_size=48, layers_per_block=1, unet_num_heads=4,
            text_encoder_dropout=0.5,
        )
        model = TTSSingleSpeaker(cfg)
        B, T, S = 1, 48, 32
        args = (jnp.ones((B, T, 8)), jnp.array([5]),
                jnp.zeros((B, S), jnp.int32), jnp.ones((B, S), jnp.int32))
        params = model.init(jax.random.PRNGKey(0), *args)
        out1 = model.apply(params, *args, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(1)})
        out2 = model.apply(params, *args, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(2)})
        assert float(jnp.abs(out1 - out2).max()) > 1e-6

    def test_odd_sample_length(self):
        cfg = ModelConfig(
            block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
            attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
            sample_size=45, layers_per_block=1, unet_num_heads=4,
        )
        model = TTSSingleSpeaker(cfg)
        args = (jnp.zeros((1, 45, 8)), jnp.array([3]),
                jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), jnp.int32))
        params = model.init(jax.random.PRNGKey(0), *args)
        out = model.apply(params, *args)
        assert out.shape == (1, 45, 8)

    def test_bf16_compute(self, tiny_model_and_params):
        _, params, args = tiny_model_and_params
        model_bf16 = TTSSingleSpeaker(TINY, dtype=jnp.bfloat16)
        out = model_bf16.apply(params, *args)
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
