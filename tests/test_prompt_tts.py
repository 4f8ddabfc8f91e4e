"""Prompt-conditioned (multi-speaker) model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prompt_tts_tpu.config import Config, ModelConfig, TrainConfig
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import PromptEncoder, TTSPromptSpeaker
from prompt_tts_tpu.parallel.mesh import make_mesh, shard_batch
from prompt_tts_tpu.train import (
    create_train_state,
    jit_train_step,
    make_train_step,
)

TINY = ModelConfig(
    block_out_channels=(32, 64, 64, 64),
    cross_attention_dim=64,
    attention_head_dim=32,
    text_encoder_layers=1,
    cmu_seq_len=32,
    sample_size=48,
    layers_per_block=1,
    unet_num_heads=4,
    prompt_conditioning=True,
    prompt_frames=24,
    prompt_encoder_layers=1,
    prompt_tokens=8,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = TTSPromptSpeaker(TINY)
    B = 2
    args = (
        jax.random.normal(jax.random.PRNGKey(42), (B, 48, 8)),
        jnp.array([5, 900]),
        jnp.zeros((B, 32), jnp.int32),
        jnp.ones((B, 32), jnp.int32),
        jax.random.normal(jax.random.PRNGKey(7), (B, 24, 8)) * 0.5,
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    return model, params, args


class TestPromptEncoder:
    def test_shapes(self):
        enc = PromptEncoder(dim=64, speaker_emb_dim=128, num_layers=1,
                            num_tokens=8, num_heads=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 8))
        params = enc.init(jax.random.PRNGKey(1), x)
        tokens, speaker = enc.apply(params, x)
        assert tokens.shape == (2, 8, 64)
        assert speaker.shape == (2, 128)

    def test_static_token_count_for_any_length(self):
        enc = PromptEncoder(dim=64, speaker_emb_dim=128, num_layers=1,
                            num_tokens=8, num_heads=4)
        x24 = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 8))
        x96 = jax.random.normal(jax.random.PRNGKey(0), (1, 96, 8))
        params = enc.init(jax.random.PRNGKey(1), x24)
        t24, _ = enc.apply(params, x24)
        t96, _ = enc.apply(params, x96)
        assert t24.shape == t96.shape == (1, 8, 64)


class TestPromptModel:
    def test_forward(self, model_and_params):
        model, params, args = model_and_params
        out = model.apply(params, *args)
        assert out.shape == (2, 48, 8)
        assert bool(jnp.isfinite(out).all())

    def test_prompt_conditioning_matters(self, model_and_params):
        model, params, args = model_and_params
        sample, t, ids, mask, prompt = args
        out_a = model.apply(params, sample, t, ids, mask, prompt)
        out_b = model.apply(params, sample, t, ids, mask, prompt * -1.0)
        assert float(jnp.abs(out_a - out_b).max()) > 1e-5

    def test_context_includes_prompt_tokens(self, model_and_params):
        model, params, args = model_and_params
        _, _, ids, mask, prompt = args
        ctx, speaker = model.apply(
            params, ids, mask, prompt,
            method=TTSPromptSpeaker.encode_conditioning)
        assert ctx.shape == (2, 32 + TINY.prompt_tokens, 64)
        assert speaker.shape == (2, TINY.block_out_channels[0] * 4)


class TestPromptTraining:
    def test_train_step_with_prompt_batch(self):
        mesh = make_mesh()
        model = TTSPromptSpeaker(TINY)
        data = SyntheticDataset(n=16, frames=48, max_seq_length=32,
                                prompt_frames=24)
        batch = next(data.batches(8))
        assert batch["prompt"].shape == (8, 24, 8)

        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["codes"][:1]), jnp.zeros((1,), jnp.int32),
            jnp.asarray(batch["text_ids"][:1]),
            jnp.asarray(batch["text_mask"][:1]),
            jnp.asarray(batch["prompt"][:1]))
        tcfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=0,
                           lr_scheduler="constant")
        state = create_train_state(model, params, tcfg, 100)
        step = jit_train_step(
            make_train_step(model.apply, linear_schedule()), mesh)

        sharded = shard_batch(batch, mesh)
        rng = jax.random.PRNGKey(1)
        losses = []
        for _ in range(15):
            state, m = step(state, sharded, rng)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], (losses[0], losses[-1])


class TestPromptedCheckpointRestore:
    def test_cli_restore_helper_handles_prompted_family(self, tmp_path):
        """cli/_common.restore_model_params builds the restore template for
        the PROMPT-CONDITIONED family too (synthesize --ckpt_dir used to
        hardcode TTSSingleSpeaker and crash on these checkpoints), for both
        the raw and --ema param picks."""
        from prompt_tts_tpu.cli._common import restore_model_params
        from prompt_tts_tpu.train.loop import Trainer

        cfg = Config(model=TINY,
                     train=TrainConfig(batch_size=8, num_train_epochs=1,
                                       learning_rate=1e-3, lr_warmup_steps=0,
                                       ema_decay=0.9))
        data = SyntheticDataset(n=8, frames=48, max_seq_length=32,
                                prompt_frames=24)
        t = Trainer(cfg, data, log_dir=str(tmp_path / "logs"),
                    ckpt_dir=str(tmp_path / "ckpt"))
        t.train(epochs=1)

        raw, step = restore_model_params(str(tmp_path / "ckpt"), cfg)
        ema, _ = restore_model_params(str(tmp_path / "ckpt"), cfg, ema=True)
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(raw)[0]),
            np.asarray(jax.tree.leaves(t.state.params)[0]))
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(ema)[0]),
            np.asarray(jax.tree.leaves(t.state.ema_params)[0]))
        # prompt-encoder subtree restored (the family-specific part)
        assert any("prompt" in jax.tree_util.keystr(p).lower()
                   for p, _ in jax.tree_util.tree_leaves_with_path(raw))

    def test_ema_request_fails_fast_without_restore(self, tmp_path):
        from prompt_tts_tpu.cli._common import restore_model_params
        cfg = Config(model=TINY, train=TrainConfig(batch_size=8))
        with pytest.raises(SystemExit, match="ema_params"):
            restore_model_params(str(tmp_path / "empty"), cfg, ema=True)
