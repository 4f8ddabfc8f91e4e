"""Reference-checkpoint converter test.

Builds a torch twin of the reference ``TTSSingleSpeaker`` with
diffusers-0.15-era module NAMES (attn1.to_q, ff.net.0.proj, resnets.N,
attentions.N, ...) and reference-documented forward semantics (SURVEY.md
§2a, PARITY.md), then checks that ``convert_reference_state_dict`` maps its
``state_dict()`` onto the Flax model with numerically identical outputs.

This is the path a user takes to run a reference-trained ``ckpt_N.pt``
here.  The twin is a test fixture modeling the torch dependency's naming —
the reference repo itself ships no checkpoints or config.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import ModelConfig
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.models.convert import convert_reference_state_dict

torch.manual_seed(0)

import sys
sys.path.insert(0, "tools")
from torch_twin import RefTTS  # noqa: E402

CFG = ModelConfig(
    cmu_vocab_len=160,
    cmu_seq_len=24,
    cross_attention_dim=32,
    attention_head_dim=16,
    text_encoder_layers=2,
    text_encoder_dropout=0.0,
    sample_size=32,
    block_out_channels=(16, 32, 32, 32),
    layers_per_block=1,
    unet_num_heads=4,
    norm_num_groups=8,
)


class TestReferenceConversion:
    def test_full_model_outputs_match(self):
        ref = RefTTS(CFG).eval()
        sd = ref.state_dict()

        params = convert_reference_state_dict(sd)
        model = TTSSingleSpeaker(CFG)

        B, T, S = 2, CFG.sample_size, CFG.cmu_seq_len
        rng = np.random.default_rng(0)
        sample = rng.normal(size=(B, 8, T)).astype(np.float32)
        t = np.array([7, 450], np.int64)
        ids = rng.integers(0, 150, (B, S)).astype(np.int64)
        mask = np.ones((B, S), np.int64)
        mask[0, S // 2:] = 0

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(sample), torch.from_numpy(t),
                          torch.from_numpy(ids), torch.from_numpy(mask))

        out = model.apply(
            params,
            jnp.asarray(sample.transpose(0, 2, 1)),
            jnp.asarray(t.astype(np.int32)),
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)))

        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 2, 1), ref_out.numpy(),
            atol=5e-4, rtol=1e-3)

    def test_all_flax_params_covered(self):
        """Every param the Flax model expects must come from the state dict
        (no silently random leaves)."""
        ref = RefTTS(CFG)
        converted = convert_reference_state_dict(ref.state_dict())

        model = TTSSingleSpeaker(CFG)
        expected = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, CFG.sample_size, 8)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, CFG.cmu_seq_len), jnp.int32),
            jnp.ones((1, CFG.cmu_seq_len), jnp.int32))

        exp_paths = {
            "/".join(str(getattr(k, "key", k)) for k in p): l.shape
            for p, l in jax.tree_util.tree_leaves_with_path(expected)}
        got_paths = {
            "/".join(str(getattr(k, "key", k)) for k in p): l.shape
            for p, l in jax.tree_util.tree_leaves_with_path(converted)}
        missing = set(exp_paths) - set(got_paths)
        extra = set(got_paths) - set(exp_paths)
        assert not missing, f"missing params: {sorted(missing)[:8]}"
        assert not extra, f"extra params: {sorted(extra)[:8]}"
        mismatched = {k: (exp_paths[k], got_paths[k])
                      for k in exp_paths if exp_paths[k] != got_paths[k]}
        assert not mismatched, mismatched


class TestWarmStart:
    """`train --init_from_ref ckpt_N.pt`: continue a reference-trained run
    here (Trainer(init_params=...) adopts the converted tree)."""

    def _dataset(self):
        from prompt_tts_tpu.data import SyntheticDataset
        return SyntheticDataset(n=8, frames=CFG.sample_size,
                                max_seq_length=CFG.cmu_seq_len)

    def test_trainer_adopts_converted_params(self, tmp_path):
        from prompt_tts_tpu.config import Config, TrainConfig
        from prompt_tts_tpu.train.loop import Trainer

        ref = RefTTS(CFG)
        converted = convert_reference_state_dict(ref.state_dict())
        cfg = Config(model=CFG,
                     train=TrainConfig(batch_size=8, num_train_epochs=1,
                                       learning_rate=1e-3,
                                       lr_warmup_steps=0))
        t = Trainer(cfg, self._dataset(), log_dir=str(tmp_path / "logs"),
                    init_params=converted)
        # the state's params ARE the converted weights, not a fresh init
        got = jax.tree_util.tree_leaves_with_path(t.state.params)
        want = {jax.tree_util.keystr(p): np.asarray(l) for p, l in
                jax.tree_util.tree_leaves_with_path(converted)}
        for p, leaf in got:
            np.testing.assert_array_equal(
                np.asarray(leaf), want[jax.tree_util.keystr(p)],
                err_msg=jax.tree_util.keystr(p))
        # and training proceeds from them
        loss = t.train(epochs=1)
        assert math.isfinite(loss)

    def test_mismatched_config_rejected(self, tmp_path):
        from prompt_tts_tpu.config import Config, TrainConfig
        from prompt_tts_tpu.train.loop import Trainer

        ref = RefTTS(CFG)
        converted = convert_reference_state_dict(ref.state_dict())
        import dataclasses
        other = dataclasses.replace(CFG, block_out_channels=(16, 16, 32, 32))
        cfg = Config(model=other, train=TrainConfig(batch_size=4))
        with pytest.raises(ValueError, match="init_params"):
            Trainer(cfg, self._dataset(), log_dir=str(tmp_path / "logs"),
                    init_params=converted)

    def test_cli_rejects_resume_plus_init(self):
        from prompt_tts_tpu.cli.train import main as train_main
        with pytest.raises(SystemExit, match="mutually exclusive"):
            train_main(["--smoke", "--resume", "--init_from_ref", "x.pt"])
