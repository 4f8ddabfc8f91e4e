"""Torch-checkpoint EXPORT tests (models/export.py, cli/export_checkpoint).

The inverse of the converter: params trained here must load back into the
original torch repo's ``TTSSingleSpeaker`` (reference train.py:139-144
save format). Validated against the same diffusers-0.15-named torch twin
the converter's golden test uses (tools/torch_twin.py), plus an exact
export->convert round trip and the reference's ``inv_freq`` buffer
formula (reference tts/models.py:24-29).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import ModelConfig
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.models.convert import convert_reference_state_dict
from prompt_tts_tpu.models.export import (
    export_reference_state_dict,
    save_reference_checkpoint,
)

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


def _init_params(cfg=CFG, seed=0):
    model = TTSSingleSpeaker(cfg)
    ids = jnp.zeros((1, cfg.cmu_seq_len), jnp.int32)
    return model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, cfg.sample_size, cfg.in_channels)),
        jnp.zeros((1,), jnp.int32), ids, jnp.ones_like(ids))


class TestExportRoundTrip:
    def test_export_then_convert_is_identity(self):
        """flax -> torch naming -> flax is bit-exact for every leaf."""
        params = _init_params()
        sd = export_reference_state_dict(params, CFG)
        back = convert_reference_state_dict(sd)

        want = {jax.tree_util.keystr(p): np.asarray(l) for p, l in
                jax.tree_util.tree_leaves_with_path(params)}
        got = {jax.tree_util.keystr(p): np.asarray(l) for p, l in
               jax.tree_util.tree_leaves_with_path(back)}
        assert set(want) == set(got)
        for k in want:
            np.testing.assert_array_equal(want[k], got[k], err_msg=k)

    def test_convert_then_export_matches_torch_state_dict(self):
        """torch twin -> flax -> torch naming: every real tensor bit-exact;
        the synthesized proj_out keys shape-match the twin's."""
        ref = RefTTS(CFG)
        sd0 = {k: v.numpy() for k, v in ref.state_dict().items()}
        sd1 = export_reference_state_dict(
            convert_reference_state_dict(ref.state_dict()), CFG)

        # exported extra = the pos-emb buffer the twin computes functionally
        assert set(sd1) - set(sd0) == {
            "text_encoder.pos_embedding.penc.inv_freq"}
        assert set(sd0) - set(sd1) == set()
        for k, v in sd0.items():
            assert np.asarray(sd1[k]).shape == v.shape, k
            if ".proj_out." not in k:  # proj_out is dead-in-reference: zeros
                np.testing.assert_array_equal(np.asarray(sd1[k]), v,
                                              err_msg=k)


class TestTorchLoadability:
    def test_twin_loads_exported_and_forward_matches(self, tmp_path):
        """The strongest check: a torch model strict-loads the exported
        checkpoint and produces the SAME output as the flax model."""
        params = _init_params(seed=3)
        path = str(tmp_path / "ckpt_0.pt")
        n = save_reference_checkpoint(params, CFG, path)
        assert n > 400  # full model, not a partial dict

        ref = RefTTS(CFG).eval()
        loaded = torch.load(path, map_location="cpu", weights_only=True)
        res = ref.load_state_dict(loaded, strict=False)
        assert res.missing_keys == []
        # the twin computes pos-emb functionally; the REAL reference model
        # has this buffer (tts/models.py:29) and strict-loads it
        assert res.unexpected_keys == [
            "text_encoder.pos_embedding.penc.inv_freq"]

        B, T, S = 2, CFG.sample_size, CFG.cmu_seq_len
        rng = np.random.default_rng(1)
        sample = rng.normal(size=(B, 8, T)).astype(np.float32)
        t = np.array([3, 800], np.int64)
        ids = rng.integers(0, 150, (B, S)).astype(np.int64)
        mask = np.ones((B, S), np.int64)
        mask[1, S // 3:] = 0

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(sample), torch.from_numpy(t),
                          torch.from_numpy(ids), torch.from_numpy(mask))
        out = TTSSingleSpeaker(CFG).apply(
            params, jnp.asarray(sample.transpose(0, 2, 1)),
            jnp.asarray(t.astype(np.int32)),
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)))
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 2, 1), ref_out.numpy(),
            atol=5e-4, rtol=1e-3)

    def test_inv_freq_matches_reference_formula(self):
        sd = export_reference_state_dict(_init_params(), CFG)
        channels = int(np.ceil(CFG.cmu_seq_len / 2) * 2)
        want = 1.0 / (10000.0 ** (
            torch.arange(0, channels, 2).float() / channels))
        np.testing.assert_allclose(
            sd["text_encoder.pos_embedding.penc.inv_freq"],
            want.numpy(), rtol=1e-6)


class TestExportGuards:
    def test_unmappable_params_raise(self):
        import flax
        params = flax.core.unfreeze(_init_params())
        params["params"]["prompt_encoder"] = {
            "proj": {"kernel": np.zeros((4, 4), np.float32)}}
        with pytest.raises(ValueError, match="prompt_encoder"):
            export_reference_state_dict(params, CFG)

    def test_cli_rejects_prompted_config(self, tmp_path):
        import dataclasses

        from prompt_tts_tpu.cli.export_checkpoint import main
        from prompt_tts_tpu.config import Config

        cfg = Config(model=dataclasses.replace(CFG, prompt_conditioning=True))
        cfg_path = tmp_path / "cfg.json"
        cfg.to_json(str(cfg_path))
        with pytest.raises(SystemExit, match="single-speaker"):
            main(["--ckpt_dir", str(tmp_path / "ckpt"), "--out",
                  str(tmp_path / "x.pt"), "--config_file", str(cfg_path)])


class TestExportCLI:
    def test_train_then_export_cli(self, tmp_path):
        """End-to-end: train a couple of steps, export via the CLI, verify
        the .pt converts back to the restored params bit-exactly."""
        from prompt_tts_tpu.cli.export_checkpoint import main
        from prompt_tts_tpu.config import Config, TrainConfig
        from prompt_tts_tpu.data import SyntheticDataset
        from prompt_tts_tpu.train.loop import Trainer

        cfg = Config(model=CFG,
                     train=TrainConfig(batch_size=8, num_train_epochs=1,
                                       learning_rate=1e-3, lr_warmup_steps=0,
                                       ema_decay=0.9))
        data = SyntheticDataset(n=8, frames=CFG.sample_size,
                                max_seq_length=CFG.cmu_seq_len)
        t = Trainer(cfg, data, log_dir=str(tmp_path / "logs"),
                    ckpt_dir=str(tmp_path / "ckpt"))
        t.train(epochs=1)

        cfg_path = tmp_path / "cfg.json"
        cfg.to_json(str(cfg_path))

        out = str(tmp_path / "ckpt_1.pt")
        main(["--ckpt_dir", str(tmp_path / "ckpt"), "--out", out,
              "--ema", "--config_file", str(cfg_path)])

        back = convert_reference_state_dict(
            torch.load(out, map_location="cpu", weights_only=True))
        want = {jax.tree_util.keystr(p): np.asarray(l) for p, l in
                jax.tree_util.tree_leaves_with_path(t.state.ema_params)}
        got = {jax.tree_util.keystr(p): np.asarray(l) for p, l in
               jax.tree_util.tree_leaves_with_path(back["params"])}
        want = {k.removeprefix("['params']"): v for k, v in want.items()}
        for k in got:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
