"""Config schema tests.

The reference consumes a flat, unvalidated JSON (``run_code/1d_config.json``,
gitignored — schema reconstructed in SURVEY.md §2c from train.py:23 and
tts/models.py:129-148).  This framework accepts that flat form verbatim,
validates it, and additionally round-trips its own nested ``to_json`` form.
"""

import dataclasses
import json

import pytest

from prompt_tts_tpu.config import Config, ModelConfig, TrainConfig


TINY = dict(
    block_out_channels=[32, 64, 64, 64],
    cross_attention_dim=64,
    attention_head_dim=32,
    text_encoder_layers=1,
    cmu_seq_len=32,
    sample_size=48,
    layers_per_block=1,
    unet_num_heads=4,
)


class TestFlatReferenceSchema:
    def test_flat_load_splits_model_and_train_keys(self, tmp_path):
        raw = dict(TINY)
        raw.update(gradient_accumulation_steps=2, num_train_epochs=3,
                   lr_scheduler="linear", lr_warmup_steps=7,
                   save_per_epochs=2, ema_decay=0.99)
        p = tmp_path / "1d_config.json"
        p.write_text(json.dumps(raw))
        cfg = Config.from_json(str(p))
        assert cfg.model.block_out_channels == (32, 64, 64, 64)
        assert cfg.model.cross_attention_dim == 64
        assert cfg.train.gradient_accumulation_steps == 2
        assert cfg.train.num_train_epochs == 3
        assert cfg.train.lr_scheduler == "linear"
        assert cfg.train.ema_decay == 0.99

    def test_unknown_keys_ignored_like_reference(self):
        # the reference does no validation at all (train.py:23 json.load);
        # unknown keys must not crash the load
        cfg = Config.from_flat_dict(dict(TINY, mystery_key=1))
        assert cfg.model.sample_size == 48

    def test_lists_become_tuples(self):
        cfg = Config.from_flat_dict(dict(TINY))
        assert isinstance(cfg.model.block_out_channels, tuple)
        assert isinstance(cfg.model.down_block_types, tuple)


class TestNestedRoundTrip:
    def test_to_json_round_trips(self, tmp_path):
        """to_json writes the nested form; from_json must load it back
        field-for-field (not silently fall through to defaults)."""
        cfg = Config(
            model=ModelConfig(**{k: tuple(v) if isinstance(v, list) else v
                                 for k, v in TINY.items()}),
            train=TrainConfig(batch_size=4, learning_rate=1e-3,
                              ema_decay=0.9, cond_dropout_prob=0.1),
        )
        p = tmp_path / "cfg.json"
        cfg.to_json(str(p))
        loaded = Config.from_json(str(p))
        assert dataclasses.asdict(loaded) == dataclasses.asdict(cfg)

    def test_nested_partial_sections(self):
        cfg = Config.from_flat_dict({"train": {"batch_size": 2}})
        assert cfg.train.batch_size == 2
        assert cfg.model.sample_size == ModelConfig().sample_size


class TestValidation:
    def test_vocab_floor(self):
        with pytest.raises(ValueError):
            ModelConfig(cmu_vocab_len=100)

    def test_head_dim_divides(self):
        with pytest.raises(ValueError):
            ModelConfig(cross_attention_dim=100, attention_head_dim=64)

    def test_block_arity_mismatch(self):
        with pytest.raises(ValueError):
            ModelConfig(block_out_channels=(256, 512),
                        down_block_types=("DownBlock1D",),
                        up_block_types=("UpBlock1D",))

    def test_projection_requires_dim(self):
        with pytest.raises(ValueError):
            ModelConfig(class_embed_type="projection")

    def test_ema_decay_range(self):
        # 1.0 would freeze the EMA at the random init forever
        with pytest.raises(ValueError, match="ema_decay"):
            TrainConfig(ema_decay=1.0)
        with pytest.raises(ValueError, match="ema_decay"):
            TrainConfig(ema_decay=-0.1)
        assert TrainConfig(ema_decay=0.9999).ema_decay == 0.9999

    def test_cond_dropout_range(self):
        with pytest.raises(ValueError, match="cond_dropout_prob"):
            TrainConfig(cond_dropout_prob=1.0)

    def test_accumulation_floor(self):
        with pytest.raises(ValueError, match="accumulation"):
            TrainConfig(gradient_accumulation_steps=0)

    def test_nested_sections_cannot_cross_route(self):
        # a train-section key that happens to name a model field must not
        # leak into ModelConfig (and vice versa)
        cfg = Config.from_flat_dict(
            {"model": {"sample_size": 48}, "train": {"sample_size": 999,
                                                     "batch_size": 2}})
        assert cfg.model.sample_size == 48
        assert cfg.train.batch_size == 2
