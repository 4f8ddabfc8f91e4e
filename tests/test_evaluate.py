"""Evaluation CLI + per-timestep eval step (cli/evaluate.py,
train.step.make_eval_step_at).

The reference has no evaluation tooling (train.py logs only running train
loss); these tests cover the checkpoint-scoring surface: deterministic
eval loss over a code tar, the fixed-grid timestep profile, EMA param
selection, and the prompt-conditioned data plumbing (prompt_frames wired
through the dataset from the config — the same wiring cli/train.py uses).
"""

import io
import json
import tarfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import Config, ModelConfig, TrainConfig
from prompt_tts_tpu.data import SyntheticDataset

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

# batch 8: Trainer shards over the 8-device CPU mesh (conftest), so the
# train batch must divide the device count
TRAIN = TrainConfig(batch_size=8, num_train_epochs=1, learning_rate=1e-3,
                    lr_warmup_steps=0, ema_decay=0.9)


@pytest.fixture(scope="module")
def corpus_tar(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("evalset")
    path = str(tmp / "corpus.tar")
    rng = np.random.default_rng(7)
    with tarfile.open(path, "w") as tf:
        for i in range(13):
            stem = f"LJ{i:03d}"
            codes = rng.integers(0, 1024, (8, TINY.sample_size)).astype(
                np.int64)
            buf = io.BytesIO()
            np.save(buf, codes)
            payloads = [(stem + ".npy", buf.getvalue()),
                        (stem + ".txt", f"utterance {i}".encode()),
                        (stem + ".len.txt",
                         str(float(TINY.sample_size)).encode())]
            for name, data in payloads:
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    return path


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    from prompt_tts_tpu.train.loop import Trainer
    tmp = tmp_path_factory.mktemp("evalckpt")
    cfg = Config(model=TINY, train=TRAIN)
    data = SyntheticDataset(n=8, frames=TINY.sample_size,
                            max_seq_length=TINY.cmu_seq_len)
    t = Trainer(cfg, data, log_dir=str(tmp / "logs"),
                ckpt_dir=str(tmp / "ckpt"))
    t.train(epochs=1)
    cfg_path = tmp / "cfg.json"
    cfg.to_json(str(cfg_path))
    return str(tmp / "ckpt"), str(cfg_path)


def _run(argv, capsys):
    from prompt_tts_tpu.cli.evaluate import main
    main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


class TestEvaluateCLI:
    def test_scores_and_profile(self, corpus_tar, trained_ckpt, capsys):
        ckpt, cfg = trained_ckpt
        res = _run(["--data_file", corpus_tar, "--ckpt_dir", ckpt,
                    "--config_file", cfg, "--timesteps", "50,900"],
                   capsys)
        assert res["num_batches"] == 1  # 13 items, batch 8, drop_last
        assert np.isfinite(res["eval_loss"])
        assert set(res["timestep_profile"]) == {"50", "900"}
        for v in res["timestep_profile"].values():
            assert np.isfinite(v)
        # the two grid points are genuinely different evaluations
        assert (res["timestep_profile"]["50"]
                != res["timestep_profile"]["900"])

    def test_deterministic_across_runs(self, corpus_tar, trained_ckpt,
                                       capsys):
        ckpt, cfg = trained_ckpt
        argv = ["--data_file", corpus_tar, "--ckpt_dir", ckpt,
                "--config_file", cfg, "--timesteps", ""]
        a = _run(argv, capsys)
        b = _run(argv, capsys)
        assert a["eval_loss"] == b["eval_loss"]

    def test_ema_differs_from_raw(self, corpus_tar, trained_ckpt, capsys):
        ckpt, cfg = trained_ckpt
        base = ["--data_file", corpus_tar, "--ckpt_dir", ckpt,
                "--config_file", cfg, "--timesteps", ""]
        raw = _run(base, capsys)
        ema = _run(base + ["--ema"], capsys)
        assert ema["params"] == "ema"
        # decay 0.9 after a couple of steps: EMA != raw params
        assert ema["eval_loss"] != raw["eval_loss"]

    def test_bad_timestep_grid_rejected(self, corpus_tar, trained_ckpt,
                                        capsys):
        ckpt, cfg = trained_ckpt
        with pytest.raises(SystemExit, match="timesteps"):
            _run(["--data_file", corpus_tar, "--ckpt_dir", ckpt,
                  "--config_file", cfg, "--timesteps", "1000"], capsys)


class TestEvalStepAt:
    def test_traced_timestep_one_program(self):
        """One jitted program serves the whole grid (t is traced), and the
        fixed-t loss is the plain eval-step computation at that t."""
        from prompt_tts_tpu.diffusion.schedule import linear_schedule
        from prompt_tts_tpu.models import TTSSingleSpeaker
        from prompt_tts_tpu.train import make_eval_step_at
        from prompt_tts_tpu.diffusion.schedule import add_noise

        model = TTSSingleSpeaker(TINY)
        B = 2
        batch = {
            "codes": np.random.default_rng(0).normal(
                size=(B, TINY.sample_size, 8)).astype(np.float32),
            "text_ids": np.zeros((B, TINY.cmu_seq_len), np.int32),
            "text_mask": np.ones((B, TINY.cmu_seq_len), np.int32),
        }
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["codes"]),
            jnp.zeros((B,), jnp.int32), jnp.asarray(batch["text_ids"]),
            jnp.asarray(batch["text_mask"]))
        schedule = linear_schedule()
        fn = jax.jit(make_eval_step_at(model.apply, schedule))
        rng = jax.random.PRNGKey(3)

        l_lo = float(fn(params, batch, rng, 25))
        l_hi = float(fn(params, batch, rng, 975))
        assert np.isfinite(l_lo) and np.isfinite(l_hi) and l_lo != l_hi
        # only ONE compile happened for both t values
        assert fn._cache_size() == 1

        # reference computation at fixed t, same rng stream
        codes = jnp.asarray(batch["codes"])
        noise = jax.random.normal(rng, codes.shape, codes.dtype)
        noisy = add_noise(schedule, codes, noise,
                          jnp.full((B,), 25, jnp.int32))
        pred = model.apply(params, noisy, jnp.full((B,), 25, jnp.int32),
                           jnp.asarray(batch["text_ids"]),
                           jnp.asarray(batch["text_mask"]),
                           deterministic=True)
        want = float(jnp.mean((pred - noise) ** 2))
        np.testing.assert_allclose(l_lo, want, rtol=1e-5)


class TestPromptedEvaluate:
    def test_prompted_family_plumbs_prompt_frames(self, corpus_tar,
                                                  tmp_path, capsys):
        import dataclasses

        from prompt_tts_tpu.train.loop import Trainer
        tiny_p = dataclasses.replace(
            TINY, prompt_conditioning=True, prompt_frames=16,
            prompt_encoder_layers=1, prompt_tokens=8)
        cfg = Config(model=tiny_p, train=TRAIN)
        data = SyntheticDataset(n=8, frames=TINY.sample_size,
                                max_seq_length=TINY.cmu_seq_len,
                                prompt_frames=16)
        t = Trainer(cfg, data, log_dir=str(tmp_path / "logs"),
                    ckpt_dir=str(tmp_path / "ckpt"))
        t.train(epochs=1)
        cfg_path = tmp_path / "cfg.json"
        cfg.to_json(str(cfg_path))

        res = _run(["--data_file", corpus_tar,
                    "--ckpt_dir", str(tmp_path / "ckpt"),
                    "--config_file", str(cfg_path), "--timesteps", "500"],
                   capsys)
        assert np.isfinite(res["eval_loss"])
        assert np.isfinite(res["timestep_profile"]["500"])
