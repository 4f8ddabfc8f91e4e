"""Training tests: loss decreases, sharding over the 8-device CPU mesh,
checkpoint save/restore round trip, LR schedules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import Config, ModelConfig, TrainConfig
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.parallel.mesh import make_mesh, shard_batch
from prompt_tts_tpu.train import (
    CheckpointManager,
    Trainer,
    create_train_state,
    jit_train_step,
    make_train_step,
)
from prompt_tts_tpu.train.lr import get_schedule

TINY_MODEL = ModelConfig(
    block_out_channels=(32, 64, 64, 64),
    cross_attention_dim=64,
    attention_head_dim=32,
    text_encoder_layers=1,
    cmu_seq_len=32,
    sample_size=48,
    layers_per_block=1,
    unet_num_heads=4,
)


def tiny_config(**train_kw):
    defaults = dict(learning_rate=1e-3, batch_size=8, num_train_epochs=1,
                    lr_warmup_steps=0, lr_scheduler="constant")
    defaults.update(train_kw)
    return Config(model=TINY_MODEL, train=TrainConfig(**defaults))


@pytest.fixture(scope="module")
def synth_data():
    return SyntheticDataset(n=16, frames=48, max_seq_length=32)


class TestLRSchedules:
    @pytest.mark.parametrize("name", [
        "constant", "constant_with_warmup", "linear", "cosine",
        "cosine_with_restarts", "polynomial",
    ])
    def test_schedule_shapes(self, name):
        s = get_schedule(name, 1e-4, num_warmup_steps=10,
                         num_training_steps=100)
        vals = [float(s(i)) for i in [0, 5, 10, 50, 100]]
        assert all(np.isfinite(v) and v >= 0 for v in vals)
        if name != "constant":
            assert vals[0] == 0.0 or vals[0] < 1e-4  # warming up
        assert abs(float(s(10)) - 1e-4) < 1e-9  # warmup ends at peak

    @pytest.mark.parametrize("name", [
        "constant", "constant_with_warmup", "linear", "cosine",
        "cosine_with_restarts", "polynomial",
    ])
    def test_zero_warmup_first_step_at_full_lr(self, name):
        """diffusers semantics at num_warmup_steps=0: the warmup branch is
        unreachable, so step 0 already runs at full lr. A bare
        min(1, step/warmup) form instead silently zeroes the FIRST
        optimizer update (regression: constant_with_warmup did this)."""
        s = get_schedule(name, 1e-4, num_warmup_steps=0,
                         num_training_steps=100)
        assert float(s(0)) == pytest.approx(1e-4, rel=1e-6)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            get_schedule("bogus", 1e-4)


class TestTrainStep:
    def test_loss_decreases_on_fixed_batch(self, synth_data):
        cfg = tiny_config()
        mesh = make_mesh()
        model = TTSSingleSpeaker(cfg.model)
        sched = linear_schedule()
        batch = next(synth_data.batches(8))
        init_rng = jax.random.PRNGKey(0)
        params = model.init(
            init_rng,
            jnp.asarray(batch["codes"][:1]), jnp.zeros((1,), jnp.int32),
            jnp.asarray(batch["text_ids"][:1]),
            jnp.asarray(batch["text_mask"][:1]),
        )
        state = create_train_state(model, params, cfg.train, 1000)
        step = jit_train_step(make_train_step(model.apply, sched), mesh)

        sharded = shard_batch(batch, mesh)
        rng = jax.random.PRNGKey(1)
        losses = []
        for i in range(30):
            # fixed rng -> identical noise each step: loss must drop
            state, m = step(state, sharded, rng)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]

    def test_remat_step_with_dropout(self, synth_data):
        """--remat regression: jax.checkpoint must not trace the static
        `deterministic` bool (flax Dropout crashes on a traced bool
        whenever any dropout rate is non-zero — the flagship text encoder
        uses 0.1, so this exact combination is the production one)."""
        from dataclasses import replace
        cfg = tiny_config()
        model_cfg = replace(cfg.model, text_encoder_dropout=0.1)
        mesh = make_mesh()
        model = TTSSingleSpeaker(model_cfg)
        sched = linear_schedule()
        batch = next(synth_data.batches(8))
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["codes"][:1]), jnp.zeros((1,), jnp.int32),
            jnp.asarray(batch["text_ids"][:1]),
            jnp.asarray(batch["text_mask"][:1]),
        )
        state = create_train_state(model, params, cfg.train, 1000)
        step = jit_train_step(
            make_train_step(model.apply, sched, remat=True), mesh)
        state, m = step(state, shard_batch(batch, mesh),
                        jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))

    def test_rbg_dropout_stream(self, synth_data):
        """--dropout_rng rbg: the dropout stream on XLA's RngBitGenerator
        (measured 253.8 -> 250.4 ms on the flagship batch-32 step,
        tools/abl_train_opt.py). Must train: finite loss, params move,
        and with ACTIVE dropout the prediction differs from threefry's
        (same weights, same noise — only the dropout bits change)."""
        from dataclasses import replace
        cfg = tiny_config()
        model_cfg = replace(cfg.model, text_encoder_dropout=0.1)
        mesh = make_mesh()
        model = TTSSingleSpeaker(model_cfg)
        sched = linear_schedule()
        batch = next(synth_data.batches(8))
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["codes"][:1]), jnp.zeros((1,), jnp.int32),
            jnp.asarray(batch["text_ids"][:1]),
            jnp.asarray(batch["text_mask"][:1]),
        )
        sharded = shard_batch(batch, mesh)
        rng = jax.random.PRNGKey(1)
        results = {}
        for impl in ("threefry", "rbg"):
            # fresh copy: jit_train_step donates the state, so the first
            # impl's step deletes the buffers under `params`
            p = jax.tree.map(jnp.array, params)
            state = create_train_state(model, p, cfg.train, 1000)
            step = jit_train_step(
                make_train_step(model.apply, sched,
                                dropout_rng_impl=impl), mesh)
            state, m = step(state, sharded, rng)
            assert np.isfinite(float(m["loss"])), impl
            results[impl] = float(m["loss"])
        # same weights/noise/timesteps, different dropout bits
        assert results["threefry"] != results["rbg"]

    def test_batch_sharded_over_data_axis(self, synth_data):
        mesh = make_mesh()
        assert mesh.devices.shape == (8, 1, 1)  # (data, model, seq)
        batch = next(synth_data.batches(8))
        sharded = shard_batch(batch, mesh)
        # each of the 8 CPU devices holds 1 example
        shard_shapes = {
            s.device.id: s.data.shape
            for s in sharded["codes"].addressable_shards
        }
        assert len(shard_shapes) == 8
        assert all(shape[0] == 1 for shape in shard_shapes.values())

    def test_grad_accumulation_steps(self, synth_data):
        cfg = tiny_config(gradient_accumulation_steps=2)
        mesh = make_mesh()
        model = TTSSingleSpeaker(cfg.model)
        sched = linear_schedule()
        batch = next(synth_data.batches(8))
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["codes"][:1]), jnp.zeros((1,), jnp.int32),
            jnp.asarray(batch["text_ids"][:1]),
            jnp.asarray(batch["text_mask"][:1]),
        )
        state = create_train_state(model, params, cfg.train, 1000)
        step = jit_train_step(make_train_step(model.apply, sched), mesh)
        p0 = jax.tree.leaves(state.params)[0].copy()
        sharded = shard_batch(batch, mesh)
        # first micro-step: params must NOT change (accumulating)
        state, _ = step(state, sharded, jax.random.PRNGKey(1))
        p1 = jax.tree.leaves(state.params)[0]
        np.testing.assert_array_equal(p0, p1)
        # second micro-step: update applied
        state, _ = step(state, sharded, jax.random.PRNGKey(2))
        p2 = jax.tree.leaves(state.params)[0]
        assert float(jnp.abs(p2 - p0).max()) > 0


class TestTrainerAndCheckpoint:
    def test_trainer_epoch_and_restore(self, synth_data, tmp_path):
        cfg = tiny_config(num_train_epochs=1)
        trainer = Trainer(
            cfg, synth_data,
            log_dir=str(tmp_path / "logs"),
            ckpt_dir=str(tmp_path / "ckpt"),
        )
        loss = trainer.train(epochs=1)
        assert np.isfinite(loss)
        assert trainer.ckpt.latest_step() == trainer.global_step

        # deterministic eval works and is repeatable
        e1 = trainer.evaluate()
        e2 = trainer.evaluate()
        assert np.isfinite(e1) and e1 == e2

        # fresh trainer restores params AND the rng stream
        trainer2 = Trainer(
            cfg, synth_data,
            log_dir=str(tmp_path / "logs2"),
            ckpt_dir=str(tmp_path / "ckpt"),
        )
        restored = trainer2.restore_latest()
        assert restored == trainer.global_step
        a = jax.tree.leaves(trainer.state.params)[0]
        b = jax.tree.leaves(trainer2.state.params)[0]
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(np.asarray(trainer.rng),
                                      np.asarray(trainer2.rng))

        # metrics jsonl written
        metrics = (tmp_path / "logs" / "metrics.jsonl").read_text()
        assert "Loss/train" in metrics


class TestMetricsCadence:
    def test_log_every_pulls_on_cadence_and_epoch_tail(self, synth_data,
                                                       tmp_path):
        """log_every=N: loss is pulled/logged only at step % N == 0 and at
        each epoch tail (so no step's metrics are silently dropped);
        between pulls steps only enqueue — no host sync. Throughput
        (examples_per_s) appears from the second pull onward."""
        import json
        cfg = tiny_config(num_train_epochs=3)  # 2 steps/epoch (n=16, b=8)
        trainer = Trainer(cfg, synth_data, log_dir=str(tmp_path / "logs"),
                          log_every=3)
        loss = trainer.train()
        assert np.isfinite(loss)
        rows = [json.loads(l) for l in
                (tmp_path / "logs" / "metrics.jsonl").read_text()
                .splitlines()]
        loss_steps = [r["step"] for r in rows if r["tag"] == "Loss/train"]
        # steps 3, 6 are cadence points; steps 2, 4 are epoch tails;
        # steps 1 and 5 must NOT have forced a pull
        assert loss_steps == [2, 3, 4, 6]
        tput_steps = [r["step"] for r in rows
                      if r["tag"] == "examples_per_s"]
        assert tput_steps == loss_steps[1:]  # first pull has no interval

    def test_log_every_rejects_negative(self, synth_data, tmp_path):
        with pytest.raises(ValueError, match="log_every"):
            Trainer(tiny_config(), synth_data,
                    log_dir=str(tmp_path / "logs"), log_every=-1)


class TestTrainerTPAndEval:
    def test_trainer_tp_from_user_surface(self, synth_data, tmp_path):
        """Trainer(n_model=2) — the cli/train.py --tp path — trains with
        params actually laid out over the model axis and matches DP loss."""
        from jax.sharding import PartitionSpec as P
        from prompt_tts_tpu.parallel.mesh import MODEL_AXIS

        cfg = tiny_config(num_train_epochs=1)
        tp = Trainer(cfg, synth_data, log_dir=str(tmp_path / "tp"),
                     n_model=2)
        assert tp.mesh.shape[MODEL_AXIS] == 2
        loss_tp = tp.train(epochs=1)
        assert np.isfinite(loss_tp)

        # a TP-ruled kernel is sharded over the model axis
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                tp.state.params):
            s = "/".join(str(getattr(k, "key", k)) for k in path)
            if s.endswith("to_q/kernel"):
                assert leaf.sharding.spec == P(None, MODEL_AXIS)
                break
        else:
            pytest.fail("no to_q kernel found")

        # same data/seeds under pure DP: first-epoch losses must agree
        dp = Trainer(cfg, synth_data, log_dir=str(tmp_path / "dp"))
        loss_dp = dp.train(epochs=1)
        np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-4)

    def test_trainer_eval_every(self, synth_data, tmp_path):
        cfg = tiny_config(num_train_epochs=2)
        t = Trainer(cfg, synth_data, log_dir=str(tmp_path / "logs"),
                    eval_every=1)
        t.train()
        metrics = (tmp_path / "logs" / "metrics.jsonl").read_text()
        assert metrics.count("Loss/eval") == 2

    def test_restore_distinguishes_missing_rng_from_corruption(
            self, synth_data, tmp_path):
        """has_item('rng') routes legacy checkpoints to the no-rng path;
        a genuinely broken checkpoint raises instead of being masked."""
        cfg = tiny_config(num_train_epochs=1)
        t = Trainer(cfg, synth_data, log_dir=str(tmp_path / "logs"),
                    ckpt_dir=str(tmp_path / "ckpt"))
        t.train(epochs=1)
        step = t.ckpt.latest_step()
        assert t.ckpt.has_item("rng", step)
        assert not t.ckpt.has_item("nonexistent", step)


class TestEMA:
    def _init_state(self, cfg, synth_data):
        model = TTSSingleSpeaker(cfg.model)
        batch = next(synth_data.batches(8))
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["codes"][:1]), jnp.zeros((1,), jnp.int32),
            jnp.asarray(batch["text_ids"][:1]),
            jnp.asarray(batch["text_mask"][:1]),
        )
        return model, batch, create_train_state(model, params, cfg.train,
                                                1000)

    def test_ema_matches_manual_recursion(self, synth_data):
        cfg = tiny_config(ema_decay=0.5)  # large step so drift is visible
        mesh = make_mesh()
        model, batch, state = self._init_state(cfg, synth_data)
        assert state.ema_params is not None
        step = jit_train_step(
            make_train_step(model.apply, linear_schedule(),
                            ema_decay=cfg.train.ema_decay), mesh)
        sharded = shard_batch(batch, mesh)
        leaf = lambda t: np.asarray(jax.tree.leaves(t)[0], np.float64)
        ema_ref = leaf(state.ema_params)
        for i in range(3):
            state, _ = step(state, sharded, jax.random.PRNGKey(i))
            ema_ref = 0.5 * ema_ref + 0.5 * leaf(state.params)
        np.testing.assert_allclose(leaf(state.ema_params), ema_ref,
                                   atol=1e-6)
        # and the EMA genuinely lags the raw params
        assert float(np.abs(leaf(state.ema_params)
                            - leaf(state.params)).max()) > 0

    def test_ema_gated_on_accumulation_boundary(self, synth_data):
        cfg = tiny_config(ema_decay=0.5, gradient_accumulation_steps=2)
        mesh = make_mesh()
        model, batch, state = self._init_state(cfg, synth_data)
        step = jit_train_step(
            make_train_step(model.apply, linear_schedule(),
                            ema_decay=0.5), mesh)
        sharded = shard_batch(batch, mesh)
        leaf = lambda t: np.asarray(jax.tree.leaves(t)[0])
        e0 = leaf(state.ema_params)
        # micro-step 1: params unchanged (accumulating) -> EMA bit-equal
        state, _ = step(state, sharded, jax.random.PRNGKey(1))
        np.testing.assert_array_equal(e0, leaf(state.ema_params))
        # micro-step 2: MultiSteps applied -> EMA moves
        state, _ = step(state, sharded, jax.random.PRNGKey(2))
        assert float(np.abs(e0 - leaf(state.ema_params)).max()) > 0

    def test_trainer_ema_checkpoint_roundtrip(self, synth_data, tmp_path):
        cfg = tiny_config(num_train_epochs=1, ema_decay=0.9)
        t = Trainer(cfg, synth_data, log_dir=str(tmp_path / "logs"),
                    ckpt_dir=str(tmp_path / "ckpt"))
        t.train(epochs=1)
        step = t.ckpt.latest_step()
        assert t.ckpt.has_item("ema_params", step)
        t2 = Trainer(cfg, synth_data, log_dir=str(tmp_path / "logs2"),
                     ckpt_dir=str(tmp_path / "ckpt"))
        t2.restore_latest()
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(t.state.ema_params)[0]),
            np.asarray(jax.tree.leaves(t2.state.ema_params)[0]))

    def test_restore_seeds_ema_from_legacy_checkpoint(self, synth_data,
                                                      tmp_path):
        # checkpoint written WITHOUT ema; restoring into an EMA-enabled
        # state must seed the average from the restored params
        cfg_off = tiny_config(num_train_epochs=1)
        t = Trainer(cfg_off, synth_data, log_dir=str(tmp_path / "logs"),
                    ckpt_dir=str(tmp_path / "ckpt"))
        t.train(epochs=1)
        cfg_on = tiny_config(num_train_epochs=1, ema_decay=0.9)
        t2 = Trainer(cfg_on, synth_data, log_dir=str(tmp_path / "logs2"),
                     ckpt_dir=str(tmp_path / "ckpt"))
        t2.restore_latest()
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(t2.state.ema_params)[0]),
            np.asarray(jax.tree.leaves(t2.state.params)[0]))


class TestPromptCropReseeding:
    def test_crops_vary_across_epochs(self):
        data = SyntheticDataset(n=8, frames=48, max_seq_length=32,
                                prompt_frames=16)
        b_e0 = next(data.batches(8, shuffle=False, seed=0))
        b_e0_again = next(data.batches(8, shuffle=False, seed=0))
        b_e1 = next(data.batches(8, shuffle=False, seed=1))
        # deterministic within an epoch seed...
        np.testing.assert_array_equal(b_e0["prompt"], b_e0_again["prompt"])
        # ...but different across epochs (same batch composition)
        assert not np.array_equal(b_e0["prompt"], b_e1["prompt"])
