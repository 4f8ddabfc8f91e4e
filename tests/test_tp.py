"""Tensor-parallel sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from prompt_tts_tpu.config import ModelConfig, TrainConfig
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.parallel.mesh import MODEL_AXIS, make_mesh, shard_batch
from prompt_tts_tpu.parallel.tp import state_shardings, tp_shardings_one
from prompt_tts_tpu.train import (
    create_train_state,
    jit_train_step,
    make_train_step,
)

TINY = ModelConfig(
    block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
    attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
    sample_size=48, layers_per_block=1, unet_num_heads=4)


class TestTPRules:
    def test_attention_kernels_sharded(self):
        mesh = make_mesh(n_model=2)
        model = TTSSingleSpeaker(TINY)
        args = (jnp.zeros((1, 48, 8)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), jnp.int32))
        params = model.init(jax.random.PRNGKey(0), *args)

        specs = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            s = "/".join(str(getattr(k, "key", k)) for k in path)
            specs[s] = tp_shardings_one(path, leaf, mesh).spec

        qkv = [s for s in specs
               if s.endswith("to_q/kernel") or s.endswith("to_v/kernel")]
        assert qkv, "no attention kernels found"
        assert all(specs[s] == P(None, MODEL_AXIS) for s in qkv), {
            s: specs[s] for s in qkv}
        outs = [s for s in specs if s.endswith("to_out/kernel")]
        assert all(specs[s] == P(MODEL_AXIS, None) for s in outs)

    def test_indivisible_dims_replicate(self):
        mesh = make_mesh(n_model=8)  # 8 doesn't divide some dims
        x = jnp.zeros((3, 5))  # 5 % 8 != 0

        class FakeKey:
            def __init__(self, key):
                self.key = key

        path = (FakeKey("attn1"), FakeKey("to_q"), FakeKey("kernel"))
        sh = tp_shardings_one(path, x, mesh)
        assert sh.spec == P()


class TestTPTrainStep:
    def test_dp2_tp2_step_runs_and_matches_dp(self):
        """A 4x2 (dp x tp) step must produce the same loss as pure DP."""
        model = TTSSingleSpeaker(TINY)
        data = SyntheticDataset(n=8, frames=48, max_seq_length=32)
        batch = next(data.batches(4))
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(batch["codes"][:1]), jnp.zeros((1,), jnp.int32),
            jnp.asarray(batch["text_ids"][:1]),
            jnp.asarray(batch["text_mask"][:1]))
        tcfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=0,
                           lr_scheduler="constant")
        sched = linear_schedule()
        rng = jax.random.PRNGKey(1)

        # copy params BEFORE the DP step donates its buffers
        params2 = jax.tree.map(jnp.array, params)

        # pure DP on 4 devices
        mesh_dp = make_mesh(n_data=4, n_model=1,
                            devices=jax.devices()[:4])
        state_dp = create_train_state(model, params, tcfg, 100)
        step_dp = jit_train_step(make_train_step(model.apply, sched),
                                 mesh_dp)
        _, m_dp = step_dp(state_dp, shard_batch(batch, mesh_dp), rng)

        # dp=4 x tp=2 on 8 devices
        mesh_tp = make_mesh(n_data=4, n_model=2)
        state_tp = create_train_state(model, params2, tcfg, 100)
        sh = state_shardings(state_tp, mesh_tp)
        step_tp = jit_train_step(make_train_step(model.apply, sched),
                                 mesh_tp, state_sharding=sh)
        new_state, m_tp = step_tp(state_tp, shard_batch(batch, mesh_tp),
                                  rng)

        np.testing.assert_allclose(float(m_dp["loss"]),
                                   float(m_tp["loss"]), rtol=1e-4)

        # a TP-ruled param is actually laid out over the model axis
        leaf = None
        for path, l in jax.tree_util.tree_leaves_with_path(
                new_state.params):
            s = "/".join(str(getattr(k, "key", k)) for k in path)
            if s.endswith("to_q/kernel"):
                leaf = l
                break
        assert leaf is not None
        assert len(leaf.sharding.device_set) == 8
        assert leaf.sharding.spec == P(None, MODEL_AXIS)


class TestTPSynthesis:
    def test_tp_synthesis_matches_unsharded(self):
        """Synthesizer(mesh with model axis 2) — the synthesize --tp
        surface — Megatron-shards the denoiser params and must produce
        the same DENOISED LATENTS as the unsharded program (f32, same
        seed).  The comparison is pre-quantization: latents_to_codes
        rounds to 1024 levels, so an f32-reassociation-level latent
        difference (TP splits every matmul's reduction) can flip a code
        at an exact rounding boundary, and one flipped RVQ index decodes
        to a legitimately different waveform over its receptive field —
        audio equality is the wrong assertion (same rationale as
        test_sp.py's latent check)."""
        from prompt_tts_tpu.config import Config
        from prompt_tts_tpu.pipeline import Synthesizer

        cfg = Config(model=TINY)
        base = Synthesizer(config=cfg, num_inference_steps=4,
                           dtype=jnp.float32)
        ids, mask = base.tokenizer.encode_batch(["hello world", "a test"])
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        x_T = jax.random.normal(
            jax.random.PRNGKey(3),
            (2, TINY.sample_size, TINY.in_channels))
        lat_ref = np.asarray(jax.jit(base._denoise_latents)(
            base.model_params, x_T, ids, mask))

        mesh = make_mesh(n_model=2)
        tp = Synthesizer(config=cfg,
                         model_params=jax.tree.map(jnp.array,
                                                   base.model_params),
                         codec_params=base.codec_params,
                         num_inference_steps=4, dtype=jnp.float32,
                         mesh=mesh)
        # a TP-ruled kernel is actually laid out over the model axis
        leaf = None
        for path, l in jax.tree_util.tree_leaves_with_path(
                tp.model_params):
            s = "/".join(str(getattr(k, "key", k)) for k in path)
            if s.endswith("to_q/kernel"):
                leaf = l
                break
        assert leaf is not None
        assert leaf.sharding.spec == P(None, MODEL_AXIS)

        lat_tp = np.asarray(jax.jit(tp._denoise_latents)(
            tp.model_params, x_T, ids, mask))
        np.testing.assert_allclose(lat_tp, lat_ref, atol=2e-4)

        # and the full audio program runs end to end under the mesh,
        # with codes agreeing except for boundary flips
        wav_ref, codes_ref = base.synthesize(
            ["hello world", "a test"], seed=3, return_codes=True)
        wav_tp, codes_tp = tp.synthesize(
            ["hello world", "a test"], seed=3, return_codes=True)
        assert wav_tp.shape == wav_ref.shape
        agree = float((codes_tp == codes_ref).mean())
        assert agree > 0.99, f"code agreement {agree:.4f}"


class TestTPCheckpointRoundTrip:
    def test_save_restore_tp_sharded_state(self, tmp_path):
        """Save a 4x2 TP-sharded TrainState, restore into a fresh one:
        params must be bit-equal AND keep their Megatron shardings
        (the reference has no load path at all — SURVEY.md §5)."""
        from prompt_tts_tpu.train.checkpoint import CheckpointManager

        model = TTSSingleSpeaker(TINY)
        tcfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=0,
                           lr_scheduler="constant")
        args = (jnp.zeros((1, 48, 8)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), jnp.int32))
        mesh = make_mesh(n_data=4, n_model=2)

        params = model.init(jax.random.PRNGKey(0), *args)
        state = create_train_state(model, params, tcfg, 100)
        sh = state_shardings(state, mesh)
        state = jax.device_put(state, sh)

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr.save(state, step=7, force=True,
                        rng=jax.random.PRNGKey(5))
        mgr.wait()

        # fresh state with DIFFERENT params, sharded the same way (the
        # sharding pytree must be rebuilt: TrainState's static aux data
        # — the fresh optax chain — makes the first state's treedef
        # unequal for device_put's prefix matching)
        params_b = model.init(jax.random.PRNGKey(9), *args)
        state_b = create_train_state(model, params_b, tcfg, 100)
        state_b = jax.device_put(state_b, state_shardings(state_b, mesh))
        restored, step, rng = mgr.restore(state_b, with_rng=True)
        assert step == 7
        np.testing.assert_array_equal(np.asarray(rng),
                                      np.asarray(jax.random.PRNGKey(5)))

        ref = jax.tree_util.tree_leaves_with_path(state.params)
        got = {jax.tree_util.keystr(p): l for p, l in
               jax.tree_util.tree_leaves_with_path(restored.params)}
        n_sharded = 0
        for path, leaf in ref:
            key = jax.tree_util.keystr(path)
            np.testing.assert_array_equal(
                np.asarray(got[key]), np.asarray(leaf), err_msg=key)
            assert got[key].sharding.spec == leaf.sharding.spec, key
            if MODEL_AXIS in tuple(got[key].sharding.spec):
                n_sharded += 1
        assert n_sharded > 0, "no restored param kept a TP sharding"
        # optimizer moments restored too (mu mirrors the param tree)
        mu_ref = jax.tree_util.tree_leaves(state.opt_state)
        mu_got = jax.tree_util.tree_leaves(restored.opt_state)
        assert len(mu_ref) == len(mu_got)
        for a, b in zip(mu_ref, mu_got):
            if hasattr(a, "shape"):
                np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


class TestMeshElasticRestore:
    """A checkpoint saved under one topology restores onto ANOTHER —
    the preemption/rescale story every TPU trainer needs (round-3
    verdict #3; the reference has no load path at all, SURVEY.md §5).

    Orbax saves device-agnostic array contents + our restore() lays each
    leaf out per the TARGET state's sharding, so resharding happens at
    load: save 4x2 TP-sharded, restore onto 8x1 pure-dp (replicated
    params), 2x4 (different TP degree), and a single device — params and
    Adam moments must be bit-equal everywhere."""

    def _trained_tp_state(self, tmp_path):
        from prompt_tts_tpu.train.checkpoint import CheckpointManager

        model = TTSSingleSpeaker(TINY)
        tcfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=0,
                           lr_scheduler="constant")
        args = (jnp.zeros((1, 48, 8)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), jnp.int32))
        mesh = make_mesh(n_data=4, n_model=2)
        params = model.init(jax.random.PRNGKey(0), *args)
        state = create_train_state(model, params, tcfg, 100)
        state = jax.device_put(state, state_shardings(state, mesh))
        # one real step so the Adam moments are non-trivial data
        data = SyntheticDataset(n=8, frames=48, max_seq_length=32)
        step_fn = jit_train_step(
            make_train_step(model.apply, linear_schedule()), mesh,
            state_sharding=state_shardings(state, mesh))
        state, _ = step_fn(state, shard_batch(next(data.batches(4)), mesh),
                           jax.random.PRNGKey(1))
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        assert mgr.save(state, step=3, force=True)
        mgr.wait()
        host = jax.tree.map(np.asarray, state.params)
        mu_host = [np.asarray(l) for l in
                   jax.tree_util.tree_leaves(state.opt_state)
                   if hasattr(l, "shape")]
        return model, tcfg, args, mgr, host, mu_host

    def _restore_onto(self, model, tcfg, args, mgr, mesh, sharded):
        params = model.init(jax.random.PRNGKey(9), *args)
        state = create_train_state(model, params, tcfg, 100)
        if mesh is not None:
            sh = (state_shardings(state, mesh) if sharded
                  else jax.tree.map(
                      lambda _: jax.sharding.NamedSharding(mesh, P()),
                      state))
            state = jax.device_put(state, sh)
        restored, step = mgr.restore(state)
        assert step == 3
        return restored

    def _assert_equal(self, restored, host, mu_host):
        got = {jax.tree_util.keystr(p): l for p, l in
               jax.tree_util.tree_leaves_with_path(restored.params)}
        for path, leaf in jax.tree_util.tree_leaves_with_path(host):
            key = jax.tree_util.keystr(path)
            np.testing.assert_array_equal(np.asarray(got[key]), leaf,
                                          err_msg=key)
        mu_got = [np.asarray(l) for l in
                  jax.tree_util.tree_leaves(restored.opt_state)
                  if hasattr(l, "shape")]
        assert len(mu_got) == len(mu_host)
        for a, b in zip(mu_host, mu_got):
            np.testing.assert_array_equal(b, a)

    def test_tp_save_restores_across_topologies(self, tmp_path):
        model, tcfg, args, mgr, host, mu_host = \
            self._trained_tp_state(tmp_path)

        # 8x1 pure dp: params land replicated
        mesh_dp = make_mesh(n_data=8, n_model=1)
        r = self._restore_onto(model, tcfg, args, mgr, mesh_dp, False)
        self._assert_equal(r, host, mu_host)
        leaf = jax.tree_util.tree_leaves(r.params)[0]
        assert len(leaf.sharding.device_set) == 8
        assert leaf.sharding.is_fully_replicated

        # 2x4: DIFFERENT tp degree than the save's 2
        mesh_24 = make_mesh(n_data=2, n_model=4)
        r = self._restore_onto(model, tcfg, args, mgr, mesh_24, True)
        self._assert_equal(r, host, mu_host)
        n_tp = sum(1 for l in jax.tree_util.tree_leaves(r.params)
                   if MODEL_AXIS in tuple(l.sharding.spec))
        assert n_tp > 0, "no restored param took a tp=4 layout"

        # single device (the laptop-debug / export case)
        mesh_1 = make_mesh(n_data=1, n_model=1,
                           devices=jax.devices()[:1])
        r = self._restore_onto(model, tcfg, args, mgr, mesh_1, False)
        self._assert_equal(r, host, mu_host)

        # and the restored 2x4 state actually TRAINS under its new mesh
        r24 = self._restore_onto(model, tcfg, args, mgr, mesh_24, True)
        data = SyntheticDataset(n=8, frames=48, max_seq_length=32)
        step_fn = jit_train_step(
            make_train_step(model.apply, linear_schedule()), mesh_24,
            state_sharding=state_shardings(r24, mesh_24))
        new_state, m = step_fn(
            r24, shard_batch(next(data.batches(4)), mesh_24),
            jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss"]))
        assert int(new_state.step) == int(r24.step) + 1
