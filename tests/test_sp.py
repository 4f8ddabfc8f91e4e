"""Sequence-parallel training correctness on the 8-device virtual CPU mesh.

The seq-sharded train step (latent time over the mesh ``seq`` axis, ring
attention for self-attn, GSPMD halo exchange for the k=3 convs) must match
the single-device step to f32 noise — same loss, same grad norm, and the
same per-leaf gradients (asserted through one SGD update, which is linear
in the grads) — under dp x sp and the full dp x tp x sp 2x2x2 mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import ModelConfig, TrainConfig
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.parallel import sp
from prompt_tts_tpu.parallel.mesh import (
    batch_shardings, make_mesh, shard_batch,
)
from prompt_tts_tpu.parallel.tp import state_shardings
from prompt_tts_tpu.train import (
    create_train_state, jit_train_step, make_train_step,
)

# two-level pyramid keeps the GSPMD+ring compile tractable on the CPU
# backend (the 4-level dryrun config compiles ~5 min under 2x2x2); T
# levels 32/16 and S=32 all divide sp=4
MCFG = ModelConfig(
    block_out_channels=(32, 64), cross_attention_dim=64,
    attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
    sample_size=32, layers_per_block=1, unet_num_heads=4,
    down_block_types=("CrossAttnDownBlock1D", "DownBlock1D"),
    up_block_types=("UpBlock1D", "CrossAttnUpBlock1D"))
TCFG = TrainConfig(batch_size=4, learning_rate=1e-3, lr_warmup_steps=0)


@pytest.fixture(autouse=True)
def _sp_disarmed_after():
    yield
    sp.disable()


def _model_and_batch(batch_size=4):
    model = TTSSingleSpeaker(MCFG)
    ds = SyntheticDataset(n=8, frames=MCFG.sample_size,
                          max_seq_length=MCFG.cmu_seq_len)
    batch = next(ds.batches(batch_size))
    return model, batch


def _fresh_state(model, batch, sgd=False):
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["codes"][:1]),
        jnp.zeros((1,), jnp.int32), jnp.asarray(batch["text_ids"][:1]),
        jnp.asarray(batch["text_mask"][:1]))
    if sgd:
        # the equivalence tests diff the UPDATED PARAMS across meshes, so
        # the update must be LINEAR in the grads: a first Adam step is
        # g/(|g|+eps) ~ sign(g)-shaped and amplifies f32-noise-level
        # gradient differences on near-zero coordinates into +-lr param
        # differences (loss/grad_norm match while params look unrelated)
        import optax

        from prompt_tts_tpu.train.state import TrainState
        return TrainState.create(apply_fn=model.apply, params=params,
                                 tx=optax.sgd(TCFG.learning_rate))
    return create_train_state(model, params, TCFG, 100)


def _one_step(model, batch, mesh, use_sp, state_sh_fn=None):
    """Fresh SGD state -> one jitted step on ``mesh`` -> host results."""
    sp.enable(mesh) if use_sp else sp.disable()
    state = _fresh_state(model, batch, sgd=True)
    p0 = jax.tree.map(np.asarray, jax.device_get(state.params))
    state_sh = state_sh_fn(state, mesh) if state_sh_fn else None
    batch_sh = batch_shardings(mesh, batch) if use_sp else None
    step = jit_train_step(
        make_train_step(model.apply, linear_schedule()), mesh,
        state_sharding=state_sh, batch_sharding=batch_sh)
    new_state, m = step(state, shard_batch(batch, mesh),
                        jax.random.PRNGKey(7))
    updates = jax.tree.map(lambda new, old: np.asarray(new) - old,
                           jax.device_get(new_state.params), p0)
    return float(m["loss"]), float(m["grad_norm"]), updates


class TestSequenceParallelTrainStep:
    def _compare(self, mesh_sp, state_sh_fn=None):
        model, batch = _model_and_batch()
        mesh_1 = make_mesh(devices=jax.devices()[:1])
        loss_ref, gn_ref, p_ref = _one_step(model, batch, mesh_1, False)

        before = sp.ring_trace_count()
        loss_sp, gn_sp, p_sp = _one_step(model, batch, mesh_sp, True,
                                         state_sh_fn)
        assert sp.ring_trace_count() > before, (
            "SP armed but no attention site dispatched to the ring path")

        assert np.isclose(loss_ref, loss_sp, rtol=1e-4), (loss_ref, loss_sp)
        assert np.isclose(gn_ref, gn_sp, rtol=1e-3), (gn_ref, gn_sp)
        # SGD updates are -lr * grads, so this compares the full gradient
        # trees to f32 reduction noise (atol covers noise-dominated
        # near-zero coordinates, whose lr-scaled updates are ~1e-10)
        flat_ref = jax.tree_util.tree_leaves_with_path(p_ref)
        flat_sp = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(p_sp))
        for key, ref in flat_ref:
            np.testing.assert_allclose(
                flat_sp[jax.tree_util.keystr(key)], ref,
                rtol=2e-3, atol=5e-8, err_msg=jax.tree_util.keystr(key))

    def test_dp2_sp4_matches_single_device(self):
        self._compare(make_mesh(n_data=2, n_model=1, n_seq=4))

    def test_dp2_tp2_sp2_matches_single_device(self):
        self._compare(make_mesh(n_data=2, n_model=2, n_seq=2),
                      state_sh_fn=state_shardings)


class TestSequenceParallelForward:
    def test_denoiser_forward_matches(self):
        """Jitted eps-prediction under dp x sp == single-device forward."""
        model, batch = _model_and_batch()
        state = _fresh_state(model, batch)
        args = (jnp.asarray(batch["codes"]),
                jnp.zeros((4,), jnp.int32),
                jnp.asarray(batch["text_ids"]),
                jnp.asarray(batch["text_mask"]))

        sp.disable()
        ref = np.asarray(jax.jit(model.apply)(state.params, *args))

        mesh = make_mesh(n_data=2, n_model=1, n_seq=4)
        sp.enable(mesh)
        before = sp.ring_trace_count()
        out = np.asarray(jax.jit(model.apply)(state.params, *args))
        assert sp.ring_trace_count() > before
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_sp_synthesis_matches(self):
        """End-to-end synthesis on a seq mesh == single-device synthesis
        (the Synthesizer-level SP surface: mesh= arg)."""
        from prompt_tts_tpu.config import Config
        from prompt_tts_tpu.pipeline import Synthesizer

        cfg = Config(model=MCFG)
        sp.disable()
        ref_synth = Synthesizer(config=cfg, num_inference_steps=2,
                                dtype=jnp.float32)
        ref = ref_synth.synthesize(["hello there"])

        ids, mask = ref_synth.tokenizer.encode_batch(["hello there"])
        x_T = jax.random.normal(jax.random.PRNGKey(0),
                                (1, MCFG.sample_size, MCFG.in_channels))
        lat_ref = np.asarray(jax.jit(ref_synth._denoise_latents)(
            ref_synth.model_params, x_T, jnp.asarray(ids),
            jnp.asarray(mask)))

        mesh = make_mesh(n_data=1, n_model=1, n_seq=4,
                         devices=jax.devices()[:4])
        before = sp.ring_trace_count()
        sp_synth = Synthesizer(config=cfg, num_inference_steps=2,
                               dtype=jnp.float32, mesh=mesh,
                               model_params=ref_synth.model_params,
                               codec_params=ref_synth.codec_params)
        # latent equivalence is strict (pre-quantization; code rounding
        # could flip at exact boundaries under f32 reassociation);
        # arming is SCOPED, so a direct jit of the denoise body needs the
        # synthesizer's own scope (synthesize() applies it internally)
        with sp_synth._sp_scope():
            lat_sp = np.asarray(jax.jit(sp_synth._denoise_latents)(
                sp_synth.model_params, x_T, jnp.asarray(ids),
                jnp.asarray(mask)))
        assert sp.ring_trace_count() > before
        np.testing.assert_allclose(lat_sp, lat_ref, atol=2e-5)
        # and the full text->wav program runs on the mesh
        out = sp_synth.synthesize(["hello there"])
        assert out.shape == ref.shape and np.isfinite(out).all()

    def test_indivisible_lengths_fall_back(self):
        """T not divisible by sp -> XLA path, still correct (no crash)."""
        cfg = ModelConfig(
            block_out_channels=(32, 64), cross_attention_dim=64,
            attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=30,
            sample_size=50, layers_per_block=1, unet_num_heads=4,
            down_block_types=("CrossAttnDownBlock1D", "DownBlock1D"),
            up_block_types=("UpBlock1D", "CrossAttnUpBlock1D"))
        model = TTSSingleSpeaker(cfg)
        ds = SyntheticDataset(n=4, frames=50, max_seq_length=30)
        batch = next(ds.batches(4))
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["codes"][:1]),
            jnp.zeros((1,), jnp.int32), jnp.asarray(batch["text_ids"][:1]),
            jnp.asarray(batch["text_mask"][:1]))
        args = (jnp.asarray(batch["codes"]), jnp.zeros((4,), jnp.int32),
                jnp.asarray(batch["text_ids"]),
                jnp.asarray(batch["text_mask"]))
        sp.disable()
        ref = np.asarray(jax.jit(model.apply)(params, *args))
        sp.enable(make_mesh(n_data=2, n_model=1, n_seq=4))
        out = np.asarray(jax.jit(model.apply)(params, *args))
        np.testing.assert_allclose(out, ref, atol=2e-5)
