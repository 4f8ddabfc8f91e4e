"""Multi-chip EXECUTION at flagship geometry (r4 verdict: missing #2).

test_flagship_lowering.py stops before GSPMD partitioning by design; the
driver dryrun executes but on toy 48-frame shapes.  This module EXECUTES
a full train step at the REAL flagship geometry — 900-frame latents,
550-token text, the 4-level pyramid whose stride-2 downsampling produces
the 900/450/225/113 sequence ladder (including the odd, indivisible 113
level) — with channels thinned so the 1-core CPU box can compile and run
it under the virtual 8-device mesh.  The partitioner therefore actually
processes: conv halo exchange at every stride-2 level, the ring
attention shard_map at the even levels, the odd levels' fallback, the dp
gradient all-reduce, and (on the 2x2x2 mesh) Megatron TP collectives.

Geometry facts asserted (not merely "it ran"):
  * ring attention engaged exactly at the sp-divisible self-attention
    lengths and fell back at the odd ones (sp.ring_trace_tqs),
  * the sharded step computes the SAME loss as the unsharded program on
    one device — partitioning is semantics-preserving at real geometry.

Reference shape provenance: 900 frames = 12 s @ 75 Hz EnCodec
(reference train.py:56-57, generate_code.py:32), 550 = max_seq_length
padding (reference train.py:164-165).
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
from prompt_tts_tpu.parallel.mesh import batch_key_sharding, make_mesh, shard_batch
from prompt_tts_tpu.parallel.tp import state_shardings
from prompt_tts_tpu.train import (
    create_train_state,
    jit_train_step,
    make_train_step,
)

# REAL flagship geometry (sequence lengths & pyramid depth), thin
# channels: the partitioning decisions under test — halo widths, ring
# dispatch, level divisibility — depend on the GEOMETRY, not the width
GEOM = ModelConfig(
    block_out_channels=(32, 64, 64, 64),
    cross_attention_dim=64,
    attention_head_dim=32,
    text_encoder_layers=1,
    cmu_seq_len=550,
    sample_size=900,
    layers_per_block=1,
    unet_num_heads=4,
)
BATCH = 4


def _setup():
    tcfg = TrainConfig(batch_size=BATCH, learning_rate=1e-3,
                       lr_warmup_steps=0, ema_decay=0.999)
    model = TTSSingleSpeaker(GEOM)
    data = SyntheticDataset(n=BATCH, frames=GEOM.sample_size,
                            max_seq_length=GEOM.cmu_seq_len)
    batch = next(data.batches(BATCH))
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["codes"][:1]),
        jnp.zeros((1,), jnp.int32), jnp.asarray(batch["text_ids"][:1]),
        jnp.asarray(batch["text_mask"][:1]))
    return model, tcfg, params, batch


def _run_step(model, tcfg, params, batch, mesh=None, seq=False):
    # fresh param buffers per run: jit_train_step DONATES the state, so
    # a later parametrization would otherwise execute on deleted buffers
    params = jax.tree.map(jnp.array, params)
    state = create_train_state(model, params, tcfg, 100)
    step_fn = make_train_step(model.apply, linear_schedule(),
                              ema_decay=tcfg.ema_decay)
    if mesh is None:
        step = jax.jit(step_fn)
        st, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()},
                     jax.random.PRNGKey(1))
        return st, m, []
    state_sh = (state_shardings(state, mesh)
                if mesh.shape["model"] > 1 else None)
    if state_sh is not None:
        state = jax.device_put(state, state_sh)
    batch_sh = ({k: batch_key_sharding(mesh, k) for k in batch}
                if seq else None)
    step = jit_train_step(step_fn, mesh, state_sharding=state_sh,
                          batch_sharding=batch_sh)
    sharded = shard_batch(batch, mesh)
    tqs0 = sp.ring_trace_tqs()
    if seq:
        with sp.sequence_parallel(mesh):
            st, m = step(state, sharded, jax.random.PRNGKey(1))
    else:
        st, m = step(state, sharded, jax.random.PRNGKey(1))
    return st, m, sp.ring_trace_tqs()[len(tqs0):]


@pytest.mark.slow
class TestFlagshipGeometryExecution:
    @pytest.fixture(scope="class")
    def setup(self):
        return _setup()

    @pytest.fixture(scope="class")
    def baseline(self, setup):
        """Unsharded single-device step: the semantics anchor."""
        model, tcfg, params, batch = setup
        st, m, _ = _run_step(model, tcfg, params, batch)
        loss = float(m["loss"])
        assert np.isfinite(loss)
        return loss

    @pytest.mark.parametrize("n_data,n_model,n_seq", [(2, 2, 2), (4, 1, 2)])
    def test_executes_and_matches_unsharded(self, setup, baseline,
                                            n_data, n_model, n_seq):
        model, tcfg, params, batch = setup
        if len(jax.devices()) < n_data * n_model * n_seq:
            pytest.skip("needs 8 devices")
        mesh = make_mesh(n_data=n_data, n_model=n_model, n_seq=n_seq)
        st, m, tqs = _run_step(model, tcfg, params, batch,
                               mesh=mesh, seq=True)
        loss = float(m["loss"])
        assert np.isfinite(loss)
        assert st.ema_params is not None
        # GSPMD partitioning is semantics-preserving at real geometry:
        # same loss as the unsharded program (f32 collective reorder)
        assert loss == pytest.approx(baseline, rel=2e-4), \
            f"sharded loss {loss} != unsharded {baseline}"
        # the ring engaged at the sp-divisible lengths and ONLY there:
        # latent self-attn at 900 and 450; the odd 225/113 levels fall
        # back to the GSPMD path by the Tq % sp gate (parallel/sp.py),
        # and the 550-token text-encoder self-attn rides the ring too
        got = set(tqs)
        assert 900 in got, f"900-frame level not on the ring: {tqs}"
        assert 450 in got, f"450-frame level not on the ring: {tqs}"
        assert 225 not in got and 113 not in got, \
            f"odd pyramid level must fall back, got {tqs}"
        for t in got:
            assert t % n_seq == 0, f"indivisible Tq={t} on the ring"
