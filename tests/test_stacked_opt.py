"""Natively-stacked optimizer layout (train/stacked.py).

Contracts under test:
  * stack/unstack are a bit-exact round trip;
  * a stacked-layout Trainer walks the SAME trajectory as the default
    per-leaf layout (AdamW is elementwise, so bucketing is bit-exact per
    leaf; only clip_by_global_norm's sum order differs — f32 reorder);
  * checkpoints are canonical per-leaf: a stacked run's checkpoint
    restores under the default layout and vice versa (unlike
    ``bucketed_opt=on``, whose stacked moments ARE the checkpoint
    layout — reference train.py:139-144 has no restore at all);
  * the AdamW decay mask survives stacking (time_proj's frozen fourier
    weight never shares a bucket with decayed leaves).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import Config, ModelConfig, TrainConfig
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.train import Trainer
from prompt_tts_tpu.train.stacked import StackedPlan
from prompt_tts_tpu.train.state import decay_mask

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
    defaults = dict(learning_rate=1e-3, batch_size=8, num_train_epochs=2,
                    lr_warmup_steps=0, lr_scheduler="constant")
    defaults.update(train_kw)
    return Config(model=TINY_MODEL, train=TrainConfig(**defaults))


@pytest.fixture(scope="module")
def synth_data():
    return SyntheticDataset(n=16, frames=48, max_seq_length=32)


def _trainer(synth_data, tmp_path, layout, sub, **kw):
    return Trainer(tiny_config(**kw.pop("train_kw", {})), synth_data,
                   log_dir=str(tmp_path / sub / "logs"),
                   ckpt_dir=str(tmp_path / sub / "ckpt"),
                   bucketed_opt=layout, **kw)


class TestPlan:
    def test_stack_unstack_round_trip(self, synth_data, tmp_path):
        t = _trainer(synth_data, tmp_path, "stacked", "rt")
        plan = t._stacked_plan
        canon = plan.unstack_tree(t.state.params)
        again = plan.stack_tree(canon)
        for k in plan.keys:
            np.testing.assert_array_equal(t.state.params[k], again[k])
        # every model leaf present, bit-equal to a fresh init
        ref = _trainer(synth_data, tmp_path, "off", "rt_ref")
        ra = jax.tree_util.tree_leaves_with_path(ref.state.params)
        ca = jax.tree_util.tree_leaves_with_path(canon)
        assert [p for p, _ in ra] == [p for p, _ in ca]
        for (path, x), (_, y) in zip(ra, ca):
            np.testing.assert_array_equal(
                x, y, err_msg=jax.tree_util.keystr(path))

    def test_decay_mask_survives_stacking(self, synth_data, tmp_path):
        """The fourier variant carries the one no-decay leaf
        (time_proj/weight, frozen in torch — train/state.decay_mask);
        its bucket must carry decay=False and no decayed leaf may share
        it."""
        import dataclasses
        cfg = tiny_config()
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, time_embedding_type="fourier"))
        t = Trainer(cfg, synth_data,
                    log_dir=str(tmp_path / "mask" / "logs"),
                    bucketed_opt="stacked")
        plan = t._stacked_plan
        canon = plan.unstack_tree(t.state.params)
        dm = decay_mask(canon)
        leaves = jax.tree_util.tree_leaves(dm)
        assert not all(leaves)  # the frozen fourier weight exists
        flags = plan.decay_mask()
        # per-bucket flag == every member leaf's flag (never mixed)
        for k, idxs in zip(plan.keys, plan.groups):
            member = {leaves[i] for i in idxs}
            assert member == {flags[k]}, k


class TestTrajectory:
    def test_single_update_is_bit_equivalent(self, synth_data, tmp_path):
        """The optimizer math itself: one clip+AdamW update over
        IDENTICAL grads is bit-equal between layouts (AdamW is
        elementwise; below the clip threshold the scale is exactly 1.0),
        and matches to f32-reorder tolerance when the clip triggers
        (the global-norm sum order differs across layouts)."""
        a = _trainer(synth_data, tmp_path, "off", "u_a")
        b = _trainer(synth_data, tmp_path, "stacked", "u_b")
        plan = b._stacked_plan
        for scale, tol in ((1e-4, 0.0), (10.0, 1e-6)):
            grads = jax.tree_util.tree_unflatten(
                plan.treedef,
                [jax.random.normal(jax.random.fold_in(
                    jax.random.PRNGKey(11), i), l.shape) * scale
                 for i, l in enumerate(
                     jax.tree_util.tree_leaves(a.state.params))])
            ua, _ = a.state.tx.update(grads, a.state.opt_state,
                                      a.state.params)
            ub_s, _ = b.state.tx.update(plan.stack_tree(grads),
                                        b.state.opt_state, b.state.params)
            ub = plan.unstack_tree(ub_s)
            for (path, x), (_, y) in zip(
                    jax.tree_util.tree_leaves_with_path(ua),
                    jax.tree_util.tree_leaves_with_path(ub)):
                np.testing.assert_allclose(
                    y, x, rtol=tol, atol=tol * 1e-3,
                    err_msg=f"scale={scale} {jax.tree_util.keystr(path)}")

    def test_matches_per_leaf_layout(self, synth_data, tmp_path):
        """Same data/seed/epochs under both layouts -> same LOSS
        trajectory.  Raw params can only be bounded, not tightly
        compared: the stacked model consumes sliced param views, so
        XLA's f32 reduction order in the backward differs, and one Adam
        boundary turns a ~1e-8 gradient difference on a near-zero-grad
        component into a +-lr update flip (same ill-conditioning as
        tests/test_attention_bwd.py::TestComposition — the update-rule
        equivalence is the bit-level test above)."""
        a = _trainer(synth_data, tmp_path, "off", "a")
        b = _trainer(synth_data, tmp_path, "stacked", "b")
        la = a.train()
        lb = b.train()
        assert np.isfinite(la) and np.isfinite(lb)
        assert la == pytest.approx(lb, rel=1e-3)
        canon_b = b._stacked_plan.unstack_tree(b.state.params)
        lr = a.config.train.learning_rate
        bound = 2.1 * lr * a.global_step
        moved = 0.0
        for (path, x), (_, y) in zip(
                jax.tree_util.tree_leaves_with_path(a.state.params),
                jax.tree_util.tree_leaves_with_path(canon_b)):
            np.testing.assert_allclose(
                y, x, rtol=0, atol=bound,
                err_msg=jax.tree_util.keystr(path))
            moved = max(moved, float(np.abs(np.asarray(y) - x).max()))
        assert a.global_step == b.global_step > 0
        # the bound is not vacuous: both runs actually trained (params
        # differ between layouts by SOME amount below the bound)
        assert 0 < moved < bound


class TestCheckpointPortability:
    def test_stacked_saves_canonical_restores_everywhere(
            self, synth_data, tmp_path):
        """stacked run -> checkpoint -> restore under the DEFAULT layout:
        params, moments, and step land bit-equal; training continues."""
        src = _trainer(synth_data, tmp_path, "stacked", "src")
        src.train()
        src.ckpt.wait()
        dst = Trainer(tiny_config(), synth_data,
                      log_dir=str(tmp_path / "dst" / "logs"),
                      ckpt_dir=str(tmp_path / "src" / "ckpt"),
                      bucketed_opt="off")
        step = dst.restore_latest()
        assert step == src.global_step
        canon = src._ckpt_state()
        for (path, x), (_, y) in zip(
                jax.tree_util.tree_leaves_with_path(canon.params),
                jax.tree_util.tree_leaves_with_path(dst.state.params)):
            np.testing.assert_array_equal(
                x, y, err_msg=jax.tree_util.keystr(path))
        for x, y in zip(jax.tree_util.tree_leaves(canon.opt_state),
                        jax.tree_util.tree_leaves(dst.state.opt_state)):
            np.testing.assert_array_equal(x, y)
        assert np.isfinite(dst.train(epochs=3))

    def test_default_checkpoint_restores_into_stacked(
            self, synth_data, tmp_path):
        """default run -> checkpoint -> restore under stacked: moments
        arrive re-bucketed bit-equal; training continues."""
        src = _trainer(synth_data, tmp_path, "off", "src2")
        src.train()
        src.ckpt.wait()
        dst = Trainer(tiny_config(), synth_data,
                      log_dir=str(tmp_path / "dst2" / "logs"),
                      ckpt_dir=str(tmp_path / "src2" / "ckpt"),
                      bucketed_opt="stacked")
        step = dst.restore_latest()
        assert step == src.global_step
        canon = dst._ckpt_state()
        for (path, x), (_, y) in zip(
                jax.tree_util.tree_leaves_with_path(src.state.params),
                jax.tree_util.tree_leaves_with_path(canon.params)):
            np.testing.assert_array_equal(
                x, y, err_msg=jax.tree_util.keystr(path))
        for x, y in zip(jax.tree_util.tree_leaves(src.state.opt_state),
                        jax.tree_util.tree_leaves(canon.opt_state)):
            np.testing.assert_array_equal(x, y)
        assert np.isfinite(dst.train(epochs=3))


class TestPartialStacking:
    """``max_leaf_bytes``: leaves above the threshold stay per-leaf in
    the same flat state dict (p### keys).  Full stacking OOMs the chip
    at the flagship batch-32 point (tools/abl_step_matrix.py r5), so
    partial is the Trainer default (4 MiB); here the threshold is
    dropped to 16 KiB so the TINY model exercises both populations."""

    THRESH = 16 * 1024

    def test_round_trip_and_split(self, synth_data, tmp_path):
        t = _trainer(synth_data, tmp_path, "stacked", "p_rt",
                     stacked_max_bytes=self.THRESH)
        plan = t._stacked_plan
        assert plan.pass_keys, "threshold produced no passthrough leaves"
        assert plan.keys, "threshold stacked nothing"
        # every passthrough leaf is actually over the threshold and every
        # stacked bucket member under it
        leaves = jax.tree_util.tree_leaves(plan.unstack_tree(
            t.state.params))
        for i in plan.pass_idx:
            assert leaves[i].nbytes > self.THRESH
        for idxs in plan.groups:
            for i in idxs:
                assert leaves[i].nbytes <= self.THRESH
        canon = plan.unstack_tree(t.state.params)
        again = plan.stack_tree(canon)
        for k in list(plan.keys) + list(plan.pass_keys):
            np.testing.assert_array_equal(t.state.params[k], again[k])
        ref = _trainer(synth_data, tmp_path, "off", "p_rt_ref")
        for (path, x), (_, y) in zip(
                jax.tree_util.tree_leaves_with_path(ref.state.params),
                jax.tree_util.tree_leaves_with_path(canon)):
            np.testing.assert_array_equal(
                x, y, err_msg=jax.tree_util.keystr(path))

    def test_trajectory_and_checkpoint_portability(
            self, synth_data, tmp_path):
        """Partial-stacked run matches the per-leaf loss and its
        checkpoint restores bit-equal under the default layout."""
        a = _trainer(synth_data, tmp_path, "off", "p_a")
        b = _trainer(synth_data, tmp_path, "stacked", "p_b",
                     stacked_max_bytes=self.THRESH)
        la = a.train()
        lb = b.train()
        assert la == pytest.approx(lb, rel=1e-3)
        b.ckpt.wait()
        dst = Trainer(tiny_config(), synth_data,
                      log_dir=str(tmp_path / "p_dst" / "logs"),
                      ckpt_dir=str(tmp_path / "p_b" / "ckpt"),
                      bucketed_opt="off")
        assert dst.restore_latest() == b.global_step
        canon = b._ckpt_state()
        for (path, x), (_, y) in zip(
                jax.tree_util.tree_leaves_with_path(canon.params),
                jax.tree_util.tree_leaves_with_path(dst.state.params)):
            np.testing.assert_array_equal(
                x, y, err_msg=jax.tree_util.keystr(path))
        for x, y in zip(jax.tree_util.tree_leaves(canon.opt_state),
                        jax.tree_util.tree_leaves(dst.state.opt_state)):
            np.testing.assert_array_equal(x, y)

    def test_decay_mask_covers_both_populations(self, synth_data,
                                                tmp_path):
        import dataclasses
        cfg = tiny_config()
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, time_embedding_type="fourier"))
        t = Trainer(cfg, synth_data,
                    log_dir=str(tmp_path / "p_mask" / "logs"),
                    bucketed_opt="stacked",
                    stacked_max_bytes=self.THRESH)
        plan = t._stacked_plan
        leaves = jax.tree_util.tree_leaves(
            decay_mask(plan.unstack_tree(t.state.params)))
        flags = plan.decay_mask()
        for k, idxs in zip(plan.keys, plan.groups):
            assert {leaves[i] for i in idxs} == {flags[k]}, k
        for k, i in zip(plan.pass_keys, plan.pass_idx):
            assert leaves[i] == flags[k], k


class TestGuards:
    def test_tp_incompatible(self, synth_data, tmp_path):
        if len(jax.devices()) < 2:
            pytest.skip("needs >= 2 devices")
        with pytest.raises(ValueError, match="TP-compatible"):
            Trainer(tiny_config(), synth_data,
                    log_dir=str(tmp_path / "logs"),
                    n_model=2, bucketed_opt="stacked")

    def test_ema_lives_stacked(self, synth_data, tmp_path):
        """EMA params share the stacked layout in-state and unstack to a
        canonical checkpoint entry."""
        t = _trainer(synth_data, tmp_path, "stacked", "ema",
                     train_kw=dict(ema_decay=0.5, num_train_epochs=1))
        t.train()
        plan = t._stacked_plan
        assert (set(t.state.ema_params)
                == set(plan.keys) | set(plan.pass_keys))
        canon = t._ckpt_state()
        paths = [jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(canon.ema_params)]
        ref = [jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_leaves_with_path(canon.params)]
        assert paths == ref
