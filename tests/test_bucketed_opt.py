"""Shape-bucketed optimizer (train/bucketed.py): equivalence with the
per-leaf chain, decay-mask bucket separation, MultiSteps composition,
and the Trainer's auto/TP gating.

Why it exists: the flagship per-leaf clip+AdamW update measured 58.0 ms
vs 9.5 ms bucketed at identical math (tools/abl_opt_shape.py) — the
update is per-leaf-op-overhead-bound on TPU.  Correctness bar: AdamW is
elementwise (bit-exact under stacking); only clip_by_global_norm's sum
order changes, so trajectories must agree to f32-reorder tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from prompt_tts_tpu.config import TrainConfig
from prompt_tts_tpu.train.bucketed import (
    bucketed, from_buckets, plan_buckets, to_buckets,
)
from prompt_tts_tpu.train.state import make_optimizer


def tree_with_shape_collisions(key=0):
    """Param tree where the decay-masked time_proj.weight shares its
    shape with decayed leaves — the bucketing must keep them apart."""
    k = jax.random.PRNGKey(key)
    ks = jax.random.split(k, 6)
    return {
        "time_proj": {"weight": jax.random.normal(ks[0], (16,))},
        "dense_a": {"kernel": jax.random.normal(ks[1], (8, 16)),
                    "bias": jax.random.normal(ks[2], (16,))},
        "dense_b": {"kernel": jax.random.normal(ks[3], (8, 16)),
                    "bias": jax.random.normal(ks[4], (16,))},
        "scale": jax.random.normal(ks[5], (16,)),
    }


def rand_like(tree, key):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    ks = jax.random.split(jax.random.PRNGKey(key), len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [0.1 * jax.random.normal(kk, l.shape, l.dtype)
                  for kk, l in zip(ks, leaves)])


class TestBucketPlan:
    def test_round_trip(self):
        params = tree_with_shape_collisions()
        decay = jax.tree.map(lambda _: True, params)
        treedef, groups, flags = plan_buckets(params, decay)
        back = from_buckets(to_buckets(params, groups), groups, treedef)
        assert jax.tree.all(jax.tree.map(
            lambda a, b: bool(jnp.array_equal(a, b)), params, back))

    def test_masked_leaf_gets_own_bucket(self):
        params = tree_with_shape_collisions()
        # the rule from make_optimizer: time_proj.weight never decays
        decay = jax.tree_util.tree_map_with_path(
            lambda path, _: not (
                len(path) >= 2
                and getattr(path[-2], "key", None) == "time_proj"
                and getattr(path[-1], "key", None) == "weight"),
            params)
        _, groups, flags = plan_buckets(params, decay)
        leaves, _ = jax.tree_util.tree_flatten(params)
        dleaves = jax.tree_util.tree_leaves(decay)
        # four (16,) leaves decay, one (time_proj.weight) does not:
        # they must land in different buckets despite equal shape/dtype
        for idxs, flag in zip(groups, flags):
            for i in idxs:
                assert dleaves[i] == flag

    def test_mismatched_mask_raises(self):
        params = tree_with_shape_collisions()
        with pytest.raises(ValueError):
            plan_buckets(params, {"just": True})


class TestEquivalence:
    def run_updates(self, tx, params, n=3):
        opt = tx.init(params)
        traj = []
        for i in range(n):
            grads = rand_like(params, 100 + i)
            updates, opt = tx.update(grads, opt, params)
            params = optax.apply_updates(params, updates)
            traj.append(params)
        return traj

    @pytest.mark.parametrize("accum", [1, 2])
    def test_matches_per_leaf_chain(self, accum):
        cfg = TrainConfig(learning_rate=1e-3, lr_warmup_steps=0,
                          lr_scheduler="constant",
                          gradient_accumulation_steps=accum)
        params = tree_with_shape_collisions()
        plain = make_optimizer(cfg, 100)
        buck = make_optimizer(cfg, 100, params=params, bucketed_opt=True)
        t_plain = self.run_updates(plain, params, n=4)
        t_buck = self.run_updates(buck, params, n=4)
        for a, b in zip(t_plain, t_buck):
            for pa, pb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                np.testing.assert_allclose(pa, pb, rtol=2e-6, atol=2e-7)

    def test_decay_mask_effective(self):
        """Zero grads: decayed leaves shrink by lr*wd, the masked
        time_proj.weight must not."""
        cfg = TrainConfig(learning_rate=1e-2, weight_decay=1e-2,
                          lr_warmup_steps=0, lr_scheduler="constant")
        params = tree_with_shape_collisions()
        tx = make_optimizer(cfg, 100, params=params, bucketed_opt=True)
        opt = tx.init(params)
        zeros = jax.tree.map(jnp.zeros_like, params)
        updates, _ = tx.update(zeros, opt, params)
        assert float(jnp.abs(updates["time_proj"]["weight"]).max()) == 0.0
        assert float(jnp.abs(updates["dense_a"]["kernel"]).max()) > 0.0

    def test_needs_params_for_plan(self):
        cfg = TrainConfig()
        with pytest.raises(ValueError):
            make_optimizer(cfg, 100, bucketed_opt=True)


class TestGenericWrapper:
    def test_sgd_inner_bit_exact(self):
        """With a purely elementwise inner transform, bucketing is
        bit-exact, not merely close."""
        params = tree_with_shape_collisions()
        decay = jax.tree.map(lambda _: True, params)
        inner = optax.sgd(1e-2)
        tx = bucketed(inner, params, decay)
        grads = rand_like(params, 7)
        u_b, _ = tx.update(grads, tx.init(params), params)
        u_p, _ = inner.update(grads, inner.init(params), params)
        assert jax.tree.all(jax.tree.map(
            lambda a, b: bool(jnp.array_equal(a, b)), u_b, u_p))


class TestTrainerGate:
    def test_tp_plus_on_raises(self):
        from prompt_tts_tpu.config import Config, ModelConfig
        from prompt_tts_tpu.data import SyntheticDataset
        from prompt_tts_tpu.train import Trainer
        mcfg = ModelConfig(
            block_out_channels=(32, 64), cross_attention_dim=64,
            attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
            sample_size=32, layers_per_block=1, unet_num_heads=4,
            down_block_types=("CrossAttnDownBlock1D", "DownBlock1D"),
            up_block_types=("UpBlock1D", "CrossAttnUpBlock1D"))
        cfg = Config(model=mcfg, train=TrainConfig(batch_size=4))
        data = SyntheticDataset(n=4, frames=32, max_seq_length=32)
        with pytest.raises(ValueError, match="TP-compatible"):
            Trainer(cfg, data, log_dir="/tmp/bucketed_gate", n_model=2,
                    bucketed_opt="on")

    def test_layout_mismatch_restore_is_actionable(self, tmp_path):
        """A checkpoint saved with the bucketed layout must fail restore
        into a per-leaf run with an error naming --bucketed_opt, not an
        opaque orbax tree mismatch (the layout is part of the checkpoint;
        train/loop.py restore_latest)."""
        from prompt_tts_tpu.config import Config, ModelConfig
        from prompt_tts_tpu.data import SyntheticDataset
        from prompt_tts_tpu.train import Trainer
        mcfg = ModelConfig(
            block_out_channels=(32, 64), cross_attention_dim=64,
            attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
            sample_size=32, layers_per_block=1, unet_num_heads=4,
            down_block_types=("CrossAttnDownBlock1D", "DownBlock1D"),
            up_block_types=("UpBlock1D", "CrossAttnUpBlock1D"))
        cfg = Config(model=mcfg, train=TrainConfig(batch_size=4))
        data = SyntheticDataset(n=4, frames=32, max_seq_length=32)
        a = Trainer(cfg, data, log_dir=str(tmp_path / "log"),
                    ckpt_dir=str(tmp_path / "ckpt"), bucketed_opt="on")
        assert a.ckpt.save(a.state, step=0, force=True, rng=a.rng)
        a.ckpt.wait()
        b = Trainer(cfg, data, log_dir=str(tmp_path / "log2"),
                    ckpt_dir=str(tmp_path / "ckpt"), bucketed_opt="off")
        with pytest.raises(RuntimeError, match="bucketed_opt"):
            b.restore_latest()
