"""Fused attention backward (ops/pallas/attention_bwd.py): gradient
equivalence vs XLA autodiff, primal bit-identity, and dispatcher arming.

Kernel runs under the Pallas interpreter on CPU (same pattern as
test_pallas_kernels.py); the TPU timing evidence lives in
tools/abl_attn_bwd.py / ARCHITECTURE.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from prompt_tts_tpu.ops import attention as attn_mod
from prompt_tts_tpu.ops.attention import (
    _xla_attention, fused_bwd_scope, scaled_dot_product_attention,
)
from prompt_tts_tpu.ops.pallas.attention_bwd import attention_fused_bwd


def make_qkv(B, Tq, Tk, H, D, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (B, Tq, H, D), dtype)
    k = jax.random.normal(ks[1], (B, Tk, H, D), dtype)
    v = jax.random.normal(ks[2], (B, Tk, H, D), dtype)
    mask = (jax.random.uniform(ks[3], (B, Tk)) > 0.2).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)  # never a fully-masked row
    bias = jnp.where(mask > 0, 0.0, -1e4)[:, None, None, :]
    return q, k, v, bias


def grads_of(fn, q, k, v, bias, seed=9):
    w = jax.random.normal(jax.random.PRNGKey(seed),
                          fn(q, k, v, bias).shape, jnp.float32)

    def loss(q, k, v):
        return jnp.sum(fn(q, k, v, bias).astype(jnp.float32) * w)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


# (B, Tq, Tk, H, D): block-unaligned lengths, the model's head dims
SHAPES = [
    (2, 113, 113, 4, 32),    # one partial q block, D=32 (C=256 level)
    (2, 129, 57, 2, 64),     # crosses the 128 q-block boundary
    (1, 48, 96, 3, 96),      # D=96 (C=768 level), Tq != Tk (cross-attn)
]


class TestGradEquivalence:
    @pytest.mark.parametrize("shape", SHAPES)
    @pytest.mark.parametrize("with_bias", [False, True])
    def test_f32_matches_autodiff(self, shape, with_bias):
        q, k, v, bias = make_qkv(*shape)
        bias = bias if with_bias else None
        ref = grads_of(_xla_attention, q, k, v, bias)
        with pltpu.force_tpu_interpret_mode():
            got = grads_of(attention_fused_bwd, q, k, v, bias)
        for r, g, name in zip(ref, got, "qkv"):
            np.testing.assert_allclose(
                g, r, rtol=2e-5, atol=2e-5,
                err_msg=f"d{name} mismatch at {shape} bias={with_bias}")

    def test_bf16_same_gradient_class(self):
        q, k, v, bias = make_qkv(2, 113, 57, 4, 32, dtype=jnp.bfloat16)
        ref = grads_of(_xla_attention, q, k, v, bias)
        with pltpu.force_tpu_interpret_mode():
            got = grads_of(attention_fused_bwd, q, k, v, bias)
        for r, g, name in zip(ref, got, "qkv"):
            # bf16: the kernel recomputes probs in f32 while autodiff
            # differentiates the bf16-stored scores — O(bf16 eps) apart
            np.testing.assert_allclose(
                np.asarray(g, np.float32), np.asarray(r, np.float32),
                rtol=0.08, atol=0.08, err_msg=f"d{name}")

    @pytest.mark.parametrize("shape", SHAPES)
    def test_bias_gradient_matches_autodiff(self, shape):
        """The [B,1,1,Tk] bias receives its REAL cotangent (ds reduced
        over heads/q rows), not a silent zero (r4 advisor finding)."""
        q, k, v, bias = make_qkv(*shape)
        w = jax.random.normal(jax.random.PRNGKey(9),
                              _xla_attention(q, k, v, bias).shape)

        def loss_of(fn):
            return lambda b: jnp.sum(
                fn(q, k, v, b).astype(jnp.float32) * w)

        ref = jax.grad(loss_of(_xla_attention))(bias)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_of(attention_fused_bwd))(bias)
        assert float(jnp.abs(ref).max()) > 0  # the test has teeth
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_fully_padded_keys_get_zero_grad(self):
        """Keys masked out on every row must receive exactly zero dk/dv."""
        q, k, v, _ = make_qkv(2, 64, 64, 2, 32)
        mask = jnp.ones((2, 64)).at[:, 48:].set(0.0)
        bias = jnp.where(mask > 0, 0.0, -1e9)[:, None, None, :]
        with pltpu.force_tpu_interpret_mode():
            _, dk, dv = grads_of(attention_fused_bwd, q, k, v, bias)
        assert float(jnp.abs(dk[:, 48:]).max()) == 0.0
        assert float(jnp.abs(dv[:, 48:]).max()) == 0.0


class TestPrimal:
    def test_primal_is_bit_identical_to_xla_path(self):
        q, k, v, bias = make_qkv(2, 90, 55, 4, 32)
        a = _xla_attention(q, k, v, bias)
        b = attention_fused_bwd(q, k, v, bias)
        assert jnp.array_equal(a, b)

    def test_armed_dispatch_primal_unchanged(self):
        q, k, v, bias = make_qkv(2, 90, 55, 4, 32)
        base = scaled_dot_product_attention(q, k, v, bias)
        with fused_bwd_scope():
            armed = scaled_dot_product_attention(q, k, v, bias)
        assert jnp.array_equal(base, armed)


class TestArming:
    def test_scope_restores(self):
        assert not attn_mod._FUSED_BWD_ARMED[0]
        with fused_bwd_scope():
            assert attn_mod._FUSED_BWD_ARMED[0]
        assert not attn_mod._FUSED_BWD_ARMED[0]

    def test_rich_bias_falls_back(self):
        q, k, v, _ = make_qkv(2, 32, 32, 2, 32)
        full_bias = jnp.zeros((2, 2, 32, 32))
        with fused_bwd_scope():
            assert not attn_mod._use_fused_bwd(q, k, v, full_bias)
            assert attn_mod._use_fused_bwd(q, k, v, None)

    def test_min_tq_gate(self):
        q, k, v, _ = make_qkv(2, 450, 450, 2, 32)
        q9 = jnp.concatenate([q, q], axis=1)          # Tq = 900
        with fused_bwd_scope(min_tq=600):
            assert not attn_mod._use_fused_bwd(q, k, v, None)
            assert attn_mod._use_fused_bwd(q9, k, v, None)
        # scope exit restores the unrestricted default
        with fused_bwd_scope():
            assert attn_mod._use_fused_bwd(q, k, v, None)

    def test_vmem_gate_is_byte_budget(self):
        """The eligibility gate bounds the kernel's actual resident
        bytes — K/V panels (double-buffered), f32 dk/dv accumulators,
        score-block temporaries, and the q-side blocks — not Tk alone
        (r4 advisor finding; byte model recalibrated r5 after the f32
        text-encoder site measured 19.10 MiB scoped-vmem actual on the
        chip against the old K/V-only estimate of 7.9 MiB and failed
        at compile)."""
        mk = lambda Tk, H, D, dt: tuple(
            jnp.zeros(s, dt) for s in [(2, 128, H, D)] + [(2, Tk, H, D)] * 2)
        with fused_bwd_scope():
            # the real flagship sites stay eligible: text-encoder
            # Tk=550, H*D=768 bf16 (~11.1 MiB est; runs on-chip) and
            # UNet Tk=900, H*D=256 bf16 (~6.9 MiB est)
            q, k, v = mk(550, 12, 64, jnp.bfloat16)
            assert attn_mod._use_fused_bwd(q, k, v, None)
            q, k, v = mk(900, 8, 32, jnp.bfloat16)
            assert attn_mod._use_fused_bwd(q, k, v, None)
            # the SAME text-encoder site in f32 measured 19.10 MiB on
            # the chip (> the 16 MiB scoped limit): must fall back
            q, k, v = mk(550, 12, 64, jnp.float32)
            assert not attn_mod._use_fused_bwd(q, k, v, None)
            # wide heads: Tk=4096, H*D=1024 bf16 -> ~65 MiB: fall back
            q, k, v = mk(4096, 8, 128, jnp.bfloat16)
            assert not attn_mod._use_fused_bwd(q, k, v, None)
            # f32 doubles the panel bytes: Tk=2048, H*D=768 f32 ->
            # ~50 MiB: fall back
            q, k, v = mk(2048, 8, 96, jnp.float32)
            assert not attn_mod._use_fused_bwd(q, k, v, None)

    def test_env_override(self, monkeypatch):
        q, k, v, _ = make_qkv(2, 32, 32, 2, 32)
        monkeypatch.setenv("PROMPT_TTS_TPU_ATTN_BWD", "xla")
        with fused_bwd_scope():
            assert not attn_mod._use_fused_bwd(q, k, v, None)
        monkeypatch.setenv("PROMPT_TTS_TPU_ATTN_BWD", "pallas")
        assert attn_mod._use_fused_bwd(q, k, v, None)


class TestShardedDispatch:
    """Multi-device arming: eligible sites run under shard_map over the
    mesh's (data, model) axes — batch/head-independent, no collectives —
    so dp/tp training gets the fused backward too (seq meshes are ring
    attention's; they must fall back)."""

    def _compare(self, mesh, B, H, Tq=129):
        # Tq=129 crosses the 128 q-block boundary; the TP cases shrink
        # to one q-block (Tq=65) — the interpreter cost is per
        # (shard, q-block, head) and the head-sharding logic under test
        # is block-count-independent (boundary coverage lives in
        # test_dp_mesh and TestGradEquivalence)
        q, k, v, bias = make_qkv(B, Tq, 57, H, 32)
        ref = grads_of(_xla_attention, q, k, v, bias)
        with fused_bwd_scope(mesh=mesh), \
                pltpu.force_tpu_interpret_mode():
            assert attn_mod._use_fused_bwd(q, k, v, bias)
            got = grads_of(scaled_dot_product_attention, q, k, v, bias)
        for r, g, name in zip(ref, got, "qkv"):
            np.testing.assert_allclose(
                g, r, rtol=2e-5, atol=2e-5,
                err_msg=f"d{name} mismatch on mesh {dict(mesh.shape)}")

    def test_dp_mesh(self):
        from prompt_tts_tpu.parallel.mesh import make_mesh
        self._compare(make_mesh(n_data=8), B=8, H=2)

    def test_dp_tp_mesh(self):
        from prompt_tts_tpu.parallel.mesh import make_mesh
        self._compare(make_mesh(n_data=4, n_model=2), B=4, H=4, Tq=65)

    def test_tp_indivisible_heads_stay_replicated(self):
        # model axis 2 with 3 heads: dp sharding alone is still valid
        from prompt_tts_tpu.parallel.mesh import make_mesh
        self._compare(make_mesh(n_data=4, n_model=2), B=4, H=3, Tq=65)

    def test_seq_mesh_falls_back(self):
        from prompt_tts_tpu.parallel.mesh import make_mesh
        q, k, v, bias = make_qkv(2, 64, 64, 2, 32)
        with fused_bwd_scope(mesh=make_mesh(n_data=2, n_seq=4)):
            assert not attn_mod._use_fused_bwd(q, k, v, bias)

    def test_indivisible_batch_falls_back(self):
        from prompt_tts_tpu.parallel.mesh import make_mesh
        q, k, v, bias = make_qkv(3, 64, 64, 2, 32)
        with fused_bwd_scope(mesh=make_mesh(n_data=8)):
            assert not attn_mod._use_fused_bwd(q, k, v, bias)


class TestComposition:
    """The fused backward must compose with the train step's other
    features: remat (jax.checkpoint replays the primal; custom_vjp must
    survive it), gradient accumulation (optax.MultiSteps), and in-program
    EMA.  Each case diffs the fused arm against XLA autodiff at f32
    tolerance on a tiny-but-real model."""

    def _tiny(self):
        from prompt_tts_tpu.config import Config, ModelConfig, TrainConfig
        mcfg = ModelConfig(
            block_out_channels=(32, 64), cross_attention_dim=64,
            attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
            sample_size=32, layers_per_block=1, unet_num_heads=4,
            down_block_types=("CrossAttnDownBlock1D", "DownBlock1D"),
            up_block_types=("UpBlock1D", "CrossAttnUpBlock1D"))
        return Config(model=mcfg, train=TrainConfig(batch_size=4))

    def _batch(self, cfg, B=4):
        import numpy as np
        rng = np.random.default_rng(0)
        T, S = cfg.model.sample_size, cfg.model.cmu_seq_len
        mask = np.zeros((B, S), np.float32)
        for i in range(B):
            mask[i, : int(rng.integers(S // 2, S))] = 1.0
        return {
            "codes": jnp.asarray(
                rng.uniform(-1, 1, (B, T, cfg.model.in_channels))
            ).astype(jnp.float32),
            "text_ids": jnp.asarray(
                rng.integers(0, 148, (B, S)), jnp.int32) * jnp.asarray(
                mask, jnp.int32),
            "text_mask": jnp.asarray(mask),
        }

    @pytest.mark.parametrize("remat", [False, True])
    def test_loss_grads_with_remat(self, remat):
        from prompt_tts_tpu.diffusion.schedule import linear_schedule
        from prompt_tts_tpu.models import TTSSingleSpeaker
        from prompt_tts_tpu.train.step import make_loss_fn
        cfg = self._tiny()
        model = TTSSingleSpeaker(cfg.model)
        batch = self._batch(cfg)
        params = model.init(
            jax.random.PRNGKey(0), batch["codes"][:1],
            jnp.zeros((1,), jnp.int32), batch["text_ids"][:1],
            batch["text_mask"][:1])
        loss_fn = make_loss_fn(model.apply, linear_schedule(), remat=remat)
        rng = jax.random.PRNGKey(3)
        ref = jax.grad(loss_fn)(params, batch, rng)
        with fused_bwd_scope(), pltpu.force_tpu_interpret_mode():
            got = jax.grad(loss_fn)(params, batch, rng)
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(ref),
                jax.tree_util.tree_leaves_with_path(got)):
            np.testing.assert_allclose(
                b, a, rtol=3e-5, atol=3e-5,
                err_msg=f"remat={remat} {jax.tree_util.keystr(pa)}")

    def test_accumulation_and_ema_updates_match(self):
        """Two micro-steps through MultiSteps(2) + EMA: params and
        ema_params after the optimizer boundary match XLA autodiff."""
        import dataclasses
        from prompt_tts_tpu.diffusion.schedule import linear_schedule
        from prompt_tts_tpu.models import TTSSingleSpeaker
        from prompt_tts_tpu.train import create_train_state
        from prompt_tts_tpu.train.step import make_train_step
        cfg = self._tiny()
        tcfg = dataclasses.replace(
            cfg.train, gradient_accumulation_steps=2, ema_decay=0.5,
            learning_rate=1e-3, lr_warmup_steps=0)
        model = TTSSingleSpeaker(cfg.model)
        batch = self._batch(cfg)
        params = model.init(
            jax.random.PRNGKey(0), batch["codes"][:1],
            jnp.zeros((1,), jnp.int32), batch["text_ids"][:1],
            batch["text_mask"][:1])
        step = make_train_step(model.apply, linear_schedule(),
                               ema_decay=tcfg.ema_decay)

        def run(armed):
            st = create_train_state(model, params, tcfg, 100)
            ctx = fused_bwd_scope() if armed else \
                __import__("contextlib").nullcontext()
            acc = None
            with ctx, pltpu.force_tpu_interpret_mode():
                for i in range(2):
                    st, _ = step(st, batch,
                                 jax.random.fold_in(jax.random.PRNGKey(5),
                                                    i))
                    if i == 0:   # mid-accumulation: grads parked, no
                        acc = st.opt_state.acc_grads   # update applied
            return st, acc

        (a, acc_a), (b, acc_b) = run(False), run(True)
        # tight contract: the ACCUMULATED grads entering the boundary
        # match (per-call grads agree to ~2e-5; MultiSteps just averages)
        for (pa, x), (_, y) in zip(
                jax.tree_util.tree_leaves_with_path(acc_a),
                jax.tree_util.tree_leaves_with_path(acc_b)):
            np.testing.assert_allclose(
                y, x, rtol=3e-5, atol=3e-5,
                err_msg=f"acc_grads {jax.tree_util.keystr(pa)}")
        # The TIGHT composition contract is the accumulated gradient at
        # the MultiSteps boundary (grads agree per call to ~2e-5, and
        # accumulation is a mean).  Comparing post-Adam PARAMS tightly is
        # ill-conditioned by construction: after one boundary the update
        # is lr*g/(|g|+eps) ~ lr*sign(g), so a ~1e-8 gradient difference
        # on a near-zero component legitimately flips a +-lr update —
        # observed flaking at any fixed tolerance below lr (r4/r5).  The
        # trajectory-level evidence for the default path lives in the
        # on-chip A/B (tools/traj_ab_tpu.py, BENCHMARKS "Training
        # parity"), where loss curves — insensitive to near-zero-grad
        # sign flips — are compared over hundreds of steps.
        lr = tcfg.learning_rate
        for (pa, x), (_, y) in zip(
                jax.tree_util.tree_leaves_with_path(a.params),
                jax.tree_util.tree_leaves_with_path(b.params)):
            np.testing.assert_allclose(
                y, x, rtol=0, atol=2.1 * lr,  # one boundary: |du| <= lr
                err_msg=f"params {jax.tree_util.keystr(pa)}")
        # EMA correctness is exact WITHIN each run: after one boundary,
        # ema = decay*init + (1-decay)*params (lerp in f32)
        for st in (a, b):
            expect = jax.tree.map(
                lambda p0, p1: 0.5 * p0 + 0.5 * p1, params, st.params)
            for (pa, x), (_, y) in zip(
                    jax.tree_util.tree_leaves_with_path(expect),
                    jax.tree_util.tree_leaves_with_path(st.ema_params)):
                np.testing.assert_allclose(
                    y, x, rtol=1e-6, atol=1e-7,
                    err_msg=f"ema {jax.tree_util.keystr(pa)}")


class TestInContext:
    def test_attention_module_grads_match(self):
        """End-to-end through the model's CrossAttention module: armed
        dispatch + interpreter kernel vs the default path."""
        from prompt_tts_tpu.models.layers import Attention
        B, T, C = 2, 40, 64
        x = jax.random.normal(jax.random.PRNGKey(0), (B, T, C))
        mod = Attention(num_heads=2, head_dim=32)
        params = mod.init(jax.random.PRNGKey(1), x)

        def f_of(p):
            return jnp.sum(mod.apply(p, x).astype(jnp.float32) ** 2)

        ref = jax.grad(f_of)(params)
        with fused_bwd_scope(), pltpu.force_tpu_interpret_mode():
            got = jax.grad(f_of)(params)
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(ref),
                jax.tree_util.tree_leaves_with_path(got)):
            np.testing.assert_allclose(
                b, a, rtol=2e-5, atol=2e-5,
                err_msg=jax.tree_util.keystr(pa))
