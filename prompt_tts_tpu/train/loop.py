"""The training loop: epochs, SPMD step, metrics, checkpoints.

Equivalent of reference train.py:21-147, restructured for SPMD: no process
launcher, no DDP wrap, no gather/barrier — one jitted step over a device
mesh; metrics are written rank-0-style by the single controller process.
"""

import logging
import math
import time
from typing import Iterable, Optional

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import Config
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSPromptSpeaker, TTSSingleSpeaker
from prompt_tts_tpu.parallel import sp
from prompt_tts_tpu.parallel.mesh import (
    MODEL_AXIS, batch_key_sharding, make_mesh, seq_size, shard_batch,
    shard_local_batch,
)
from prompt_tts_tpu.parallel.tp import state_shardings
from prompt_tts_tpu.train.checkpoint import CheckpointManager
from prompt_tts_tpu.train.state import create_train_state
from prompt_tts_tpu.train.step import (
    jit_train_step,
    make_eval_step,
    make_train_step,
)
from prompt_tts_tpu.utils.debug import finite_or_warn
from prompt_tts_tpu.utils.metrics import MetricsWriter, NullMetricsWriter

log = logging.getLogger(__name__)


class Trainer:
    """Owns model/state/mesh and runs epochs over a dataset."""

    def __init__(
        self,
        config: Config,
        dataset,
        log_dir: str,
        ckpt_dir: Optional[str] = None,
        mesh=None,
        n_model: int = 1,
        n_seq: int = 1,
        dtype=jnp.float32,
        remat: bool = False,
        profile_steps: int = 0,
        eval_every: int = 0,
        eval_dataset=None,
        init_params=None,
        per_process_data: bool = False,
        dropout_rng_impl: str = "threefry",
        bucketed_opt: str = "auto",
        stacked_max_bytes: Optional[int] = 4 * 2**20,
        fused_attn_bwd: str = "auto",
        log_every: int = 0,
    ):
        # profile_steps > 0: capture a jax.profiler trace of that many steps
        # into <log_dir>/xprof (view with xprof/tensorboard-profile; note:
        # unsupported over tunneled single-chip dev setups).
        # n_model > 1: tensor-parallel training — the mesh model axis gets
        # n_model devices and params+moments are Megatron-sharded over it
        # (parallel/tp.py rules); the data axis takes the rest.
        # n_seq > 1: sequence-parallel training — latent time is sharded
        # over the mesh seq axis (convs get GSPMD halo exchange, self-
        # attention runs as ring attention; parallel/sp.py).
        # eval_every > 0: run a deterministic eval pass (Trainer.evaluate)
        # every that-many epochs, logged as Loss/eval.
        # init_params: warm-start params (e.g. a converted reference
        # ckpt_N.pt via models.convert.load_reference_checkpoint — the
        # migration path for users mid-training on the original repo);
        # must match the model's own init tree exactly. Optimizer state
        # starts fresh, as the reference's train.py would after its own
        # (absent) restore.
        # log_every: pull loss/grad_norm to the host (and NaN-guard them)
        # every N steps instead of every step.  0 = auto: 50 on TPU, 1
        # elsewhere.  Pulling a metric value is a blocking device sync —
        # per-step it serializes the host behind every step (and through
        # a tunneled dev chip costs more than the step itself), defeating
        # async dispatch; on the cadence, steps enqueue back-to-back and
        # the host input pipeline overlaps device compute.  The reference
        # logs its gathered loss every micro-step (train.py:110-113) —
        # semantics kept, cadence made a knob.
        # per_process_data (multihost only): each process loads/collates
        # only its 1/P row slice of every global batch (datasets'
        # ``process_shard``) and shard_local_batch assembles the global
        # arrays — per-host corpus I/O scales as 1/P instead of every
        # host replicating the full batch.
        self.profile_steps = profile_steps
        self.eval_every = eval_every
        if log_every < 0:
            raise ValueError(f"log_every must be >= 0, got {log_every}")
        self.log_every = log_every or (
            50 if jax.default_backend() == "tpu" else 1)
        self.eval_dataset = eval_dataset
        self.config = config
        self.dataset = dataset
        self._pshard = None
        if per_process_data and jax.process_count() > 1:
            n_proc = jax.process_count()
            if config.train.batch_size % n_proc:
                raise ValueError(
                    f"batch_size {config.train.batch_size} not divisible "
                    f"by process count {n_proc} (per_process_data)")
            self._pshard = (jax.process_index(), n_proc)
        self.mesh = (mesh if mesh is not None
                     else make_mesh(n_model=n_model, n_seq=n_seq))
        self._sp_mesh = self.mesh if seq_size(self.mesh) > 1 else None
        model_cls = (TTSPromptSpeaker if config.model.prompt_conditioning
                     else TTSSingleSpeaker)
        self.model = model_cls(config.model, dtype=dtype)
        self.schedule = linear_schedule(config.train.num_train_timesteps)
        # metrics are rank-gated: only process 0 writes event/JSONL files
        # (checkpoint saves stay all-process — orbax coordinates the
        # multihost write itself and REQUIRES every process to call save)
        self.metrics = (MetricsWriter(log_dir) if jax.process_index() == 0
                        else NullMetricsWriter(log_dir))
        self.ckpt = CheckpointManager(ckpt_dir) if ckpt_dir else None

        tcfg = config.train
        self.steps_per_epoch = max(
            1, math.ceil(len(dataset) / tcfg.batch_size))
        self.num_training_steps = (tcfg.num_train_epochs
                                   * self.steps_per_epoch)

        rng = jax.random.PRNGKey(tcfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        mcfg = config.model
        init_batch = (
            jnp.zeros((1, mcfg.sample_size, mcfg.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, mcfg.cmu_seq_len), jnp.int32),
            jnp.ones((1, mcfg.cmu_seq_len), jnp.int32),
        )
        if mcfg.prompt_conditioning:
            init_batch = init_batch + (
                jnp.zeros((1, mcfg.prompt_frames, mcfg.in_channels)),)
        params = jax.jit(self.model.init)(init_rng, *init_batch)
        if init_params is not None:
            params = self._adopt_init_params(params, init_params)
        # bucketed_opt: run clip+AdamW over shape-bucketed stacks of the
        # param tree.  STANDALONE the bucketed update wins big (58.0 ->
        # 9.5 ms on the flagship 245M tree, tools/abl_opt_shape.py: the
        # per-leaf chains are op-overhead-bound) — but inside the fused
        # step program it LOSES (tools/abl_step_matrix.py, same process
        # and data: 254.0 -> 280.7 ms/step with XLA attention backward,
        # 235.3 -> 246.5 with the fused one).  XLA overlaps the per-leaf
        # update chains with the tail of the backward; the stacked
        # layout serializes behind the gather/scatter of the buckets.
        # "auto" therefore resolves to OFF; "on" remains for layouts
        # where the standalone win transfers (and is TP-incompatible:
        # stacked moments have no per-leaf sharding). The optimizer-state
        # layout is part of the checkpoint: keep the setting consistent
        # across save/restore.
        # fused_attn_bwd: route attention backwards through the Pallas
        # fused-bwd kernel (ops/pallas/attention_bwd.py) — the primal
        # stays the XLA path, only jax.grad changes (measured 254.0 ->
        # 235.3 ms/step on the flagship batch-32 bf16 config,
        # tools/abl_step_matrix.py). "auto" arms it on TPU for dp/tp
        # meshes (multi-device dispatch runs under shard_map over the
        # data/model axes — ops.attention._fused_bwd_call); seq-parallel
        # meshes keep XLA autodiff/ring attention.
        if fused_attn_bwd not in ("auto", "on", "off"):
            raise ValueError(f"fused_attn_bwd must be auto/on/off, "
                             f"got {fused_attn_bwd!r}")
        self._fused_bwd = (
            fused_attn_bwd == "on"
            or (fused_attn_bwd == "auto"
                and jax.default_backend() == "tpu"
                and n_seq == 1))
        if bucketed_opt not in ("auto", "on", "off", "stacked"):
            raise ValueError(f"bucketed_opt must be auto/on/off/stacked, "
                             f"got {bucketed_opt!r}")
        use_buckets = bucketed_opt == "on"
        if (bucketed_opt in ("on", "stacked")
                and self.mesh.shape[MODEL_AXIS] > 1):
            raise ValueError(f"bucketed_opt={bucketed_opt!r} is not "
                             "TP-compatible: stacked optimizer moments "
                             "cannot be sharded per-leaf over the model "
                             "axis")
        # "stacked": params AND moments live shape-bucketed across steps
        # (train/stacked.py) — no per-step bucketing copies; checkpoints
        # stay canonical per-leaf (converted at the save/restore boundary
        # below), so unlike "on" the layout is not part of the checkpoint.
        # PARTIAL by default: FULL stacking OOM'd at the flagship
        # batch-32 point (the buckets + their sliced views double
        # params/grads at peak), so leaves above stacked_max_bytes stay
        # per-leaf — the census (tools/abl_leaf_sizes.py) puts 649/707
        # leaves under the 4 MiB default at ~1/3 the duplication.
        self._stacked_plan = None
        if bucketed_opt == "stacked":
            from prompt_tts_tpu.train.stacked import StackedPlan
            from prompt_tts_tpu.train.state import decay_mask
            self._stacked_plan = StackedPlan(params, decay_mask(params),
                                             max_leaf_bytes=stacked_max_bytes)
        self.state = create_train_state(
            self.model, params, tcfg, self.num_training_steps,
            bucketed_opt=use_buckets, stacked_plan=self._stacked_plan)
        # the step/eval apply: unstacks stacked params at trace time
        self._apply = self.state.apply_fn

        if self.mesh.shape[MODEL_AXIS] > 1:
            self._state_sharding = state_shardings(self.state, self.mesh)
            self.state = jax.device_put(self.state, self._state_sharding)
        else:
            self._state_sharding = None
        batch_sh = None
        if self._sp_mesh is not None:
            # peek one batch for its exact key set (datasets add extras
            # like code_len): jit in_shardings dicts must match the batch
            # pytree structure exactly.  An empty dataset falls back to
            # plain data-sharding (training is a no-op there anyway).
            peek = self.dataset.batches(tcfg.batch_size)
            try:
                example = next(peek)
                batch_sh = {k: batch_key_sharding(self.mesh, k)
                            for k in example}
            except StopIteration:
                log.warning("dataset yields no batch at batch_size=%d: "
                            "seq-sharding disabled", tcfg.batch_size)
                self._sp_mesh = None
            finally:
                # streaming datasets wrap batches() in prefetch(): close
                # the abandoned generator so its worker thread exits
                # instead of idling with prefetch_depth batches pinned
                if hasattr(peek, "close"):
                    peek.close()
        self._step_fn = jit_train_step(
            make_train_step(self._apply, self.schedule, remat=remat,
                            cond_dropout_prob=tcfg.cond_dropout_prob,
                            ema_decay=tcfg.ema_decay,
                            dropout_rng_impl=dropout_rng_impl),
            self.mesh,
            state_sharding=self._state_sharding,
            batch_sharding=batch_sh,
        )
        self.global_step = 0

    @staticmethod
    def _adopt_init_params(params, init_params):
        """Validate warm-start params against the model's own init tree
        (same leaves, same shapes) and adopt them at the init dtypes."""
        ref_paths = {jax.tree_util.keystr(p): l.shape for p, l in
                     jax.tree_util.tree_leaves_with_path(params)}
        got_paths = {jax.tree_util.keystr(p): jnp.shape(l) for p, l in
                     jax.tree_util.tree_leaves_with_path(init_params)}
        if ref_paths != got_paths:
            missing = sorted(set(ref_paths) - set(got_paths))[:5]
            extra = sorted(set(got_paths) - set(ref_paths))[:5]
            shapes = sorted(k for k in ref_paths
                            if k in got_paths
                            and ref_paths[k] != got_paths[k])[:5]
            raise ValueError(
                "init_params do not match this model config: "
                f"missing={missing} extra={extra} shape-mismatch={shapes} "
                "(is the config the checkpoint was trained under?)")
        return jax.tree.map(lambda p, q: jnp.asarray(q, p.dtype),
                            params, init_params)

    def _shard(self, batch):
        """Host batch -> sharded device arrays (global batches via
        shard_batch; per-process slices via shard_local_batch)."""
        if self._pshard is not None:
            return shard_local_batch(batch, self.mesh)
        return shard_batch(batch, self.mesh)

    def _sp_scope(self):
        """Arm ring-attention dispatch for this trainer's mesh only while
        its step traces (scoped — see parallel/sp.py; avoids leaking the
        process-global arming into other objects' lazy traces)."""
        if self._sp_mesh is None:
            import contextlib
            return contextlib.nullcontext()
        return sp.sequence_parallel(self._sp_mesh)

    def _attn_bwd_scope(self):
        """Arm the fused attention backward while this trainer's step
        traces (scoped like _sp_scope — the arming is process-global)."""
        if not self._fused_bwd:
            import contextlib
            return contextlib.nullcontext()
        from prompt_tts_tpu.ops.attention import fused_bwd_scope
        mesh = self.mesh if self.mesh.devices.size > 1 else None
        return fused_bwd_scope(mesh=mesh)

    def _ckpt_state(self):
        """The state in CHECKPOINT (canonical per-leaf) layout.

        The natively-stacked optimizer keeps params/EMA/moments bucketed
        on device; checkpoints stay canonical so they restore under any
        optimizer layout (train/stacked.py module docstring). Identity
        for every other layout (``bucketed_opt=on`` keeps its stacked
        moments in the checkpoint — that legacy coupling is documented
        on the flag)."""
        if self._stacked_plan is None:
            return self.state
        plan = self._stacked_plan
        return self.state.replace(
            params=plan.unstack_tree(self.state.params),
            ema_params=(None if self.state.ema_params is None
                        else plan.unstack_tree(self.state.ema_params)),
            opt_state=plan.canonicalize(self.state.opt_state),
        )

    def _adopt_ckpt_state(self, restored):
        """Inverse of :meth:`_ckpt_state`: restored canonical state ->
        this trainer's resident layout."""
        if self._stacked_plan is None:
            return restored
        plan = self._stacked_plan
        return restored.replace(
            params=plan.stack_tree(restored.params),
            ema_params=(None if restored.ema_params is None
                        else plan.stack_tree(restored.ema_params)),
            opt_state=plan.stack_subtrees(restored.opt_state),
        )

    def restore_latest(self) -> Optional[int]:
        if self.ckpt is None or self.ckpt.latest_step() is None:
            return None
        # older checkpoints have no rng entry; resume still works but the
        # PRNG stream restarts — detect that case explicitly so genuine
        # restore errors (corrupt opt_state etc.) propagate unmasked
        template = self._ckpt_state()
        try:
            if self.ckpt.has_item("rng"):
                restored, step, rng = self.ckpt.restore(template,
                                                        with_rng=True)
                if rng is not None:
                    self.rng = rng
            else:
                log.warning("checkpoint has no rng entry: resuming with a "
                            "fresh PRNG stream")
                restored, step = self.ckpt.restore(template)
            self.state = self._adopt_ckpt_state(restored)
        except Exception as e:
            # the opt-state pytree layout is part of the checkpoint: a
            # --bucketed_opt or gradient_accumulation_steps setting that
            # differs from the saving run changes the tree structure and
            # surfaces as an opaque orbax structure mismatch — name the
            # actual knobs instead (sharding/mesh changes are NOT this:
            # restore is mesh-elastic, see CheckpointManager.restore)
            msg = str(e)
            if ("structure" in msg or "tree" in msg or "match" in msg):
                # phrased as a HINT, not a diagnosis: the keyword match
                # is heuristic and unrelated failures (e.g. orbax shape/
                # checksum errors mentioning "mismatch") can land here —
                # the original exception is chained below either way
                raise RuntimeError(
                    "checkpoint restore failed (original error chained "
                    "below). If it is a pytree-STRUCTURE mismatch, this "
                    "usually means the optimizer-state layout differs "
                    "from the saving run: the layout depends on "
                    "--bucketed_opt (stacked vs per-leaf moments) and "
                    "train.gradient_accumulation_steps (MultiSteps "
                    "wrapper) — set them to the values the checkpoint "
                    "was saved with, or restore params only "
                    "(CheckpointManager.restore(params_only=True)) and "
                    "start a fresh optimizer.") from e
            raise
        self.global_step = step
        log.info("restored checkpoint at step %d", step)
        return step

    def train(self, epochs: Optional[int] = None) -> float:
        """Run the epoch loop; Ctrl-C checkpoints before exiting."""
        try:
            return self._train(epochs)
        except KeyboardInterrupt:
            if self.ckpt is not None:
                log.warning("interrupted: saving checkpoint at step %d",
                            self.global_step)
                self.ckpt.save(self._ckpt_state(), step=self.global_step,
                               force=True, rng=self.rng)
                self.ckpt.wait()
            raise

    def _train(self, epochs: Optional[int] = None) -> float:
        tcfg = self.config.train
        epochs = tcfg.num_train_epochs if epochs is None else epochs
        last_loss = float("nan")
        # resume continues the epoch sequence (data order seeds follow the
        # epoch index), rather than replaying epoch 0
        start_epoch = self.global_step // self.steps_per_epoch
        if start_epoch >= epochs:
            log.info("nothing to do: already at epoch %d of %d "
                     "(use --epochs to extend)", start_epoch, epochs)
            return last_loss
        self._tput_mark = None
        for epoch in range(start_epoch, epochs):
            log.info("Starting epoch %d", epoch)
            t_epoch = time.time()
            pending = None
            for batch in self.dataset.batches(
                    tcfg.batch_size, shuffle=True, seed=tcfg.seed + epoch,
                    process_shard=self._pshard):
                self.rng, step_rng = jax.random.split(self.rng)
                sharded = self._shard(batch)
                if (self.profile_steps
                        and self.global_step == 2):  # skip compile steps
                    import os
                    trace_dir = os.path.join(self.metrics._log_dir, "xprof")
                    jax.profiler.start_trace(trace_dir)
                with self._sp_scope(), self._attn_bwd_scope():
                    self.state, m = self._step_fn(self.state, sharded,
                                                  step_rng)
                self.global_step += 1
                if (self.profile_steps
                        and self.global_step == 2 + self.profile_steps):
                    jax.block_until_ready(m["loss"])
                    jax.profiler.stop_trace()
                    log.info("profiler trace written")
                # steps between cadence points only ENQUEUE: no host
                # read, no sync — the loop runs ahead of the device and
                # the next batch's collate overlaps this step's compute
                pending = m
                if self.global_step % self.log_every == 0:
                    last_loss = self._pull_metrics(m)
                    pending = None
            if pending is not None:  # epoch tail between cadence points
                last_loss = self._pull_metrics(pending)
            self.metrics.add_scalar("epoch_time_s", time.time() - t_epoch,
                                    self.global_step)
            if self.eval_every and (epoch + 1) % self.eval_every == 0:
                eval_loss = self.evaluate(self.eval_dataset)
                log.info("epoch %d eval loss: %f", epoch, eval_loss)
            if self.ckpt is not None and (
                    epoch % tcfg.save_per_epochs == 0
                    or epoch == epochs - 1):
                self.ckpt.save(self._ckpt_state(), step=self.global_step,
                               force=True, rng=self.rng)
            self.metrics.flush()
        if self.ckpt is not None:
            self.ckpt.wait()
        return last_loss

    def _pull_metrics(self, m) -> float:
        """Blocking pull of one step's metrics to the host (THE device
        sync of the training loop — runs on the log_every cadence).

        Logs loss/grad_norm at this step, NaN-guards them, and logs
        trainer throughput over the synced interval: the pull blocks
        until this step's program actually ran, so elapsed/steps since
        the previous pull is honest end-to-end trainer time (host input
        pipeline + dispatch + device compute), not a device-only number.
        """
        loss = float(m["loss"])
        now = time.time()
        metrics_now = {"loss": loss, "grad_norm": float(m["grad_norm"])}
        finite_or_warn(metrics_now, self.global_step, log)
        self.metrics.add_scalar("Loss/train", loss, self.global_step)
        self.metrics.add_scalar("grad_norm", metrics_now["grad_norm"],
                                self.global_step)
        if self._tput_mark is not None:
            t0, s0 = self._tput_mark
            steps = self.global_step - s0
            if steps > 0 and now > t0:
                exs = steps * self.config.train.batch_size / (now - t0)
                self.metrics.add_scalar("examples_per_s", exs,
                                        self.global_step)
                log.info("step %d: loss %.5f, %.1f examples/s",
                         self.global_step, loss, exs)
        # note: the FIRST interval of a run includes compile; read
        # steady-state throughput from the second cadence point onward
        self._tput_mark = (now, self.global_step)
        return loss

    def evaluate(self, dataset=None, seed: int = 0) -> float:
        """Mean deterministic eval loss over a dataset (default: train set).

        Uses a FIXED noise/timestep stream per batch index so eval losses
        are comparable across checkpoints.
        """
        dataset = dataset if dataset is not None else self.dataset
        tcfg = self.config.train
        if not hasattr(self, "_eval_fn"):
            self._eval_fn = jax.jit(
                make_eval_step(self._apply, self.schedule))
        total, n = 0.0, 0
        for i, batch in enumerate(dataset.batches(
                tcfg.batch_size, process_shard=self._pshard)):
            rng = jax.random.fold_in(jax.random.PRNGKey(seed), i)
            sharded = self._shard(batch)
            with self._sp_scope():
                total += float(self._eval_fn(self.state.params, sharded,
                                             rng))
            n += 1
        if n == 0:
            raise ValueError(
                f"evaluate(): dataset yielded no batches at batch_size="
                f"{tcfg.batch_size} (len={len(dataset)})")
        loss = total / n
        self.metrics.add_scalar("Loss/eval", loss, self.global_step)
        self.metrics.flush()
        return loss
