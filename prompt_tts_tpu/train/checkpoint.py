"""Checkpointing with restore — orbax-backed, step-based.

The reference saves rank-0 state_dicts per epoch but has NO load path at
all (SURVEY.md §5: train.py:139-144, no restore anywhere).  Here both
directions are first-class: async-capable orbax save of
{params, opt_state, step} plus restore-latest for resumption.
"""

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from prompt_tts_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        self._dir = os.path.abspath(ckpt_dir)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, state: TrainState, step: Optional[int] = None,
             force: bool = False, rng=None) -> bool:
        step = int(state.step if step is None else step)
        composite = {
            "params": ocp.args.StandardSave(state.params),
            "opt_state": ocp.args.StandardSave(state.opt_state),
        }
        if state.ema_params is not None:
            composite["ema_params"] = ocp.args.StandardSave(state.ema_params)
        if rng is not None:
            # save the training PRNG key (legacy uint32 layout) for exact
            # resume
            composite["rng"] = ocp.args.ArraySave(jax.numpy.asarray(rng))
        saved = self._mgr.save(
            step, args=ocp.args.Composite(**composite), force=force)
        return bool(saved)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def has_item(self, name: str, step: Optional[int] = None) -> bool:
        """Whether checkpoint ``step`` contains composite item ``name``.

        Lets callers distinguish "legacy checkpoint without an rng entry"
        from genuine restore corruption (instead of a blanket except).
        """
        step = self.latest_step() if step is None else step
        if step is None:
            return False
        # orbax lays composite items out as per-item subdirectories
        if os.path.isdir(os.path.join(self._dir, str(step), name)):
            return True
        try:
            meta = self._mgr.item_metadata(step)
        except Exception:
            return False
        try:
            return name in meta
        except TypeError:
            return getattr(meta, name, None) is not None

    def restore(self, state: TrainState, step: Optional[int] = None,
                with_rng: bool = False, params_only: bool = False):
        """Restore params/opt_state (and optionally the PRNG key).

        Returns ``(state, step)`` or ``(state, step, rng)``.

        ``params_only=True`` skips the optimizer state entirely — the
        inference/eval restore path.  The opt-state pytree layout depends
        on the training configuration (``bucketed_opt`` stacks the
        moments — train/bucketed.py), and consumers that only need
        params must not couple to it.

        MESH-ELASTIC: the template ``state``'s leaves carry their own
        shardings, and orbax lays every restored array out per the
        TEMPLATE — the on-disk checkpoint is topology-agnostic.  A state
        saved under a 4x2 tp-sharded mesh restores bit-equal onto a pure
        8x1 dp mesh, a 2x4 mesh (different TP degree), or one device:
        build the fresh state under the NEW mesh/shardings and restore
        into it (the preemption/rescale path;
        tests/test_tp.py::TestMeshElasticRestore).
        """
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        composite = {
            "params": ocp.args.StandardRestore(state.params),
        }
        if not params_only:
            composite["opt_state"] = ocp.args.StandardRestore(
                state.opt_state)
        want_ema = (state.ema_params is not None
                    and self.has_item("ema_params", step))
        if want_ema:
            composite["ema_params"] = ocp.args.StandardRestore(
                state.ema_params)
        if with_rng:
            composite["rng"] = ocp.args.ArrayRestore()
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(**composite))
        state = state.replace(params=restored["params"], step=step)
        if not params_only:
            state = state.replace(opt_state=restored["opt_state"])
        if state.ema_params is not None:
            # legacy checkpoint without an EMA entry: re-seed the average
            # from the restored params, as a REAL copy (aliased leaves
            # would be donated twice by the train step and rejected)
            state = state.replace(
                ema_params=restored["ema_params"] if want_ema
                else jax.tree.map(lambda x: jax.numpy.array(x),
                                  restored["params"]))
        if with_rng:
            rng = restored.get("rng")
            rng = None if rng is None else jax.numpy.asarray(rng)
            return state, step, rng
        return state, step

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
