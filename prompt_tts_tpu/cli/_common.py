"""Shared CLI helpers (checkpoint restore for inference entry points).

One restore path for ``synthesize``/``serve``: builds the restore template
for the config's model family (single-speaker or prompt-conditioned — the
reference only ever had the former, tts/models.py:123), optionally selects
the EMA average, and fails fast BEFORE the expensive restore when the
requested item cannot exist.
"""

import logging
from typing import Tuple

log = logging.getLogger(__name__)


def restore_model_params(ckpt_dir: str, cfg, ema: bool = False
                         ) -> Tuple[dict, int]:
    """Restore model params (or ``ema_params`` with ``ema=True``) from an
    orbax checkpoint dir; returns ``(params, step)``.

    Raises ``SystemExit`` with a user-facing message when ``ema`` is
    requested but the checkpoint was trained without ``--ema_decay``
    (checked before the restore — minutes matter through a TPU tunnel).
    """
    import jax
    import jax.numpy as jnp

    from prompt_tts_tpu.models import TTSPromptSpeaker, TTSSingleSpeaker
    from prompt_tts_tpu.train.checkpoint import CheckpointManager
    from prompt_tts_tpu.train.state import create_train_state

    mcfg = cfg.model
    model_cls = (TTSPromptSpeaker if mcfg.prompt_conditioning
                 else TTSSingleSpeaker)
    model = model_cls(mcfg)
    ids = jnp.zeros((1, mcfg.cmu_seq_len), jnp.int32)
    init_args = (
        jnp.zeros((1, mcfg.sample_size, mcfg.in_channels)),
        jnp.zeros((1,), jnp.int32), ids, jnp.ones_like(ids))
    if mcfg.prompt_conditioning:
        init_args = init_args + (
            jnp.zeros((1, mcfg.prompt_frames, mcfg.in_channels)),)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *init_args)
    state = create_train_state(model, params, cfg.train, 1)

    mgr = CheckpointManager(ckpt_dir)
    if ema:
        step = mgr.latest_step()
        if step is None or not mgr.has_item("ema_params", step):
            raise SystemExit(
                f"--ema: checkpoint {ckpt_dir} (step {step}) has no "
                "ema_params (train with --ema_decay to produce one)")
        # restore target needs the ema slot regardless of the train
        # config the checkpoint was written under
        state = state.replace(ema_params=params)
    # params_only: this consumer never touches the optimizer, and the
    # opt-state layout is training-config-dependent (bucketed_opt)
    state, step = mgr.restore(state, params_only=True)
    log.info("restored checkpoint at step %d%s", step,
             " (EMA params)" if ema else "")
    return (state.ema_params if ema else state.params), step
