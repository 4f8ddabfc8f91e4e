"""Training: SPMD step, optimizer chain, loop, checkpointing, LR schedules."""

from prompt_tts_tpu.train.checkpoint import CheckpointManager
from prompt_tts_tpu.train.loop import Trainer
from prompt_tts_tpu.train.state import TrainState, create_train_state, make_optimizer
from prompt_tts_tpu.train.step import (
    jit_train_step,
    make_eval_step,
    make_eval_step_at,
    make_loss_fn,
    make_train_step,
)

__all__ = [
    "CheckpointManager", "Trainer", "TrainState", "create_train_state",
    "make_optimizer", "jit_train_step", "make_eval_step",
    "make_eval_step_at", "make_loss_fn", "make_train_step",
]
