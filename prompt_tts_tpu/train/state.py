"""Train state: params + optimizer chain matching the reference recipe.

Optimizer (reference train.py:41-47, 116-117): AdamW lr 1e-5,
betas (0.95, 0.999), eps 1e-8, weight decay 1e-6, global-norm clip 1.0.
Gradient accumulation (reference train.py:27, 80) is ``optax.MultiSteps``.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from prompt_tts_tpu.config import TrainConfig
from prompt_tts_tpu.train.lr import get_schedule


class TrainState(train_state.TrainState):
    """flax TrainState; ``apply_fn`` is model.apply.

    ``ema_params``: exponential moving average of the params (None when
    EMA is off).  Standard diffusion-training practice the reference
    lacks entirely; sampling from the EMA weights is markedly more
    stable than from the raw optimizer iterates.
    """

    ema_params: Any = None


def make_optimizer(
    cfg: TrainConfig,
    num_training_steps: int,
    params: Any = None,
    bucketed_opt: bool = False,
) -> optax.GradientTransformation:
    """``bucketed_opt=True`` runs the clip+AdamW chain over shape-bucketed
    stacks of the param tree (requires ``params`` for the static plan):
    measured 58.0 -> 9.5 ms/update on the flagship 245M tree — the
    per-leaf update chains are op-overhead-bound, see train/bucketed.py.
    Not TP-compatible (stacked moments defeat per-leaf sharding)."""
    schedule = get_schedule(
        cfg.lr_scheduler,
        learning_rate=cfg.learning_rate,
        num_warmup_steps=cfg.lr_warmup_steps,
        num_training_steps=num_training_steps,
    )
    def decay_mask(params):
        # torch registers frozen buffers OUTSIDE the optimizer; the one
        # param-shaped buffer here is GaussianFourierProjection's weight
        # (models/embeddings.py — requires_grad=False in torch). Its grads
        # are already stop_gradient-zeroed; masking it from adamw keeps
        # DECOUPLED weight decay from shrinking it too. Everything else
        # decays, matching the reference (train.py:41-47 passes all
        # params).
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not (
                len(path) >= 2
                and getattr(path[-2], "key", None) == "time_proj"
                and getattr(path[-1], "key", None) == "weight"),
            params)

    if bucketed_opt:
        if params is None:
            raise ValueError("bucketed_opt needs the param tree for its "
                             "static bucketing plan")
        from prompt_tts_tpu.train.bucketed import bucketed, plan_buckets
        decay_tree = decay_mask(params)
        _, _, flags = plan_buckets(params, decay_tree)
        inner = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(
                learning_rate=schedule,
                b1=cfg.adam_b1,
                b2=cfg.adam_b2,
                eps=cfg.adam_eps,
                weight_decay=cfg.weight_decay,
                # per-bucket bools: buckets never mix decay flags
                mask=list(flags),
            ),
        )
        tx = bucketed(inner, params, decay_tree)
    else:
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(
                learning_rate=schedule,
                b1=cfg.adam_b1,
                b2=cfg.adam_b2,
                eps=cfg.adam_eps,
                weight_decay=cfg.weight_decay,
                mask=decay_mask,
            ),
        )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


def create_train_state(
    model,
    params,
    cfg: TrainConfig,
    num_training_steps: int,
    bucketed_opt: bool = False,
) -> TrainState:
    # a REAL copy, not an identity tree.map: aliased leaves would put the
    # same buffer in the donated TrainState twice (params + ema), which
    # XLA rejects at execute time ("attempt to donate the same buffer
    # twice")
    ema = (jax.tree.map(lambda x: jnp.array(x), params)
           if getattr(cfg, "ema_decay", 0.0) > 0.0 else None)
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=make_optimizer(cfg, num_training_steps, params=params,
                          bucketed_opt=bucketed_opt),
        ema_params=ema,
    )
