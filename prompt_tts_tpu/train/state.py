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


def decay_mask(params):
    """Per-leaf AdamW weight-decay mask for the model's param tree.

    torch registers frozen buffers OUTSIDE the optimizer; the one
    param-shaped buffer here is GaussianFourierProjection's weight
    (models/embeddings.py — requires_grad=False in torch). Its grads
    are already stop_gradient-zeroed; masking it from adamw keeps
    DECOUPLED weight decay from shrinking it too. Everything else
    decays, matching the reference (train.py:41-47 passes all params).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, _: not (
            len(path) >= 2
            and getattr(path[-2], "key", None) == "time_proj"
            and getattr(path[-1], "key", None) == "weight"),
        params)


def make_optimizer(
    cfg: TrainConfig,
    num_training_steps: int,
    params: Any = None,
    bucketed_opt: bool = False,
    stacked_plan=None,
) -> optax.GradientTransformation:
    """``bucketed_opt=True`` runs the clip+AdamW chain over shape-bucketed
    stacks of the param tree (requires ``params`` for the static plan):
    measured 58.0 -> 9.5 ms/update on the flagship 245M tree — the
    per-leaf update chains are op-overhead-bound, see train/bucketed.py.

    ``stacked_plan`` (a train/stacked.StackedPlan) instead builds the
    chain directly over the NATIVELY-stacked layout: the state's params
    ARE the bucket dict, so grads/params/updates all arrive stacked and
    there are no per-step bucketing copies at all (train/stacked.py).

    Neither mode is TP-compatible (stacked moments defeat per-leaf
    sharding)."""
    if bucketed_opt and stacked_plan is not None:
        raise ValueError("bucketed_opt and stacked_plan are exclusive "
                         "optimizer layouts")
    schedule = get_schedule(
        cfg.lr_scheduler,
        learning_rate=cfg.learning_rate,
        num_warmup_steps=cfg.lr_warmup_steps,
        num_training_steps=num_training_steps,
    )
    if stacked_plan is not None:
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(
                learning_rate=schedule,
                b1=cfg.adam_b1,
                b2=cfg.adam_b2,
                eps=cfg.adam_eps,
                weight_decay=cfg.weight_decay,
                # per-bucket bools: buckets never mix decay flags
                mask=stacked_plan.decay_mask(),
            ),
        )
    elif bucketed_opt:
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
    stacked_plan=None,
) -> TrainState:
    """``stacked_plan`` switches the state to the natively-stacked
    layout (train/stacked.py): ``state.params``/``ema_params`` become
    the bucket dict and ``apply_fn`` unstacks at trace time.  Callers
    that step the model must use the returned state's ``apply_fn``
    (Trainer does), and convert to the canonical layout at checkpoint
    boundaries (``plan.canonicalize``)."""
    apply_fn = model.apply
    if stacked_plan is not None:
        params = stacked_plan.stack_tree(params)
        apply_fn = stacked_plan.wrap_apply(model.apply)
    # a REAL copy, not an identity tree.map: aliased leaves would put the
    # same buffer in the donated TrainState twice (params + ema), which
    # XLA rejects at execute time ("attempt to donate the same buffer
    # twice")
    ema = (jax.tree.map(lambda x: jnp.array(x), params)
           if getattr(cfg, "ema_decay", 0.0) > 0.0 else None)
    return TrainState.create(
        apply_fn=apply_fn,
        params=params,
        tx=make_optimizer(cfg, num_training_steps, params=params,
                          bucketed_opt=bucketed_opt,
                          stacked_plan=stacked_plan),
        ema_params=ema,
    )
