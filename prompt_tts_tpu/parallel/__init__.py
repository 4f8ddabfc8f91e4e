"""Parallelism: device mesh construction and sharding policy.

Replaces the reference's accelerate/NCCL DDP stack (reference
train.py:25-29, 67-69, 110, 139) with single-program SPMD over a
``jax.sharding.Mesh``: batches are sharded over the ``data`` axis, params
are replicated (with a ``model`` axis for tensor parallelism — tp.py —
and a ``seq`` axis for sequence parallelism — sp.py), gradients are
reduced by XLA-inserted collectives over ICI — no explicit
allreduce/gather/barrier calls anywhere.
"""

from prompt_tts_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    SEQ_AXIS,
    batch_sharding,
    batch_shardings,
    make_mesh,
    replicated,
    seq_size,
)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "SEQ_AXIS", "make_mesh",
           "batch_sharding", "batch_shardings", "replicated", "seq_size"]
