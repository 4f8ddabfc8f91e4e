"""Parallelism: device mesh construction and sharding policy.

Replaces the reference's accelerate/NCCL DDP stack (reference
train.py:25-29, 67-69, 110, 139) with single-program SPMD over a
``jax.sharding.Mesh``: batches are sharded over the ``data`` axis, params
are replicated (with a ``model`` axis reserved for tensor parallelism),
gradients are reduced by XLA-inserted collectives over ICI — no explicit
allreduce/gather/barrier calls anywhere.
"""

from prompt_tts_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "batch_sharding",
           "replicated"]
