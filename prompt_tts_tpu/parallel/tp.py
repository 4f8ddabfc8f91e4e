"""Tensor-parallel parameter sharding rules (GSPMD over the ``model`` axis).

The flagship model fits one chip, so data parallelism is the default; these
rules give the framework a real TP path for scaling (bigger models, lower
per-chip memory): attention and feed-forward kernels are sharded over the
``model`` mesh axis in the Megatron pattern (column-parallel in, row-
parallel out) and XLA/GSPMD inserts the all-reduces over ICI.

Rules are path-pattern based, so they apply to any of the model composites
without touching module code.
"""

import re
from typing import Any, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prompt_tts_tpu.parallel.mesh import MODEL_AXIS

# (path regex, PartitionSpec for the kernel). First match wins.
# Dense kernels are [in, out]; conv kernels [k, in, out]; embeddings
# [vocab, dim]. Column-parallel = shard out dim; row-parallel = shard in.
TP_RULES: List[Tuple[str, P]] = [
    # attention: q/k/v column-parallel (heads split), out row-parallel
    (r".*attn\d/to_[qkv]/kernel$", P(None, MODEL_AXIS)),
    (r".*attn\d/to_out/kernel$", P(MODEL_AXIS, None)),
    (r".*pool/to_[qkv]/kernel$", P(None, MODEL_AXIS)),
    (r".*pool/to_out/kernel$", P(MODEL_AXIS, None)),
    # GEGLU feed-forward: proj column-parallel, out row-parallel
    (r".*ff/proj/kernel$", P(None, MODEL_AXIS)),
    (r".*ff/out/kernel$", P(MODEL_AXIS, None)),
    # big conv kernels: shard output channels
    (r".*conv[12]/conv/kernel$", P(None, None, MODEL_AXIS)),
    (r".*conv_shortcut/conv/kernel$", P(None, None, MODEL_AXIS)),
    # embeddings: shard the feature dim
    (r".*word_embedding/embedding$", P(None, MODEL_AXIS)),
]


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def tp_param_spec(path, leaf) -> P:
    """PartitionSpec for one param leaf under the TP rules."""
    s = _path_str(path)
    for pattern, spec in TP_RULES:
        if re.match(pattern, s):
            # only shard when the dim divides evenly; GSPMD requires it
            return spec
    return P()


def tp_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for ``params`` under the TP rules.

    Dims that do not divide the model-axis size fall back to replicated.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def one(path, leaf):
        spec = tp_param_spec(path, leaf)
        # validate divisibility; replicate otherwise
        for dim, axis in enumerate(spec):
            if axis == MODEL_AXIS and leaf.shape[dim] % n_model != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put params with TP shardings (replicated over ``data``)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, tp_shardings_one(path, leaf, mesh)),
        params,
    )


def tp_shardings_one(path, leaf, mesh: Mesh) -> NamedSharding:
    n_model = mesh.shape[MODEL_AXIS]
    if not hasattr(leaf, "shape") or leaf.ndim == 0:
        return NamedSharding(mesh, P())
    spec = tp_param_spec(path, leaf)
    for dim, axis in enumerate(spec):
        if axis == MODEL_AXIS and leaf.shape[dim] % n_model != 0:
            return NamedSharding(mesh, P())
    return NamedSharding(mesh, spec)


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """Sharding pytree for a whole TrainState (params + optimizer moments).

    Optimizer moment trees mirror the param tree, so the same path-suffix
    rules apply to them (mu/nu get sharded like their params).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: tp_shardings_one(path, leaf, mesh), state)
