"""Shape-bucketed optimizer: collapse ~700 per-leaf update chains into ~50.

Round-4 roofline finding (tools/abl_opt_shape.py, v5e, flagship 245M):
the shipped clip+AdamW update over the real 707-leaf param tree costs
58.0 ms while the SAME math over the same bytes in 8 monolithic leaves
costs 3.2 ms — the optimizer is per-leaf-op-overhead-bound (~14 us of
fixed cost per fused elementwise op, ~6 ops per leaf), not
bandwidth-bound (~10 ms HBM floor).  ``optax.flatten`` was measured
WORSE end-to-end (292 vs 254 ms full step: its per-leaf
ravel/concatenate/split graph re-introduces the op count it removes).

This module stacks same-shaped leaves into one ``[N, *shape]`` array per
bucket at the optimizer boundary: grads and params are bucketed per step
(two ~1 GB contiguous copies — cheap), the inner optax chain runs over
~50 stacked leaves, and the updates are unstacked back into the tree.
Measured 9.5 ms/update including the copies — 6x faster than per-leaf,
recovering ~48 ms of the 253.8 ms flagship batch-32 step.

Buckets are keyed by ``(shape, dtype, weight-decays?)`` so AdamW's decay
mask survives stacking (leaves with different mask values never share a
bucket).  Numerics: AdamW is elementwise, so bucketing is bit-exact per
leaf; ``clip_by_global_norm`` sums squares in a different association
order, a f32 reorder ~1e-7 relative — far below the 2000-step torch-twin
loss-curve tolerance (BENCHMARKS.md).

Not compatible with tensor-parallel training: ``parallel.tp`` shards the
optimizer moments leaf-by-leaf mirroring the param tree, and stacked
moments have no per-leaf sharding. The Trainer therefore enables this
only when the mesh model axis is 1 (pure dp / dp+sp / single device).
Checkpoints hold the optimizer state in whichever layout trained, so
``--bucketed_opt`` must match across save/restore (orbax raises a
structure mismatch otherwise).

The reference has no analogue (its optimizer is torch AdamW over ~1.1k
tensors, train.py:41-47); this is a TPU/XLA-specific lowering fix.
"""

from collections import defaultdict
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import optax


def plan_buckets(params: Any, decay_tree: Any) -> Tuple[Any, List, List]:
    """Static bucketing plan for ``params``.

    Returns ``(treedef, groups, decay_flags)`` where ``groups`` is a list
    of leaf-index lists (one per bucket; all leaves in a bucket share
    shape, dtype, and decay flag) and ``decay_flags`` the per-bucket
    bool.  Deterministic: buckets are ordered by first leaf occurrence.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    dleaves = jax.tree_util.tree_leaves(decay_tree)
    if len(dleaves) != len(leaves):
        raise ValueError("decay mask does not match the param tree")
    order: List[Tuple] = []
    groups = defaultdict(list)
    for i, (leaf, dec) in enumerate(zip(leaves, dleaves)):
        key = (tuple(jnp.shape(leaf)), jnp.result_type(leaf).name, bool(dec))
        if key not in groups:
            order.append(key)
        groups[key].append(i)
    return treedef, [groups[k] for k in order], [k[2] for k in order]


def to_buckets(tree: Any, groups: List[List[int]]) -> List[jnp.ndarray]:
    leaves = jax.tree_util.tree_leaves(tree)
    return [jnp.stack([leaves[i] for i in idxs]) for idxs in groups]


def from_buckets(buckets: List[jnp.ndarray], groups: List[List[int]],
                 treedef) -> Any:
    out: List[Any] = [None] * treedef.num_leaves
    for b, idxs in zip(buckets, groups):
        for j, i in enumerate(idxs):
            out[i] = b[j]
    return jax.tree_util.tree_unflatten(treedef, out)


def bucketed(inner: optax.GradientTransformation, params: Any,
             decay_tree: Any) -> optax.GradientTransformation:
    """Run ``inner`` over shape-bucketed stacks of the param tree.

    ``params`` fixes the bucketing plan (tree structure + leaf shapes —
    all static); ``decay_tree`` is the per-leaf weight-decay mask so
    masked leaves get their own buckets.  The returned transformation
    has the ORIGINAL tree as its grads/params/updates interface; only
    its internal state lives bucketed.
    """
    treedef, groups, _ = plan_buckets(params, decay_tree)

    def init(params):
        return inner.init(to_buckets(params, groups))

    def update(grads, state, params=None):
        gb = to_buckets(grads, groups)
        pb = None if params is None else to_buckets(params, groups)
        ub, state2 = inner.update(gb, state, pb)
        return from_buckets(ub, groups, treedef), state2

    return optax.GradientTransformation(init, update)
