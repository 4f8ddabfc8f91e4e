"""Natively-stacked optimizer state: params AND moments live bucketed.

Round-4's shape-bucketed optimizer (train/bucketed.py) collapsed the
~707-leaf clip+AdamW chain into ~50 stacked ops and won standalone
(58.0 -> 9.5 ms) but LOST inside the fused step program (254.0 -> 280.7
ms, tools/abl_step_matrix.py): its per-step ``to_buckets(grads)`` /
``from_buckets(updates)`` copies are a barrier the whole update
serializes behind, where XLA otherwise overlaps the per-leaf chains
with the tail of the backward.

This module removes the per-step copies entirely by making the STACKED
layout the resident one: params, EMA params, and optimizer moments are
bucketed ONCE at state creation and stay stacked across steps.

  * forward: the model consumes per-leaf views sliced out of the
    buckets (``unstack_tree`` under jit is pure slicing — XLA fuses the
    slices into the first consumers; no gather barrier),
  * backward: autodiff of the slicing assembles grad buckets
    incrementally as each leaf's cotangent is produced (dynamic-update-
    slices into ~50 buffers) instead of one stack-everything barrier,
  * update: the clip+AdamW chain runs over ~50 stacked leaves — the
    9.5 ms regime — with nothing to gather or scatter.

Layout boundaries: checkpoints stay CANONICAL (per-leaf). The Trainer
unstacks params/EMA/moments at save and restacks at restore
(``canonicalize``/``stack_subtrees``), so a stacked-run checkpoint
restores under any other optimizer layout and vice versa — unlike
``--bucketed_opt on``, the layout is NOT part of the checkpoint.
Not TP-compatible (stacked moments have no per-leaf sharding), same
gate as the bucketed mode.

PARTIAL stacking (``max_leaf_bytes``, round 5): FULL stacking OOM'd on
the chip at the flagship batch-32 operating point — the stacked buckets
plus their materialized per-leaf views double params AND grads at peak
(~2 GB over the per-leaf program, tools/abl_step_matrix.py r5).  The
census (tools/abl_leaf_sizes.py) shows the dispatch overhead and the
bytes live in DIFFERENT leaves: 649 of the flagship's 707 leaves are
<= 4 MiB but hold only 367 of 936 MiB.  Stacking only leaves below the
threshold collapses the update to ~98 chains at ~1/3 the duplication;
the big conv/proj kernels stay per-leaf (few chains, and XLA overlaps
them with the backward tail).  Leaves above the threshold ride the
SAME flat state dict under per-leaf ``p###`` keys, so checkpoints,
canonicalize, and the optimizer mask are layout-uniform.

The reference has no analogue (torch AdamW walks ~1.1k tensors,
reference train.py:41-47); this is a TPU/XLA lowering strategy.

MEASURED AND DECLINED as a default (r5, tools/abl_step_matrix.py,
on-chip same-process full-step matrix): full stacking OOMs at the
flagship batch-32 point, and the partial 4 MiB layout loses 242.4 vs
236.1 ms/step — with the per-step copies gone, the grad-bucket
assembly still serializes where XLA otherwise overlaps the per-leaf
update chains with the backward tail.  Kept as an explicit flag for
layouts where the trade-off differs (small models, huge
accumulation); see ARCHITECTURE.md "the optimizer tail is priced".
"""

from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from prompt_tts_tpu.train.bucketed import plan_buckets


def _map_subtrees(node: Any, matches: Callable[[Any], bool],
                  fn: Callable[[Any], Any]) -> Any:
    """Replace every subtree for which ``matches`` holds with ``fn(sub)``.

    Recurses through the containers optax/flax states are made of
    (dict, list, tuple, NamedTuple); anything else — arrays, scalars,
    None, optax sentinel nodes — is a leaf left untouched.
    """
    if matches(node):
        return fn(node)
    if isinstance(node, dict):
        return type(node)(
            (k, _map_subtrees(v, matches, fn)) for k, v in node.items())
    if isinstance(node, tuple):
        mapped = [_map_subtrees(c, matches, fn) for c in node]
        if hasattr(node, "_fields"):          # NamedTuple (optax states)
            return type(node)(*mapped)
        return tuple(mapped)
    if isinstance(node, list):
        return [_map_subtrees(c, matches, fn) for c in node]
    return node


class StackedPlan:
    """Static bucketing plan + the stack/unstack/canonicalize operators.

    Buckets are keyed ``(shape, dtype, decays?)`` (train/bucketed.py
    rules, so AdamW's decay mask survives stacking) and carried as a
    flat dict ``{"b000": [N0, *shape0], ...}`` — a stable, orbax- and
    tree-map-friendly container whose structure is unambiguous enough
    to detect inside optimizer states.

    ``max_leaf_bytes``: leaves LARGER than this stay per-leaf, carried
    in the same flat dict under ``p###`` keys (partial stacking — see
    module docstring; None stacks everything).
    """

    def __init__(self, params: Any, decay_tree: Any,
                 max_leaf_bytes: Optional[int] = None):
        self.treedef, groups, flags = plan_buckets(params, decay_tree)
        leaves = jax.tree_util.tree_leaves(params)
        self.groups: List[List[int]] = []
        self.flags: List[bool] = []
        self.pass_idx: List[int] = []
        pass_flags: List[bool] = []
        for idxs, flag in zip(groups, flags):
            leaf = leaves[idxs[0]]
            nbytes = int(np.prod(leaf.shape)) * leaf.dtype.itemsize \
                if leaf.shape else leaf.dtype.itemsize
            if max_leaf_bytes is not None and nbytes > max_leaf_bytes:
                self.pass_idx.extend(idxs)
                pass_flags.extend([flag] * len(idxs))
            else:
                self.groups.append(idxs)
                self.flags.append(flag)
        self.keys: List[str] = [
            f"b{i:03d}" for i in range(len(self.groups))]
        self.pass_keys: List[str] = [
            f"p{i:03d}" for i in range(len(self.pass_idx))]
        self.pass_flags = pass_flags
        self._all_keys = frozenset(self.keys) | frozenset(self.pass_keys)
        self._param_tdef = self.treedef

    # -- per-tree operators (used at boundaries AND inside jit) --------

    def stack_tree(self, tree: Any) -> dict:
        """Param-structured tree -> stacked bucket dict (copies; the
        ``p###`` passthrough leaves ride along unstacked)."""
        leaves = jax.tree_util.tree_leaves(tree)
        out = {k: jnp.stack([leaves[i] for i in idxs])
               for k, idxs in zip(self.keys, self.groups)}
        for k, i in zip(self.pass_keys, self.pass_idx):
            out[k] = leaves[i]
        return out

    def unstack_tree(self, buckets: dict) -> Any:
        """Stacked bucket dict -> param-structured tree.

        Under jit this is pure slicing (zero-flop); its transpose is
        the incremental grad-bucket assembly described in the module
        docstring.
        """
        out: List[Any] = [None] * self.treedef.num_leaves
        for k, idxs in zip(self.keys, self.groups):
            b = buckets[k]
            for j, i in enumerate(idxs):
                out[i] = b[j]
        for k, i in zip(self.pass_keys, self.pass_idx):
            out[i] = buckets[k]
        return jax.tree_util.tree_unflatten(self.treedef, out)

    def wrap_apply(self, apply_fn: Callable) -> Callable:
        """Model apply over stacked params (unstacks at trace time)."""
        def apply(stacked, *args, **kwargs):
            return apply_fn(self.unstack_tree(stacked), *args, **kwargs)
        return apply

    def decay_mask(self) -> dict:
        """Per-key AdamW decay mask (buckets never mix flags)."""
        mask = dict(zip(self.keys, self.flags))
        mask.update(zip(self.pass_keys, self.pass_flags))
        return mask

    # -- whole-state layout conversion (checkpoint boundary) -----------

    def _is_bucket_dict(self, node: Any) -> bool:
        return (isinstance(node, dict)
                and len(node) == len(self._all_keys)
                and frozenset(node.keys()) == self._all_keys)

    def _is_param_tree(self, node: Any) -> bool:
        if not isinstance(node, dict) or self._is_bucket_dict(node):
            return False
        try:
            return (jax.tree_util.tree_structure(node)
                    == self._param_tdef)
        except Exception:
            return False

    def canonicalize(self, obj: Any) -> Any:
        """Stacked state (or any subtree of it) -> canonical per-leaf
        layout: every bucket dict becomes the param-structured tree.
        The result matches what a per-leaf (default) run produces, so
        checkpoints written through this are layout-portable."""
        return _map_subtrees(obj, self._is_bucket_dict, self.unstack_tree)

    def stack_subtrees(self, obj: Any) -> Any:
        """Canonical per-leaf state (or subtree) -> stacked layout:
        every param-structured subtree (mu/nu/acc_grads/params/EMA)
        becomes a bucket dict."""
        return _map_subtrees(obj, self._is_param_tree, self.stack_tree)
