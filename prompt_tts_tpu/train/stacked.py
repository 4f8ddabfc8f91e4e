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

The reference has no analogue (torch AdamW walks ~1.1k tensors,
reference train.py:41-47); this is a TPU/XLA lowering strategy.
Measured on-chip in tools/abl_step_matrix.py (the VERDICT-prescribed
full-step matrix row).
"""

from typing import Any, Callable, List

import jax
import jax.numpy as jnp

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
    """

    def __init__(self, params: Any, decay_tree: Any):
        self.treedef, self.groups, self.flags = plan_buckets(
            params, decay_tree)
        self.keys: List[str] = [
            f"b{i:03d}" for i in range(len(self.groups))]
        self._bucket_tdef = jax.tree_util.tree_structure(
            {k: 0 for k in self.keys})
        self._param_tdef = self.treedef

    # -- per-tree operators (used at boundaries AND inside jit) --------

    def stack_tree(self, tree: Any) -> dict:
        """Param-structured tree -> stacked bucket dict (copies)."""
        leaves = jax.tree_util.tree_leaves(tree)
        return {k: jnp.stack([leaves[i] for i in idxs])
                for k, idxs in zip(self.keys, self.groups)}

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
        return jax.tree_util.tree_unflatten(self.treedef, out)

    def wrap_apply(self, apply_fn: Callable) -> Callable:
        """Model apply over stacked params (unstacks at trace time)."""
        def apply(stacked, *args, **kwargs):
            return apply_fn(self.unstack_tree(stacked), *args, **kwargs)
        return apply

    def decay_mask(self) -> dict:
        """Per-bucket AdamW decay mask (buckets never mix flags)."""
        return dict(zip(self.keys, self.flags))

    # -- whole-state layout conversion (checkpoint boundary) -----------

    def _is_bucket_dict(self, node: Any) -> bool:
        return (isinstance(node, dict)
                and len(node) == len(self.keys)
                and set(node.keys()) == set(self.keys))

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
