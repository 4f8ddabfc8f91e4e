"""Flagship param-tree bucket census (no device work: jax.eval_shape).

Motivates the PARTIAL stacking threshold for the natively-stacked
optimizer (train/stacked.py): full stacking OOM'd at the flagship
batch-32 operating point (the stacked buckets + their sliced per-leaf
views double params and grads at peak), so the question is where the
~707-chain dispatch overhead actually lives — if the leaf COUNT is in
small leaves and the BYTES are in a few large conv kernels, stacking
only leaves below a byte threshold collapses the chain count at near
zero duplication cost.

Run (CPU): PYTHONPATH=/root/repo python -u tools/abl_leaf_sizes.py
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from prompt_tts_tpu.config import Config
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.train.bucketed import plan_buckets
from prompt_tts_tpu.train.state import decay_mask

cfg = Config()
model = TTSSingleSpeaker(cfg.model, dtype=jnp.bfloat16)
B, T, S = 1, cfg.model.sample_size, cfg.model.cmu_seq_len
params = jax.eval_shape(
    model.init, jax.random.PRNGKey(0),
    jax.ShapeDtypeStruct((B, T, cfg.model.in_channels), jnp.float32),
    jax.ShapeDtypeStruct((B,), jnp.int32),
    jax.ShapeDtypeStruct((B, S), jnp.int32),
    jax.ShapeDtypeStruct((B, S), jnp.int32))

treedef, groups, flags = plan_buckets(params, decay_mask(params))
leaves = jax.tree_util.tree_leaves(params)
rows = []
for idxs, dec in zip(groups, flags):
    shp = leaves[idxs[0]].shape
    dt = leaves[idxs[0]].dtype
    per = int(np.prod(shp) * dt.itemsize) if shp else dt.itemsize
    rows.append((per, len(idxs), shp, str(dt), dec))
rows.sort()

total_leaves = sum(n for _, n, *_ in rows)
total_bytes = sum(p * n for p, n, *_ in rows)
print(f"leaves={total_leaves} buckets={len(rows)} "
      f"total={total_bytes/2**20:.0f} MiB")
print(f"{'per-leaf':>12} {'n':>4} {'bucket MiB':>10}  shape")
for per, n, shp, dt, dec in rows:
    print(f"{per:>12} {n:>4} {per*n/2**20:>10.2f}  {shp} {dt} decay={dec}")

print("\nthreshold sweep: stack leaves with nbytes <= thresh")
for thresh in [2**k for k in range(14, 27)]:
    stacked = [(p, n) for p, n, *_ in rows if p <= thresh]
    nbkt = len(stacked)
    nlv = sum(n for _, n in stacked)
    sb = sum(p * n for p, n in stacked)
    rest = total_leaves - nlv
    print(f"  thresh {thresh/2**20:8.3f} MiB: chains {nbkt}+{rest}="
          f"{nbkt+rest:4d} (was {total_leaves}), dup bytes "
          f"{sb/2**20:8.1f} MiB")
