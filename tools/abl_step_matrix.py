"""Decisive train-step matrix: attention backward x optimizer layout.

Round-4 sequencing left two contradictions that only a single clean
matrix can resolve (all prior numbers from separate runs hours apart):

  * tools/abl_opt_shape.py measured the bucketed optimizer UPDATE at
    9.5 ms vs 58.0 ms per-leaf, but tools/abl_step_final.py then
    measured the FULL step slower with bucketing on (282.8 vs 260.9 ms)
    — the per-leaf overhead may be a standalone-program artifact that
    the fused step program doesn't pay.
  * tools/abl_attn_bwd.py measured the Pallas fused attention backward
    winning only at Tq=900 sites standalone, yet the full step with ALL
    sites fused + bucketing came out at 245.8 ms.

This runs the full flagship batch-32 bf16 train step under every
combination of attention backward {xla autodiff, fused all sites,
fused Tq>=600 only} x optimizer {per-leaf, bucketed}, same process,
same data, threefry dropout, chained per CLAUDE.md (K-vs-2K scan,
carry-dependent batch, host read, min of TRIALS).  Every trial value is
printed so run-to-run noise is visible next to the deltas it could
explain.

Round 5 adds the ``stacked`` optimizer layout (train/stacked.py): params
AND moments live natively bucketed across steps, so there are no
per-step to/from-bucket copies at all — the exact variant the round-4
matrix's own root-cause analysis pointed at (the copies serialize; the
stacked math itself is the 9.5 ms regime).

MEASURED r5: FULL stacking RESOURCE_EXHAUSTs the chip at the flagship
batch-32 point even in a fresh process (the stacked buckets plus their
materialized per-leaf views double params and grads at peak) — hence
``stacked:<MiB>`` partial layouts: leaves above the threshold stay
per-leaf (census: tools/abl_leaf_sizes.py — 4 MiB keeps 649/707 leaves
stacked at ~1/3 the duplication).

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/abl_step_matrix.py
     [--layouts per_leaf,bucketed,stacked,stacked:4] [--attn xla,all,long]
"""

import argparse
import time

import jax
import jax.numpy as jnp

from prompt_tts_tpu.config import Config
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.ops.attention import fused_bwd_scope
from prompt_tts_tpu.train import create_train_state
from prompt_tts_tpu.train.stacked import StackedPlan
from prompt_tts_tpu.train.state import decay_mask
from prompt_tts_tpu.train.step import make_train_step

BS = 32
K = 3
TRIALS = 3

ap = argparse.ArgumentParser()
ap.add_argument("--layouts", default="per_leaf,bucketed",
                help="comma list of per_leaf,bucketed,stacked")
ap.add_argument("--attn", default="xla,all,long",
                help="comma list of xla,all,long")
args = ap.parse_args()

print("backend:", jax.default_backend(), flush=True)
cfg = Config()
model = TTSSingleSpeaker(cfg.model, dtype=jnp.bfloat16)
data = SyntheticDataset(n=64, frames=cfg.model.sample_size,
                        max_seq_length=cfg.model.cmu_seq_len)
batch = {k: jnp.asarray(v) for k, v in next(data.batches(BS)).items()}
params = jax.jit(model.init)(
    jax.random.PRNGKey(0), batch["codes"][:1], jnp.zeros((1,), jnp.int32),
    batch["text_ids"][:1], batch["text_mask"][:1])
sched = linear_schedule()
base_rng = jax.random.PRNGKey(7)

# (label, armed, min_tq): 600 keeps only the Tq=900 self/cross sites,
# the standalone winners; 0 fuses every eligible site
ATTN_ALL = {"xla": ("xla ", False, 0), "all": ("all ", True, 0),
            "long": ("long", True, 600)}


def build_layout(layout):
    """(train_step, make_state) for an optimizer layout.

    ``stacked`` stacks everything; ``stacked:<MiB>`` is the partial
    layout (leaves above the threshold stay per-leaf)."""
    if layout.startswith("stacked"):
        thresh = (int(float(layout.split(":")[1]) * 2**20)
                  if ":" in layout else None)
        plan = StackedPlan(params, decay_mask(params),
                           max_leaf_bytes=thresh)
        step = make_train_step(plan.wrap_apply(model.apply), sched)
        return step, lambda: create_train_state(
            model, params, cfg.train, 1000, stacked_plan=plan)
    step = make_train_step(model.apply, sched)
    return step, lambda: create_train_state(
        model, params, cfg.train, 1000, bucketed_opt=layout == "bucketed")


def time_state_chain(step, make_state, armed, min_tq, n):
    @jax.jit
    def run(state, b):
        def body(carry, i):
            st, _ = carry
            s2, m = step(st, b, jax.random.fold_in(base_rng, i))
            return (s2, m["loss"]), None
        (st, loss), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)), jnp.arange(n))
        return loss
    state0 = make_state()
    with fused_bwd_scope(armed, min_tq=min_tq):
        float(run(state0, batch))         # trace under the arming
        times = []
        for trial in range(TRIALS):
            b2 = dict(batch)
            b2["codes"] = batch["codes"] * (1.0 + 1e-6 * (trial + 1))
            t0 = time.perf_counter()
            float(run(state0, b2))
            times.append(time.perf_counter() - t0)
    return times


for layout in args.layouts.split(","):
    step, make_state = build_layout(layout)
    for key in args.attn.split(","):
        label, armed, min_tq = ATTN_ALL[key]
        tK = time_state_chain(step, make_state, armed, min_tq, K)
        t2K = time_state_chain(step, make_state, armed, min_tq, 2 * K)
        per = (min(t2K) - min(tK)) / K
        raw = " ".join(f"{t:.3f}" for t in tK + t2K)
        print(f"step attn={label} opt={layout:8s}: "
              f"{per*1e3:7.1f} ms/step   [chains(s): {raw}]", flush=True)
