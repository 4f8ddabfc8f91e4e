"""Trajectory A/B on the chip: fused attention backward vs XLA autodiff.

The r4 verdict's gap: ``--fused_attn_bwd`` auto-arms ON for TPU dp/tp
training, but every loss-curve certification (tools/loss_parity_ab.py)
ran on CPU where the Pallas kernel never arms — so the default train
configuration was the one configuration the parity evidence didn't
cover.  This closes it by A/B-ing the framework against ITSELF on the
chip: identical init weights, identical data order, identical
noise/timestep/dropout streams, the full flagship step (245M, batch 32),
with the ONLY difference being what jax.grad emits for the attention
sites — the fused Pallas backward (ops/pallas/attention_bwd.py) vs XLA
autodiff.  Matches the reference's training contract at
/root/reference/train.py:32-47,86-120 (the recipe both paths share).

Methodology: each path's trajectory runs as jitted 50-step lax.scan
CHUNKS with the state carried on device between calls (a single
300-step program's ~70 s execution crashed the relay's TPU worker;
chunking keeps each execution ~12 s and still pulls only one [chunk]
loss vector per call), a fresh jit closure per path (the arming is
trace-time global state outside the jit cache key — ops/attention.py
fused_bwd_scope docstring), and the final params of both paths are
compared ON DEVICE (relative L2 + max |Δ| per tree) so nothing but
scalars and the loss vectors cross the relay.  The XLA path runs
FIRST so a fused-path fault cannot take the baseline with it.

Measured round 5 (BENCHMARKS.md "Training parity"): bf16 300-step
flagship — max relative loss gap 6.2e-4, final params rel L2 1.65e-5;
f32 100-step batch 16 — gap 1.3e-4, params rel L2 2.1e-6 (reorder
level, as theory predicts: the kernel sums in f32 like XLA, in a
different order).  The f32 run also drives the recalibrated VMEM gate:
its text-encoder site falls back (measured 19.10 MiB residency > the
16 MiB scoped limit) while the UNet sites stay fused.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u \
         tools/traj_parity_fused.py [--steps 300] [--dtype bf16]
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from prompt_tts_tpu.config import Config
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.ops.attention import fused_bwd_scope
from prompt_tts_tpu.train import create_train_state
from prompt_tts_tpu.train.step import make_train_step

ap = argparse.ArgumentParser()
ap.add_argument("--steps", type=int, default=300)
ap.add_argument("--batch", type=int, default=32)
ap.add_argument("--corpus_batches", type=int, default=16)
ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
ap.add_argument("--chunk", type=int, default=50,
                help="steps per jitted scan call (bounds single-execution "
                     "wall time under the relay)")
ap.add_argument("--paths", default="xla,fused",
                help="which gradient paths to run (comma list of "
                     "xla,fused); with one path, prints its curve and "
                     "exits without the A/B comparison")
ap.add_argument("--save", default=None,
                help="write this run's loss curve + final params to an "
                     ".npz (single-path mode; enables cross-process A/B "
                     "— switching gradient paths inside one process hit "
                     "relay worker faults, see log r5)")
ap.add_argument("--ref", default=None,
                help="an .npz from --save to compare this run against "
                     "(losses + final params, compared on host)")
ap.add_argument("--out", default=None,
                help="optional JSON artifact path (loss curves + summary)")
args = ap.parse_args()

print("backend:", jax.default_backend(), flush=True)
dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
cfg = Config()
model = TTSSingleSpeaker(cfg.model, dtype=dtype)
data = SyntheticDataset(n=args.corpus_batches * args.batch,
                        frames=cfg.model.sample_size,
                        max_seq_length=cfg.model.cmu_seq_len)
raw = []
for b in data.batches(args.batch):
    raw.append(b)
    if len(raw) == args.corpus_batches:
        break
corpus = {k: jnp.asarray(np.stack([b[k] for b in raw])) for k in raw[0]}
params0 = jax.jit(model.init)(
    jax.random.PRNGKey(0), corpus["codes"][0][:1],
    jnp.zeros((1,), jnp.int32), corpus["text_ids"][0][:1],
    corpus["text_mask"][0][:1])
sched = linear_schedule()
base_rng = jax.random.PRNGKey(7)
n_corpus = args.corpus_batches


assert args.steps % args.chunk == 0, "steps must divide into chunks"


def run_path(armed: bool):
    """Train args.steps steps from params0; fresh closures per path so the
    trace-time arming cannot leak through the jit cache."""
    step = make_train_step(model.apply, sched)

    @functools.partial(jax.jit, donate_argnums=0)
    def run_chunk(state, corpus, start):
        def body(st, j):
            i = start + j
            batch = jax.tree.map(lambda x: x[i % n_corpus], corpus)
            s2, m = step(st, batch, jax.random.fold_in(base_rng, i))
            return s2, m["loss"]
        return jax.lax.scan(body, state, jnp.arange(args.chunk))

    state = create_train_state(model, params0, cfg.train, args.steps)
    label = "fused" if armed else "xla  "
    chunks = []
    with fused_bwd_scope(armed):
        t0 = time.perf_counter()
        for start in range(0, args.steps, args.chunk):
            state, losses = run_chunk(state, corpus,
                                      jnp.int32(start))
            chunks.append(np.asarray(jax.device_get(losses)))
            print(f"[{label}] step {start + args.chunk:4d}: "
                  f"loss {chunks[-1][-1]:.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        wall = time.perf_counter() - t0
    losses = np.concatenate(chunks)
    print(f"[{label}] {args.steps} steps in {wall:.1f}s "
          f"(incl. compile)  loss {losses[0]:.4f} -> {losses[-1]:.4f}",
          flush=True)
    return state, losses


def summarize(loss_a, loss_b, rel_l2, max_abs, label_a, label_b):
    gap = np.abs(loss_a - loss_b) / np.maximum(np.abs(loss_b), 1e-8)
    summary = {
        "dtype": args.dtype,
        "steps": args.steps,
        "batch": args.batch,
        f"loss_{label_a}_first_last": [float(loss_a[0]),
                                       float(loss_a[-1])],
        f"loss_{label_b}_first_last": [float(loss_b[0]),
                                       float(loss_b[-1])],
        "rel_gap_max": float(gap.max()),
        "rel_gap_mean": float(gap.mean()),
        "rel_gap_final": float(gap[-1]),
        "param_rel_l2": rel_l2,
        "param_max_abs": max_abs,
    }
    print(json.dumps(summary), flush=True)
    for i in range(0, args.steps, max(1, args.steps // 10)):
        print(f"  step {i:4d}: {label_a} {loss_a[i]:.6f}  "
              f"{label_b} {loss_b[i]:.6f}  rel {gap[i]:.2e}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({**summary,
                       f"loss_{label_a}": loss_a.tolist(),
                       f"loss_{label_b}": loss_b.tolist()}, f)
        print("wrote", args.out, flush=True)
    return summary


paths = args.paths.split(",")
results = {}
for p in paths:
    results[p] = run_path(p == "fused")

if len(paths) == 1:
    label = paths[0]
    state, losses = results[label]
    if args.save:
        leaves = [np.asarray(jax.device_get(x)) for x in
                  jax.tree_util.tree_leaves(state.params)]
        np.savez(args.save, losses=losses,
                 **{f"leaf{i:04d}": l for i, l in enumerate(leaves)})
        print("saved", args.save, flush=True)
    if args.ref:
        ref = np.load(args.ref)
        ref_losses = ref["losses"]
        leaves = [np.asarray(jax.device_get(x)) for x in
                  jax.tree_util.tree_leaves(state.params)]
        sq = nrm = 0.0
        mx = 0.0
        for i, l in enumerate(leaves):
            r = ref[f"leaf{i:04d}"].astype(np.float64)
            d = l.astype(np.float64) - r
            sq += float((d * d).sum())
            nrm += float((r * r).sum())
            mx = max(mx, float(np.abs(d).max()))
        summarize(losses, ref_losses, float(np.sqrt(sq / nrm)), mx,
                  label, "ref")
    raise SystemExit(0)

state_x, loss_x = results["xla"]
state_f, loss_f = results["fused"]


@jax.jit
def param_gap(pa, pb):
    """Relative L2 distance + max |Δ| across the whole param tree,
    computed on device (nothing but scalars cross the relay)."""
    sq = sum(jnp.sum((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
             for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)))
    nrm = sum(jnp.sum(b.astype(jnp.float32) ** 2)
              for b in jax.tree.leaves(pb))
    mx = jnp.array(0.0, jnp.float32)
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        mx = jnp.maximum(
            mx, jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32))))
    return jnp.sqrt(sq) / jnp.sqrt(nrm), mx


rel_l2, max_abs = (float(x) for x in
                   param_gap(state_f.params, state_x.params))
summarize(loss_f, loss_x, rel_l2, max_abs, "fused", "xla")
