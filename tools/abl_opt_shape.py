"""Is the 70 ms optimizer cost per-leaf overhead or bandwidth? (r4)

tools/abl_train_roofline.py put the flagship batch-32 step at
full - grad = 70 ms for "clip + AdamW + metrics" — ~7x the ~10 ms
HBM-traffic floor — and tools/abl_train_opt.py showed optax.flatten
makes it WORSE (292 vs 254 ms full step: the flatten/unflatten copies
defeat donation).  This isolates the variable: the SAME optimizer math
over the SAME total bytes, varying only the leaf structure.

  tree      the real flagship param tree (~1.1k leaves) — the shipped
            clip+AdamW chain (train/state.py:make_optimizer)
  tree_noclip  same, clip_by_global_norm removed — clip's share
  flat8     same total bytes in 8 monolithic leaves, same chain —
            the per-leaf-overhead-free reference point
  bucketed  hand-rolled clip+AdamW over shape-bucketed STACKS of the
            real tree: grads+params stacked per step (the copies are
            timed), moments live bucketed, updated params unstacked
            back into the tree — the candidate production design

If tree >> flat8, per-leaf op overhead is the cause and `bucketed`
tells whether stacking pays for itself; if tree ~= flat8, the 70 ms is
bandwidth/serialization and the item closes as a measured floor.

Chained per CLAUDE.md: K-vs-2K scan, carry-dependent inputs, host read.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/abl_opt_shape.py
"""

import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import optax

from prompt_tts_tpu.config import Config
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.train.state import make_optimizer

K = 8
TRIALS = 3

print("backend:", jax.default_backend(), flush=True)
cfg = Config()
model = TTSSingleSpeaker(cfg.model, dtype=jnp.bfloat16)
data = SyntheticDataset(n=8, frames=cfg.model.sample_size,
                        max_seq_length=cfg.model.cmu_seq_len)
batch = {k: jnp.asarray(v) for k, v in next(data.batches(1)).items()}
shapes = jax.eval_shape(
    model.init, jax.random.PRNGKey(0), batch["codes"],
    jnp.zeros((1,), jnp.int32), batch["text_ids"], batch["text_mask"])

leaves = jax.tree_util.tree_leaves(shapes)
n_total = sum(int(jnp.prod(jnp.array(s.shape))) if s.shape else 1
              for s in leaves)
print(f"leaves: {len(leaves)}  total params: {n_total/1e6:.1f} M", flush=True)


@jax.jit
def make_tree():
    return jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)


def make_grads(tree):
    return jax.tree.map(lambda p: jnp.full(p.shape, 1e-3, p.dtype), tree)


def timed(run, state0, grads0, n_label):
    float(run(state0, grads0))
    best = float("inf")
    for t in range(TRIALS):
        g2 = jax.tree.map(lambda g: g * (1.0 + 1e-6 * (t + 1)), grads0)
        t0 = time.perf_counter()
        float(run(state0, g2))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_optax(name, params, tx):
    opt0 = jax.jit(tx.init)(params)
    grads0 = jax.jit(make_grads)(params)

    def chain(n):
        @jax.jit
        def run(carry0, grads):
            def body(carry, i):
                p, o, acc = carry
                c = 1.0 + acc * 1e-20 + i.astype(jnp.float32) * 0.0
                g = jax.tree.map(lambda x: x * c, grads)
                u, o2 = tx.update(g, o, p)
                p2 = optax.apply_updates(p, u)
                leaf = jax.tree_util.tree_leaves(p2)[0]
                return (p2, o2,
                        leaf.astype(jnp.float32).ravel()[0] * 1e-20), None
            carry, _ = jax.lax.scan(body, carry0, jnp.arange(n))
            return carry[2]
        return lambda s, g: run((params, opt0, jnp.float32(0.0)), g)

    tK = timed(chain(K), None, grads0, K)
    t2K = timed(chain(2 * K), None, grads0, 2 * K)
    s = (t2K - tK) / K
    print(f"{name:12s}: {s*1e3:7.1f} ms/update", flush=True)
    return s


params_tree = make_tree()
tx_full = make_optimizer(cfg.train, 1000)
bench_optax("tree", params_tree, tx_full)

sched = lambda i: 1e-5  # constant lr; schedule cost is shared anyway
tx_noclip = optax.adamw(learning_rate=1e-5, b1=cfg.train.adam_b1,
                        b2=cfg.train.adam_b2, eps=cfg.train.adam_eps,
                        weight_decay=cfg.train.weight_decay)
bench_optax("tree_noclip", params_tree, tx_noclip)

n8 = n_total // 8 + 1
params_flat = jax.jit(
    lambda: [jnp.full((n8,), 0.01, jnp.float32) for _ in range(8)])()
bench_optax("flat8", params_flat, tx_full)


# ---- bucketed: hand-rolled clip+AdamW over shape-stacked leaves ----
flat_leaves, treedef = jax.tree_util.tree_flatten(shapes)
groups = defaultdict(list)          # (shape, dtype) -> [leaf index]
for i, s in enumerate(flat_leaves):
    groups[(tuple(s.shape), str(s.dtype))].append(i)
group_items = sorted(groups.items(), key=lambda kv: -len(kv[1]))
print(f"buckets: {len(group_items)} (from {len(flat_leaves)} leaves; "
      f"largest {len(group_items[0][1])})", flush=True)

B1, B2, EPS, WD, LR, MAXN = (cfg.train.adam_b1, cfg.train.adam_b2,
                             cfg.train.adam_eps, cfg.train.weight_decay,
                             1e-5, cfg.train.max_grad_norm)


def stack_tree(tree):
    ls = jax.tree_util.tree_leaves(tree)
    return [jnp.stack([ls[i] for i in idxs])
            for (_, _), idxs in group_items]


def unstack_into_tree(buckets):
    out = [None] * len(flat_leaves)
    for b, ((shape, _), idxs) in zip(buckets, group_items):
        for j, i in enumerate(idxs):
            out[i] = b[j]
    return jax.tree_util.tree_unflatten(treedef, out)


def bucketed_update(p_tree, mu, nu, count, g_tree):
    gb = stack_tree(g_tree)
    pb = stack_tree(p_tree)
    gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in gb))
    scale = jnp.minimum(1.0, MAXN / jnp.maximum(gnorm, 1e-12))
    count2 = count + 1
    bc1 = 1.0 - B1 ** count2.astype(jnp.float32)
    bc2 = 1.0 - B2 ** count2.astype(jnp.float32)
    new_p, new_mu, new_nu = [], [], []
    for g, p, m, v in zip(gb, pb, mu, nu):
        g = g * scale
        m2 = B1 * m + (1 - B1) * g
        v2 = B2 * v + (1 - B2) * g * g
        upd = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + EPS) + WD * p
        new_p.append(p - LR * upd)
        new_mu.append(m2)
        new_nu.append(v2)
    return unstack_into_tree(new_p), new_mu, new_nu, count2


grads0 = jax.jit(make_grads)(params_tree)
mu0 = jax.jit(lambda: [jnp.zeros((len(idxs),) + shape, jnp.float32)
                       for (shape, _), idxs in group_items])()
nu0 = jax.jit(lambda: mu0)()


def chain_bucketed(n):
    @jax.jit
    def run(p, mu, nu, grads):
        def body(carry, i):
            p, mu, nu, count, acc = carry
            c = 1.0 + acc * 1e-20 + i.astype(jnp.float32) * 0.0
            g = jax.tree.map(lambda x: x * c, grads)
            p2, mu2, nu2, count2 = bucketed_update(p, mu, nu, count, g)
            leaf = jax.tree_util.tree_leaves(p2)[0]
            return (p2, mu2, nu2, count2,
                    leaf.astype(jnp.float32).ravel()[0] * 1e-20), None
        carry, _ = jax.lax.scan(
            body, (p, mu, nu, jnp.int32(0), jnp.float32(0.0)),
            jnp.arange(n))
        return carry[4]
    return run


def timed_b(n):
    run = chain_bucketed(n)
    float(run(params_tree, mu0, nu0, grads0))
    best = float("inf")
    for t in range(TRIALS):
        g2 = jax.tree.map(lambda g: g * (1.0 + 1e-6 * (t + 1)), grads0)
        t0 = time.perf_counter()
        float(run(params_tree, mu0, nu0, g2))
        best = min(best, time.perf_counter() - t0)
    return best


s = (timed_b(2 * K) - timed_b(K)) / K
print(f"{'bucketed':12s}: {s*1e3:7.1f} ms/update", flush=True)
