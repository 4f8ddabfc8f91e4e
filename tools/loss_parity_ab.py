"""Loss-curve parity A/B: this framework vs the reference training recipe.

BASELINE.md's "training parity" row demands a TensorBoard loss-curve match
against the reference's train.py.  The reference's exact run is not
reproducible here (no GPU, no diffusers), so this harness trains the torch
twin (tools/torch_twin.py — diffusers-0.15-naming model with the
reference's documented forward semantics) with the reference recipe
(reference train.py:32-47, 86-120: DDPM 1000 linear betas, eps-MSE,
AdamW(betas (0.95, 0.999), eps 1e-8, wd 1e-6), global-norm clip 1.0) and
the JAX framework side by side from IDENTICAL weights (via the checkpoint
converter), IDENTICAL data and IDENTICAL pre-drawn noise/timesteps — so
the two loss curves must agree to numerics, not just in distribution.

Outputs: torch curve as a real TB event file, ours as metrics.jsonl, then
runs tools/compare_losses.py's comparison on them and prints the verdict
JSON (recorded in BENCHMARKS.md).

Run: python -u tools/loss_parity_ab.py --steps 300   (CPU, ~10 min)
Long data-anchored variant (round 3):
     python -u tools/loss_parity_ab.py --steps 2000 --accum 2 --remat \
        --corpus_batches 16
(--accum N runs N micro-batches per optimizer step on BOTH sides —
 optax.MultiSteps vs torch loss/N + step-boundary clip, the reference's
 accelerate semantics, train.py:27,80,116; --remat wraps our model apply
 in jax.checkpoint to prove rematerialization changes nothing.)

CAVEAT (stated plainly, also in BENCHMARKS.md): this is TWIN-anchored,
not data-anchored to LJSpeech — no network egress, no GPU, and no
reference checkpoints exist in this environment, so the comparison is
against tools/torch_twin.py under the reference recipe on synthetic data.
It proves the FRAMEWORK's optimization dynamics match torch to numerics;
it cannot prove dataset-level reproduction of the reference's (likewise
unpublished) LJSpeech curves.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_data(n, cfg, seed=0):
    """Synthetic corpus: codes in [-1, 1], ids/mask — shared by both sides."""
    rng = np.random.default_rng(seed)
    codes = rng.uniform(-1, 1, size=(n, cfg.sample_size, 8)).astype(
        np.float32)
    lens = rng.integers(4, cfg.cmu_seq_len, size=n)
    ids = np.zeros((n, cfg.cmu_seq_len), np.int64)
    mask = np.zeros((n, cfg.cmu_seq_len), np.int64)
    for i, ln in enumerate(lens):
        ids[i, :ln] = rng.integers(1, 149, size=ln)
        mask[i, :ln] = 1
    return codes, ids, mask


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300,
                   help="optimizer steps (micro-steps = steps * accum)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--accum", type=int, default=1,
                   help="gradient-accumulation micro-batches per step")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint around our model apply")
    p.add_argument("--corpus_batches", type=int, default=4,
                   help="corpus size in batches")
    p.add_argument("--lr", type=float, default=1e-3,
                   help="LR for the A/B (reference's 1e-5 barely moves a "
                        "tiny model in 300 steps; dynamics still use the "
                        "reference betas/eps/wd/clip)")
    p.add_argument("--out", default="runs/loss_parity_ab")
    p.add_argument("--tolerance", type=float, default=0.02)
    args = p.parse_args()

    import torch
    from torch.utils.tensorboard import SummaryWriter

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from torch_twin import RefTTS
    from compare_losses import compare, load_ours, load_tensorboard
    from prompt_tts_tpu.config import ModelConfig
    from prompt_tts_tpu.diffusion.schedule import add_noise, linear_schedule
    from prompt_tts_tpu.models import TTSSingleSpeaker
    from prompt_tts_tpu.models.convert import convert_reference_state_dict
    from prompt_tts_tpu.utils.metrics import MetricsWriter

    cfg = ModelConfig(
        cmu_vocab_len=160, cmu_seq_len=24, cross_attention_dim=32,
        attention_head_dim=16, text_encoder_layers=2,
        text_encoder_dropout=0.0, sample_size=32,
        block_out_channels=(16, 32, 32, 32), layers_per_block=1,
        unet_num_heads=4, norm_num_groups=8)
    T_TRAIN = 1000

    torch.manual_seed(0)
    ref = RefTTS(cfg)
    params = convert_reference_state_dict(ref.state_dict())

    n = args.corpus_batches * args.batch
    codes, ids, mask = make_data(n, cfg)

    # pre-drawn per-MICRO-step randomness, shared verbatim by both sides
    micro = args.steps * args.accum
    rng = np.random.default_rng(123)
    order = [rng.permutation(n)[: args.batch] for _ in range(micro)]
    noises = [rng.standard_normal(
        (args.batch, cfg.sample_size, 8)).astype(np.float32)
        for _ in range(micro)]
    tsteps = [rng.integers(0, T_TRAIN, size=args.batch).astype(np.int64)
              for _ in range(micro)]

    os.makedirs(args.out, exist_ok=True)

    # ---------------- torch side (reference recipe) ----------------
    betas = torch.linspace(1e-4, 0.02, T_TRAIN)
    acp = torch.cumprod(1.0 - betas, dim=0)
    opt = torch.optim.AdamW(ref.parameters(), lr=args.lr,
                            betas=(0.95, 0.999), eps=1e-8, weight_decay=1e-6)
    tb_dir = os.path.join(args.out, "torch_tb")
    writer = SummaryWriter(tb_dir)
    ref.train()
    for step in range(args.steps):
        opt.zero_grad()
        step_loss = 0.0
        for a_i in range(args.accum):
            m = step * args.accum + a_i
            idx = order[m]
            x0 = torch.from_numpy(codes[idx]).permute(0, 2, 1)  # [B, 8, T]
            eps = torch.from_numpy(noises[m]).permute(0, 2, 1)
            t = torch.from_numpy(tsteps[m])
            a = acp[t].view(-1, 1, 1)
            x_t = a.sqrt() * x0 + (1 - a).sqrt() * eps
            pred = ref(x_t, t, torch.from_numpy(ids[idx]),
                       torch.from_numpy(mask[idx]))
            loss = torch.nn.functional.mse_loss(pred, eps)
            # accelerate-style accumulation: mean of micro-grads, clip at
            # the step boundary (reference train.py:80,116-117)
            (loss / args.accum).backward()
            step_loss += loss.item() / args.accum
        torch.nn.utils.clip_grad_norm_(ref.parameters(), 1.0)
        opt.step()
        writer.add_scalar("Loss/train", step_loss, step)
    writer.close()

    # ---------------- JAX side (this framework) ----------------
    model = TTSSingleSpeaker(cfg)  # f32 for a numerics-level comparison
    schedule = linear_schedule(T_TRAIN)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(args.lr, b1=0.95, b2=0.999, eps=1e-8,
                    weight_decay=1e-6))
    if args.accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=args.accum)
    opt_state = tx.init(params)

    apply_fn = model.apply
    if args.remat:
        apply_fn = jax.checkpoint(model.apply)

    def loss_fn(p, x0, eps, t, bids, bmask):
        x_t = add_noise(schedule, x0, eps, t)
        pred = apply_fn(p, x_t, t, bids, bmask)
        return jnp.mean((pred - eps) ** 2)

    @jax.jit
    def train_step(p, opt_state, x0, eps, t, bids, bmask):
        loss, grads = jax.value_and_grad(loss_fn)(p, x0, eps, t, bids, bmask)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    ours = MetricsWriter(os.path.join(args.out, "ours"))
    for step in range(args.steps):
        step_loss = 0.0
        for a_i in range(args.accum):
            m = step * args.accum + a_i
            idx = order[m]
            pms, opt_state, loss = train_step(
                params, opt_state,
                jnp.asarray(codes[idx]), jnp.asarray(noises[m]),
                jnp.asarray(tsteps[m].astype(np.int32)),
                jnp.asarray(ids[idx].astype(np.int32)),
                jnp.asarray(mask[idx].astype(np.int32)))
            params = pms
            step_loss += float(loss) / args.accum
        ours.add_scalar("Loss/train", step_loss, step)
    ours.flush()

    # ---------------- compare ----------------
    ours_curve = load_ours(os.path.join(args.out, "ours", "metrics.jsonl"))
    ref_curve = load_tensorboard(tb_dir)
    rel_gap, n_steps = compare(ours_curve, ref_curve)
    first_ours = ours_curve[0]
    first_ref = ref_curve[0]
    last_ours = ours_curve[max(ours_curve)]
    last_ref = ref_curve[max(ref_curve)]
    verdict = "PASS" if rel_gap <= args.tolerance else "FAIL"
    print(json.dumps({
        "metric": "loss_curve_relative_gap",
        "value": round(rel_gap, 5),
        "steps": n_steps,
        "first": [round(first_ours, 5), round(first_ref, 5)],
        "last": [round(last_ours, 5), round(last_ref, 5)],
        "tolerance": args.tolerance,
        "verdict": verdict,
    }))
    raise SystemExit(0 if verdict == "PASS" else 1)


if __name__ == "__main__":
    main()
