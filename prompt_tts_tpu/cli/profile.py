"""Pipeline profiler: ``python -m prompt_tts_tpu.cli.profile``.

The reference has no profiling at all (SURVEY.md §5: tqdm bars and
commented-out shape prints), and interactive ``jax.profiler`` tracing is
unusable through this dev setup's TPU tunnel (CLAUDE.md).  This tool is
the framework's first-class substitute, built from the two things that
ARE reliable here:

* **XLA cost analysis** (default) — AOT-compile each pipeline stage and
  report the compiler's own post-optimization FLOP count, HBM bytes
  accessed, arithmetic intensity, and peak temp memory.  Runs on any
  backend (use ``--cpu`` off-TPU; counts are computed by the compiler,
  not measured on hardware).
* **Honest on-chip timing** (``--time``) — the frozen round-2
  chained-difference methodology (BENCHMARKS.md): K-vs-2K ``lax.scan``
  chains with every non-param input carry-dependent and a host value
  read, so neither async dispatch, the relay's RPC floor, nor
  loop-invariant hoisting can fake the number.  With FLOPs from the
  cost analysis this yields measured %-of-peak per stage
  (``--peak_tflops``, default v5e bf16 = 197).

Stages: ``cond`` (text encoder / prompt conditioning), ``denoise`` (one
UNet ε step — ×steps per synthesis), ``decode`` (EnCodec decode),
``train`` (full fwd+bwd+optimizer step), ``synth`` (the whole jitted
text→wav program; compile is minutes-scale, opt in via ``--stages``).

Prints a human table, then one JSON line (machine-readable).
"""

import argparse
import json
import logging
import time

log = logging.getLogger(__name__)

DEFAULT_STAGES = "cond,denoise,decode,train"


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Profile pipeline stages (XLA cost analysis; "
                    "optional honest on-chip timing).")
    p.add_argument("--stages", type=str, default=DEFAULT_STAGES,
                   help=f"Comma list of cond,denoise,decode,train,synth "
                        f"(default {DEFAULT_STAGES}; synth compiles the "
                        f"full sampler program — minutes on TPU).")
    p.add_argument("--batch_size", type=int, default=8,
                   help="Synthesis-side batch (denoise/decode/synth/cond).")
    p.add_argument("--train_batch_size", type=int, default=None,
                   help="Train-step batch (defaults to config).")
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--sampler", choices=("ddim", "dpm"), default="ddim")
    p.add_argument("--config_file", type=str, default=None)
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="Profile a real checkpoint's params (optional — "
                        "cost/time are shape-dependent, not value-"
                        "dependent, so random init gives the same "
                        "numbers).")
    p.add_argument("--time", action="store_true",
                   help="Measure per-stage wall time on the current "
                        "backend (chained-difference; run on TPU in "
                        "background with a 1500s+ budget).")
    p.add_argument("--chain", type=int, default=20,
                   help="K for the K-vs-2K timing chains (--time).")
    p.add_argument("--peak_tflops", type=float, default=197.0,
                   help="Hardware peak for %%-of-peak (--time); v5e "
                        "bf16=197, f32=49.")
    p.add_argument("--cpu", action="store_true",
                   help="Force the CPU backend (cost analysis only).")
    return p.parse_args(argv)


def _cost(compiled):
    """Normalize compiled.cost_analysis() across jax versions."""
    try:
        ca = compiled.cost_analysis()
    except Exception:  # pragma: no cover - backend without cost analysis
        return {}
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return dict(ca or {})


def _mem(compiled):
    try:
        m = compiled.memory_analysis()
        return {
            "temp_bytes": int(getattr(m, "temp_size_in_bytes", 0)),
            "argument_bytes": int(getattr(m, "argument_size_in_bytes", 0)),
            "output_bytes": int(getattr(m, "output_size_in_bytes", 0)),
        }
    except Exception:  # pragma: no cover
        return {}


def _analyze(fn, *args):
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    row = {}
    ca = _cost(compiled)
    if "flops" in ca:
        row["gflop"] = round(float(ca["flops"]) / 1e9, 3)
    if "bytes accessed" in ca:
        row["hbm_gb"] = round(float(ca["bytes accessed"]) / 1e9, 4)
        if row.get("gflop"):
            row["flop_per_byte"] = round(
                float(ca["flops"]) / max(float(ca["bytes accessed"]), 1.0),
                1)
    row.update(_mem(compiled))
    return row


def _chain_time_s(fn, params, args, iters):
    """Frozen methodology: everything the stage consumes depends on the
    scan carry (floats scaled by c ~ 1.0, ints offset by a runtime zero)
    so no consuming subgraph can be hoisted; a host float() forces
    completion; min of 3 trials with a perturbed input each (repeated
    byte-identical executions can be relay-cached — CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    def run(params, *xs):
        def body(c, _):
            zi = None
            perturbed = []
            for x in xs:
                if jnp.issubdtype(x.dtype, jnp.floating):
                    perturbed.append(x * c.astype(x.dtype))
                else:
                    if zi is None:
                        zi = (c * 1e-38).astype(jnp.int32)
                    perturbed.append(x + zi.astype(x.dtype))
            out = fn(params, *perturbed)
            leaf = jax.tree.leaves(out)[0]
            return 1.0 + jnp.mean(leaf).astype(jnp.float32) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    jfn = jax.jit(run)
    float(jfn(params, *args))  # compile + warmup
    best = float("inf")
    for trial in range(3):
        # perturb the FIRST array arg per trial — floats scale by 1+eps,
        # ints roll their largest axis — so all-int stages (decode's
        # codes, cond's ids/mask) never re-execute byte-identical
        # programs either (same rule as tools/bench_suite.py)
        pert = list(args)
        for j, a in enumerate(pert):
            if not hasattr(a, "dtype") or getattr(a, "ndim", 0) == 0:
                continue
            if jnp.issubdtype(a.dtype, jnp.floating):
                pert[j] = a * (1.0 + 1e-6 * (trial + 1))
            else:
                import numpy as _np
                pert[j] = jnp.roll(a, trial + 1,
                                   axis=int(_np.argmax(a.shape)))
            break
        t0 = time.perf_counter()
        float(jfn(params, *pert))
        best = min(best, time.perf_counter() - t0)
    return best


def _per_iter_s(fn, params, args, k):
    t1 = _chain_time_s(fn, params, args, k)
    t2 = _chain_time_s(fn, params, args, 2 * k)
    return (t2 - t1) / k


def _time_train_s(train_step, state, batch, rng, k):
    """Train chain: carry the TrainState itself (params change every
    iteration, so nothing is loop-invariant); loss read at the end."""
    import jax
    import jax.numpy as jnp

    def make_run(iters):
        def run(state, batch, rng):
            def body(s, i):
                s2, metrics = train_step(s, batch,
                                         jax.random.fold_in(rng, i))
                return s2, metrics["loss"]

            s, losses = jax.lax.scan(body, state, jnp.arange(iters))
            return losses[-1]
        return run

    times = {}
    for k2 in (k, 2 * k):
        jfn = jax.jit(make_run(k2))
        float(jfn(state, batch, rng))
        best = float("inf")
        for trial in range(3):
            b2 = dict(batch)
            b2["codes"] = batch["codes"] * (1.0 + 1e-6 * (trial + 1))
            t0 = time.perf_counter()
            float(jfn(state, b2, rng))
            best = min(best, time.perf_counter() - t0)
        times[k2] = best
    return (times[2 * k] - times[k]) / k


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from prompt_tts_tpu.config import Config
    from prompt_tts_tpu.models import TTSPromptSpeaker, TTSSingleSpeaker
    from prompt_tts_tpu.pipeline import Synthesizer, codec_decode

    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    known = {"cond", "denoise", "decode", "train", "synth"}
    bad = set(stages) - known
    if bad:
        raise SystemExit(f"unknown stages {sorted(bad)}; "
                         f"choose from {sorted(known)}")

    cfg = Config.from_json(args.config_file) if args.config_file else Config()
    model_params = None
    if args.ckpt_dir:
        from prompt_tts_tpu.cli._common import restore_model_params
        model_params, _ = restore_model_params(args.ckpt_dir, cfg)
    synth = Synthesizer(config=cfg, model_params=model_params,
                        num_inference_steps=args.num_inference_steps,
                        sampler=args.sampler)
    mcfg = cfg.model
    B = args.batch_size
    prompted = mcfg.prompt_conditioning

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, mcfg.sample_size, mcfg.in_channels))
    t = jnp.full((B,), 500, jnp.int32)
    ids = jnp.zeros((B, mcfg.cmu_seq_len), jnp.int32)
    mask = jnp.ones_like(ids)
    prompt = (jax.random.normal(key, (B, mcfg.prompt_frames,
                                      mcfg.in_channels))
              if prompted else None)
    codes = jnp.zeros((B, mcfg.in_channels, mcfg.sample_size), jnp.int32)

    model = synth.model
    mp = synth.model_params

    def cond_fn(mp, ids, mask, *p):
        if prompted:
            return model.apply(mp, ids, mask, p[0],
                               method=TTSPromptSpeaker.encode_conditioning)
        return model.apply(mp, ids, mask,
                           method=TTSSingleSpeaker.encode_text)

    ctx_spk = jax.jit(cond_fn)(mp, ids, mask,
                               *((prompt,) if prompted else ()))
    if prompted:
        ctx, spk = ctx_spk
    else:
        ctx, spk = ctx_spk, None

    def denoise_fn(mp, x, t, ctx, *s):
        if prompted:
            return model.apply(mp, x, t, ctx, s[0],
                               method=TTSPromptSpeaker.denoise)
        return model.apply(mp, x, t, ctx,
                           method=TTSSingleSpeaker.denoise)

    def decode_fn(cp, codes):
        return codec_decode(synth._codec_fast, cp, codes)

    def synth_fn(mp, x, ids, mask, *p):
        # codec params ride via closure so every positional arg is an
        # array (the timing chain perturbs each one per-iteration)
        return synth._synthesize_device(mp, synth.codec_params, x, ids,
                                        mask, *(p if prompted else ()))

    stage_calls = {}
    if "cond" in stages:
        stage_calls["cond"] = (cond_fn, mp,
                               (ids, mask) + ((prompt,) if prompted else ()))
    if "denoise" in stages:
        stage_calls["denoise"] = (denoise_fn, mp,
                                  (x, t, ctx) + ((spk,) if prompted else ()))
    if "decode" in stages:
        stage_calls["decode"] = (decode_fn, synth.codec_params, (codes,))
    if "synth" in stages:
        stage_calls["synth"] = (synth_fn, mp,
                                (x, ids, mask)
                                + ((prompt,) if prompted else ()))

    results = {}
    for name, (fn, params, sargs) in stage_calls.items():
        log.info("analyzing %s ...", name)
        results[name] = _analyze(fn, params, *sargs)

    train_step = state = batch = None
    if "train" in stages:
        from prompt_tts_tpu.diffusion.schedule import linear_schedule
        from prompt_tts_tpu.train import make_train_step
        from prompt_tts_tpu.train.state import create_train_state

        tb = args.train_batch_size or cfg.train.batch_size
        state = create_train_state(model, mp, cfg.train, 1)
        train_step = make_train_step(
            model.apply, linear_schedule(cfg.train.num_train_timesteps))
        batch = {
            "codes": jax.random.normal(
                key, (tb, mcfg.sample_size, mcfg.in_channels)),
            "text_ids": jnp.zeros((tb, mcfg.cmu_seq_len), jnp.int32),
            "text_mask": jnp.ones((tb, mcfg.cmu_seq_len), jnp.int32),
        }
        if prompted:
            batch["prompt"] = jax.random.normal(
                key, (tb, mcfg.prompt_frames, mcfg.in_channels))
        log.info("analyzing train (batch %d) ...", tb)
        rng = jax.random.PRNGKey(1)
        results["train"] = _analyze(train_step, state, batch, rng)

    if args.time:
        for name, (fn, params, sargs) in stage_calls.items():
            log.info("timing %s (K=%d chains) ...", name, args.chain)
            s = _per_iter_s(fn, params, sargs, args.chain)
            results[name]["ms"] = round(s * 1e3, 3)
            if results[name].get("gflop"):
                pk = results[name]["gflop"] / 1e3 / max(s, 1e-12)
                results[name]["pct_peak"] = round(
                    100.0 * pk / args.peak_tflops, 1)
        if "train" in results and train_step is not None:
            log.info("timing train (K=%d chains) ...", args.chain)
            s = _time_train_s(train_step, state, batch,
                              jax.random.PRNGKey(1), args.chain)
            results["train"]["ms"] = round(s * 1e3, 3)
            if results["train"].get("gflop"):
                pk = results["train"]["gflop"] / 1e3 / max(s, 1e-12)
                results["train"]["pct_peak"] = round(
                    100.0 * pk / args.peak_tflops, 1)

    cols = ["gflop", "hbm_gb", "flop_per_byte", "temp_bytes", "ms",
            "pct_peak"]
    width = max(len(n) for n in results) if results else 5
    print(f"{'stage':>{width}} | " +
          " | ".join(f"{c:>13}" for c in cols))
    for name, row in results.items():
        cells = []
        for c in cols:
            v = row.get(c)
            cells.append(f"{v:>13}" if v is not None else f"{'-':>13}")
        print(f"{name:>{width}} | " + " | ".join(cells))
    note = ("denoise runs once per sampler step "
            f"(x{args.num_inference_steps} per synthesis); cond/decode "
            "run once")
    print(note)
    print(json.dumps({"backend": jax.default_backend(),
                      "batch_size": B, "stages": results}))


if __name__ == "__main__":
    main()
