"""Checkpoint evaluation: ``python -m prompt_tts_tpu.cli.evaluate``.

The reference has no evaluation tooling at all (its train.py:111-125 logs
only the running train loss); this tool scores a trained checkpoint on a
held-out corpus:

* ``eval_loss`` — deterministic ε-MSE over the dataset with a FIXED
  noise/timestep stream per batch index (same contract as
  ``Trainer.evaluate``), so numbers are comparable across checkpoints
  and runs.
* ``timestep_profile`` — the same loss at a fixed grid of diffusion
  timesteps (one compiled program, ``t`` traced): low-t loss tracks fine
  spectral detail, high-t loss coarse structure. A single averaged loss
  hides WHERE on the schedule a model is weak; the profile shows it.

Prints one JSON line (machine-readable) after a human summary.
"""

import argparse
import json
import logging


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a trained checkpoint.")
    p.add_argument("--data_file", required=True,
                   help="Held-out corpus tar (same format as train).")
    p.add_argument("--ckpt_dir", required=True,
                   help="Trained model checkpoint dir (orbax).")
    p.add_argument("--ema", action="store_true",
                   help="Evaluate the EMA params.")
    p.add_argument("--config_file", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=None,
                   help="Defaults to the config's train batch size.")
    p.add_argument("--max_seq_length", type=int, default=None,
                   help="Text id length (defaults to the config's "
                        "cmu_seq_len — they must match the model).")
    p.add_argument("--streaming", action="store_true",
                   help="Lazy tar reads (corpora beyond RAM).")
    p.add_argument("--max_batches", type=int, default=0,
                   help="Evaluate at most N batches (0 = all).")
    p.add_argument("--timesteps", type=str, default="50,250,500,750,950",
                   help="Comma-separated timestep grid for the profile "
                        "(empty string disables it).")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from prompt_tts_tpu.cli._common import restore_model_params
    from prompt_tts_tpu.config import Config
    from prompt_tts_tpu.diffusion.schedule import linear_schedule
    from prompt_tts_tpu.models import TTSPromptSpeaker, TTSSingleSpeaker
    from prompt_tts_tpu.train import make_eval_step, make_eval_step_at

    cfg = Config.from_json(args.config_file) if args.config_file else Config()
    params, step = restore_model_params(args.ckpt_dir, cfg, ema=args.ema)

    # prompted configs: batches must carry a speaker-prompt crop
    pf = (cfg.model.prompt_frames
          if cfg.model.prompt_conditioning else None)
    seq_len = args.max_seq_length or cfg.model.cmu_seq_len
    if args.streaming:
        from prompt_tts_tpu.data.streaming import StreamingCodeDataset
        dataset = StreamingCodeDataset(args.data_file,
                                       max_seq_length=seq_len,
                                       prompt_frames=pf)
    else:
        from prompt_tts_tpu.data import CodeDataset
        dataset = CodeDataset(args.data_file,
                              max_seq_length=seq_len,
                              prompt_frames=pf)

    model_cls = (TTSPromptSpeaker if cfg.model.prompt_conditioning
                 else TTSSingleSpeaker)
    model = model_cls(cfg.model)
    schedule = linear_schedule(cfg.train.num_train_timesteps)
    eval_fn = jax.jit(make_eval_step(model.apply, schedule))
    grid = [int(t) for t in args.timesteps.split(",") if t.strip()]
    bad = [t for t in grid if not 0 <= t < cfg.train.num_train_timesteps]
    if bad:
        raise SystemExit(f"--timesteps outside [0, "
                         f"{cfg.train.num_train_timesteps}): {bad}")
    at_fn = jax.jit(make_eval_step_at(model.apply, schedule)) if grid else None

    batch_size = args.batch_size or cfg.train.batch_size
    total, n = 0.0, 0
    prof = {t: 0.0 for t in grid}
    for i, batch in enumerate(dataset.batches(batch_size)):
        if args.max_batches and i >= args.max_batches:
            break
        rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        total += float(eval_fn(params, batch, rng))
        for t in grid:
            prof[t] += float(at_fn(params, batch, rng, t))
        n += 1
    if n == 0:
        raise SystemExit(
            f"dataset yielded no batches at batch_size={batch_size}")

    result = {
        "eval_loss": total / n,
        "num_batches": n,
        "batch_size": batch_size,
        "step": step,
        "params": "ema" if args.ema else "raw",
    }
    if grid:
        result["timestep_profile"] = {
            str(t): prof[t] / n for t in grid}
    logging.info("eval loss %.6f over %d batches (checkpoint step %d%s)",
                 result["eval_loss"], n, step, ", EMA" if args.ema else "")
    for t in grid:
        logging.info("  t=%4d  loss %.6f", t, prof[t] / n)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
