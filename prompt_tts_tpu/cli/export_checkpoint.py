"""Export a trained checkpoint to the reference's torch format:
``python -m prompt_tts_tpu.cli.export_checkpoint``.

Inverse of ``synthesize --ref_ckpt`` / ``train --init_from_ref``: restores
an orbax checkpoint trained HERE and writes a ``ckpt_N.pt`` the original
repo's ``TTSSingleSpeaker`` loads with a strict ``load_state_dict``
(reference train.py:139-144 save format; tts/models.py:123 model). Only
the single-speaker family exports — the reference has no prompt
conditioning to receive the prompt-encoder params.
"""

import argparse
import logging


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Export an orbax checkpoint as a reference torch "
                    "ckpt_N.pt.")
    p.add_argument("--ckpt_dir", required=True,
                   help="Trained model checkpoint dir (orbax).")
    p.add_argument("--out", required=True,
                   help="Output path (e.g. ckpt_99.pt).")
    p.add_argument("--ema", action="store_true",
                   help="Export the EMA params (requires training with "
                        "--ema_decay).")
    p.add_argument("--config_file", type=str, default=None,
                   help="Model config JSON the checkpoint was trained "
                        "with (defaults match the reference).")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    import jax
    jax.config.update("jax_platforms", "cpu")  # restore+export is host work

    from prompt_tts_tpu.cli._common import restore_model_params
    from prompt_tts_tpu.config import Config
    from prompt_tts_tpu.models.export import save_reference_checkpoint

    cfg = Config.from_json(args.config_file) if args.config_file else Config()
    if cfg.model.prompt_conditioning:
        raise SystemExit(
            "export: the reference model is single-speaker only; a "
            "prompt-conditioned checkpoint has no torch counterpart")
    params, step = restore_model_params(args.ckpt_dir, cfg, ema=args.ema)
    n = save_reference_checkpoint(params, cfg.model, args.out)
    logging.info("wrote %s (%d tensors, step %d%s)", args.out, n, step,
                 ", EMA" if args.ema else "")


if __name__ == "__main__":
    main()
