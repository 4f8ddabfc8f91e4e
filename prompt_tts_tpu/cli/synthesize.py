"""Text -> 24 kHz wav: ``python -m prompt_tts_tpu.cli.synthesize``.

The inference entry point the reference never shipped (SURVEY.md §2b: the
sampler is absent from the repo).  Loads a trained model checkpoint (orbax)
and codec weights (converted msgpack, see convert_codec), or runs with
random weights for smoke purposes.
"""

import argparse
import logging
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Synthesize speech from text.")
    p.add_argument("--text", action="append", default=None,
                   help="Text to speak (repeatable for a batch).")
    p.add_argument("--text_file", type=str, default=None,
                   help="File with one utterance per line (alternative "
                        "to --text; blank lines skipped).")
    p.add_argument("--out", type=str, required=True,
                   help="Output wav path (index appended for batches).")
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="Trained model checkpoint dir (orbax).")
    p.add_argument("--ema", action="store_true",
                   help="Sample from the checkpoint's EMA params "
                        "(requires training with --ema_decay).")
    p.add_argument("--ref_ckpt", type=str, default=None,
                   help="Reference torch checkpoint (ckpt_N.pt from the "
                        "original repo's train.py) — converted on the fly.")
    p.add_argument("--codec_params", type=str, default=None,
                   help="Converted codec weights (msgpack).")
    p.add_argument("--config_file", type=str, default=None)
    p.add_argument("--steps", type=int, default=50,
                   help="Sampler inference steps.")
    p.add_argument("--sampler", choices=("ddim", "dpm"), default="ddim",
                   help="ddim (reference 50-step config) or dpm "
                        "(DPM-Solver++(2M): ~20-25 steps suffice).")
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel synthesis degree: Megatron-shard "
                        "the denoiser over the mesh 'model' axis "
                        "(multi-chip batch-1 latency).")
    p.add_argument("--sp", type=int, default=1,
                   help="Sequence-parallel synthesis degree: shard latent "
                        "time over the mesh 'seq' axis (ring attention; "
                        "longer-than-one-chip audio windows).")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--guidance_scale", type=float, default=1.0,
                   help="Classifier-free guidance scale (>1 needs a "
                        "model trained with cond_dropout_prob>0; "
                        "works for both model families).")
    p.add_argument("--prompt_wav", type=str, default=None,
                   help="Reference-audio prompt (24 kHz wav) for a "
                        "prompt-conditioned (multi-speaker) model.")
    p.add_argument("--trim", action="store_true",
                   help="Trim trailing silence (energy-based; the model "
                        "always generates the full padded duration).")
    p.add_argument("--long", action="store_true",
                   help="Long-form mode: split the (single) --text into "
                        "sentence-packed chunks, synthesize in batches, "
                        "trim each chunk, concatenate into one wav.")
    p.add_argument("--crossfade_ms", type=float, default=0.0,
                   help="Long-form seam treatment: equal-power crossfade "
                        "of this many milliseconds at every window join "
                        "(0 = hard concatenation).")
    p.add_argument("--continuity_prompt", action="store_true",
                   help="Long-form, prompt-conditioned family only: "
                        "condition each window on the PREVIOUS window's "
                        "generated tail codes (sequential windows, "
                        "cross-window speaker/style continuity).")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    if args.text_file:
        if args.text:
            raise SystemExit("pass --text or --text_file, not both")
        with open(args.text_file) as f:
            args.text = [ln.strip() for ln in f if ln.strip()]
        if not args.text:
            raise SystemExit(f"{args.text_file} has no utterances")
    elif not args.text:
        raise SystemExit("one of --text / --text_file is required")

    from prompt_tts_tpu.config import Config
    from prompt_tts_tpu.pipeline import SAMPLE_RATE, Synthesizer
    from prompt_tts_tpu.utils.wav import trim_trailing_silence, write_wav

    config = Config.from_json(args.config_file) if args.config_file else None

    if args.ema and not args.ckpt_dir:
        raise SystemExit("--ema requires --ckpt_dir (EMA params live in "
                         "orbax checkpoints produced by train --ema_decay)")

    model_params = None
    if args.ref_ckpt:
        from prompt_tts_tpu.models.convert import load_reference_checkpoint
        model_params = load_reference_checkpoint(args.ref_ckpt)
        logging.info("converted reference checkpoint %s", args.ref_ckpt)
    elif args.ckpt_dir:
        from prompt_tts_tpu.cli._common import restore_model_params
        from prompt_tts_tpu.config import Config as Cfg
        cfg = config or Cfg()
        model_params, _ = restore_model_params(args.ckpt_dir, cfg,
                                               ema=args.ema)
        config = cfg

    codec_params = None
    if args.codec_params:
        from prompt_tts_tpu.codec.io import load_codec_params
        codec_params = load_codec_params(args.codec_params)
        logging.info("loaded codec params from %s", args.codec_params)
    else:
        logging.warning(
            "no --codec_params given: using RANDOM codec weights "
            "(output will be noise; for pipeline smoke only)")

    mesh = None
    if args.tp > 1 or args.sp > 1:
        from prompt_tts_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_model=args.tp, n_seq=args.sp)
        logging.info("sharded synthesis over mesh %s", dict(mesh.shape))

    synth = Synthesizer(
        config=config,
        model_params=model_params,
        codec_params=codec_params,
        num_inference_steps=args.steps,
        sampler=args.sampler,
        guidance_scale=args.guidance_scale,
        mesh=mesh,
    )
    prompt_wav = None
    if args.prompt_wav:
        import numpy as np
        from prompt_tts_tpu.utils.wav import read_wav
        audio, sr = read_wav(args.prompt_wav)
        if sr != SAMPLE_RATE:
            from prompt_tts_tpu.utils.resample import resample
            audio = resample(audio, sr, SAMPLE_RATE)
        prompt_wav = np.tile(audio[None, :, 0], (len(args.text), 1))
    if args.long:
        if len(args.text) != 1:
            raise SystemExit("--long takes exactly one --text")
        wav = synth.synthesize_long(args.text[0], seed=args.seed,
                                    prompt_wav=prompt_wav,
                                    crossfade_ms=args.crossfade_ms,
                                    continuity_prompt=args.continuity_prompt)
        write_wav(args.out, wav, SAMPLE_RATE)
        logging.info("wrote %s (%.2f s, %d chunks)", args.out,
                     len(wav) / SAMPLE_RATE,
                     len(synth.split_long_text(args.text[0])))
        return

    wavs = synth.synthesize(args.text, seed=args.seed,
                            prompt_wav=prompt_wav)

    base, ext = os.path.splitext(args.out)
    for i, wav in enumerate(wavs):
        if args.trim:
            wav = trim_trailing_silence(wav)
        path = args.out if len(wavs) == 1 else f"{base}_{i}{ext}"
        write_wav(path, wav, SAMPLE_RATE)
        logging.info("wrote %s (%.2f s)", path, len(wav) / SAMPLE_RATE)


if __name__ == "__main__":
    main()
