"""Export the synthesis program as an AOT deployment artifact:
``python -m prompt_tts_tpu.cli.export_program``.

Bakes a checkpoint's params into the jitted text->wav device program and
serializes it with ``jax.export`` (portable StableHLO — see
``prompt_tts_tpu/aot.py``).  A serving box then runs
``aot.SynthesisProgram(artifact).synthesize(texts)`` with no model code,
config, or checkpoint present.  The reference has no deployment story at
all (no inference entry point — SURVEY.md §3.4 note); this is the
TPU-native analog of the torch.jit.save/ONNX exports its ecosystem
relies on.
"""

import argparse
import logging


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Export the jitted synthesis program as a portable "
                    "AOT artifact.")
    p.add_argument("--out", required=True,
                   help="Artifact output path (e.g. synth_b8.ptts).")
    p.add_argument("--batch", type=int, default=8,
                   help="Static batch size to export at.")
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="Trained model checkpoint dir (orbax); random "
                        "params if omitted (smoke).")
    p.add_argument("--ema", action="store_true",
                   help="Bake the EMA params (requires --ema_decay "
                        "training).")
    p.add_argument("--codec_params", type=str, default=None,
                   help="Converted codec weights (msgpack).")
    p.add_argument("--config_file", type=str, default=None)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--sampler", choices=("ddim", "dpm"), default="ddim")
    p.add_argument("--guidance_scale", type=float, default=1.0)
    p.add_argument("--float32", action="store_true",
                   help="Export the float32-wav program instead of the "
                        "device-quantized int16 PCM serving program.")
    p.add_argument("--platforms", type=str, default=None,
                   help="Comma-separated lowering targets (e.g. "
                        "'tpu' or 'tpu,cpu'); default = current backend.")
    p.add_argument("--check", action="store_true",
                   help="Reload the artifact and verify it reproduces "
                        "the live program's output bit-for-bit.")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import numpy as np

    from prompt_tts_tpu import aot
    from prompt_tts_tpu.codec.io import load_codec_params
    from prompt_tts_tpu.config import Config
    from prompt_tts_tpu.pipeline import Synthesizer

    cfg = Config.from_json(args.config_file) if args.config_file else Config()
    model_params = None
    if args.ckpt_dir:
        from prompt_tts_tpu.cli._common import restore_model_params
        model_params, _ = restore_model_params(args.ckpt_dir, cfg,
                                               ema=args.ema)
    codec_params = (load_codec_params(args.codec_params)
                    if args.codec_params else None)
    synth = Synthesizer(
        config=cfg, model_params=model_params, codec_params=codec_params,
        num_inference_steps=args.steps, sampler=args.sampler,
        guidance_scale=args.guidance_scale)

    platforms = ([p.strip() for p in args.platforms.split(",") if p.strip()]
                 if args.platforms else None)
    header = aot.export_synthesis(
        synth, args.batch, args.out, pcm16=not args.float32,
        platforms=platforms)
    import os
    logging.info("wrote %s (%.1f MB, platforms=%s, batch=%d, %s-%d%s)",
                 args.out, os.path.getsize(args.out) / 1e6,
                 ",".join(header["platforms"]), args.batch,
                 header["sampler"], header["num_inference_steps"],
                 ", pcm16" if header["pcm16"] else "")

    if args.check:
        prog = aot.SynthesisProgram(args.out)
        texts = ["export check"] * args.batch
        kw_prog, kw_live = {}, {}
        if header["prompted"]:
            # mid-scale constant prompt at the exact static prompt
            # length, so live (codes -> latents) and artifact (latents
            # directly) see identical conditioning
            from prompt_tts_tpu.pipeline import codes_to_latents
            codes = np.full(
                (args.batch, cfg.model.in_channels,
                 cfg.model.prompt_frames), 512, np.int32)
            kw_live = {"prompt_codes": codes}
            kw_prog = {"prompt_latents": np.asarray(
                codes_to_latents(codes))}
        got = prog.synthesize(texts, seed=0, **kw_prog)
        want = synth.synthesize(texts, seed=0, pcm16=header["pcm16"],
                                **kw_live)
        if not np.array_equal(got, np.asarray(want)):
            raise SystemExit("artifact output differs from live program")
        logging.info("check OK: artifact matches the live program "
                     "bit-for-bit")


if __name__ == "__main__":
    main()
