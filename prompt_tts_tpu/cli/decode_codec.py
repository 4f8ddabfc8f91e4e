"""Codes (.npy) -> wav: ``python -m prompt_tts_tpu.cli.decode_codec``.

Mirror of the reference tool (reference decode_codec.py:19-41): loads a
``[B?, 8, T]`` code matrix, decodes with the codec, writes
``<input>.wav`` at 24 kHz.
"""

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Convert codec codes back to waveform.")
    p.add_argument("--npy_path", required=True,
                   help="Path to codec code matrix (.npy).")
    p.add_argument("--codec_params", type=str, default=None,
                   help="Converted codec weights (msgpack).")
    p.add_argument("--cpu", action="store_true",
                   help="Run the codec on CPU (skips TPU compile latency).")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from prompt_tts_tpu.pipeline import SAMPLE_RATE, CodecRunner
    from prompt_tts_tpu.utils.wav import write_wav

    codes = np.load(args.npy_path)
    if codes.ndim == 2:
        codes = codes[None]
    if codes.ndim != 3:
        raise SystemExit("codes must be [B, n_q, T] or [n_q, T]")

    codec_params = None
    if args.codec_params:
        from prompt_tts_tpu.codec.io import load_codec_params
        codec_params = load_codec_params(args.codec_params)

    runner = CodecRunner(codec_params)
    wav = runner.decode(codes.astype(np.int32))
    out = args.npy_path.replace(".npy", ".wav")
    write_wav(out, wav[0], SAMPLE_RATE)
    print(f"wrote {out} ({wav.shape[-1] / SAMPLE_RATE:.2f} s)")


if __name__ == "__main__":
    main()
