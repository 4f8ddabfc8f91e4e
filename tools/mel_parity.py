"""Mel-distance parity report: this codec's decode vs torch EnCodec decode.

BASELINE.md's "decoded-audio fidelity" row names mel-distance parity on the
codec decode path (reference decode_codec.py:12-16).  No pretrained
checkpoint is reachable in this environment (zero egress) and the numerics
are weight-independent, so the report decodes the SAME code matrices with
the SAME (randomly initialized, converted) weights through both
implementations — torch transformers.EncodecModel vs prompt_tts_tpu.codec —
over a set of speech-like synthetic clips (harmonic stacks with pitch/
amplitude modulation + breath noise), and reports the mel distance between
the two decodes per clip.

``--codec_dtype bf16`` measures the Synthesizer's bf16 fast-decode path
against the same torch f32 reference (the disclosed fidelity delta of the
default synthesis configuration; BENCHMARKS.md records both).

Run: python -u tools/mel_parity.py [--codec_dtype f32|bf16]  (CPU, ~2 min)
"""

import argparse
import json

import numpy as np


def speechlike_clip(rng, seconds=2.0, sr=24000):
    """Harmonic voice proxy: modulated f0 stack + noise floor."""
    t = np.arange(int(seconds * sr)) / sr
    f0 = 120 + 40 * np.sin(2 * np.pi * 0.7 * t + rng.uniform(0, 6.28))
    phase = np.cumsum(2 * np.pi * f0 / sr)
    voiced = sum((0.6 / k) * np.sin(k * phase) for k in range(1, 6))
    env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(1.5, 3.0) * t))
    noise = 0.02 * rng.standard_normal(t.shape)
    return (0.3 * env * voiced + noise).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec_dtype", choices=("f32", "bf16"), default="f32")
    args = ap.parse_args()

    import torch
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from transformers import EncodecConfig, EncodecModel

    from prompt_tts_tpu.codec import EncodecCodec, convert_torch_encodec
    from prompt_tts_tpu.utils.mel import mel_distance

    torch.manual_seed(0)
    tm = EncodecModel(EncodecConfig()).eval()
    with torch.no_grad():
        for layer in tm.quantizer.layers:
            layer.codebook.embed.normal_()
    params = convert_torch_encodec(tm)
    dt = jnp.float32 if args.codec_dtype == "f32" else jnp.bfloat16
    codec = EncodecCodec(dtype=dt)
    encoder_codec = EncodecCodec()  # encode (code generation) stays f32

    rng = np.random.default_rng(0)
    clips = [speechlike_clip(rng) for _ in range(8)]

    dists, decode_mads = [], []
    for i, clip in enumerate(clips):
        wav = jnp.asarray(clip)[None]
        codes = encoder_codec.apply(params, wav, 6.0,
                                    method=EncodecCodec.encode)
        codes = np.asarray(codes)  # [1, 8, F]

        # production dispatch: folded tail on the f32 path
        from prompt_tts_tpu.pipeline import codec_decode
        ours = np.asarray(codec_decode(codec, params, jnp.asarray(codes))
                          .astype(jnp.float32))[0]
        with torch.no_grad():
            theirs = tm.decode(
                torch.from_numpy(codes.copy())[None], [None]
            ).audio_values[0, 0].numpy()
        n = min(len(ours), len(theirs))
        d = mel_distance(ours[:n], theirs[:n])
        dists.append(float(d))
        decode_mads.append(float(np.abs(ours[:n] - theirs[:n]).max()))
        print(f"clip {i}: mel_distance={d:.6f} "
              f"max_abs_wav_diff={decode_mads[-1]:.2e}", flush=True)

    print(json.dumps({
        "metric": "codec_decode_mel_distance_vs_torch",
        "codec_dtype": args.codec_dtype,
        "value": round(float(np.mean(dists)), 6),
        "max": round(float(np.max(dists)), 6),
        "clips": len(clips),
        "max_abs_wav_diff": float(np.max(decode_mads)),
    }))


if __name__ == "__main__":
    main()
