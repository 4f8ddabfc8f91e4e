"""Wav tar -> EnCodec code tar: the offline feature-extraction step.

Mirror of reference data_preparation/generate_code.py:54-86: streams wavs
from a tar, mono-izes, resamples to 24 kHz, zero-pads every clip to
``--max_duration`` seconds (default 12 -> 900 frames), batch-encodes at
6 kbps with the JAX codec, and writes ``<id>.npy`` ``[8, 900]`` +
``<id>.len.txt`` (true frame count ceil(samples/320)) plus all ``.txt``
members into ``<input>_processed.tar``.

Reference defects intentionally fixed (SURVEY.md §7 "do not replicate"):
the trailing batch is emitted exactly once (generate_code.py:41's
always-true guard) and no CUDA-availability call bug exists.
"""

import argparse
import io
import math
import tarfile
from tempfile import TemporaryDirectory


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Generate codec codes for a wav tar.")
    p.add_argument("--input_file", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_duration", type=int, default=12,
                   help="Pad/truncate every clip to this many seconds.")
    p.add_argument("--codec_params", type=str, default=None,
                   help="Converted codec weights (msgpack).")
    p.add_argument("--cpu", action="store_true",
                   help="Run the codec on CPU (useful for small corpora "
                        "where TPU compile time dominates).")
    return p.parse_args(argv)


def iter_batches(tf, members, batch_size, max_duration, sample_rate=24000):
    """Yield (wavs [B, max_samples], names, frame_lengths)."""
    import numpy as np

    from prompt_tts_tpu.utils.resample import resample
    from prompt_tts_tpu.utils.wav import read_wav

    max_samples = sample_rate * max_duration
    wavs, names, lengths = [], [], []
    for member in members:
        if not member.name.endswith(".wav"):
            continue
        audio, sr = read_wav(io.BytesIO(tf.extractfile(member).read()))
        audio = audio[:, 0]  # mono (first channel, as the reference does)
        if sr != sample_rate:
            audio = resample(audio, sr, sample_rate)
        audio = audio[:max_samples]
        lengths.append(int(math.ceil(len(audio) / 320)))
        names.append(member.name)
        padded = np.zeros(max_samples, np.float32)
        padded[: len(audio)] = audio
        wavs.append(padded)
        if len(wavs) == batch_size:
            yield np.stack(wavs), names, lengths
            wavs, names, lengths = [], [], []
    if wavs:
        yield np.stack(wavs), names, lengths


def main(argv=None):
    args = parse_args(argv)
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from prompt_tts_tpu.pipeline import CodecRunner

    codec_params = None
    if args.codec_params:
        from prompt_tts_tpu.codec.io import load_codec_params
        codec_params = load_codec_params(args.codec_params)
    runner = CodecRunner(codec_params)

    output_file = args.input_file.replace(".tar", "_processed.tar")
    n_items = 0
    with tarfile.open(args.input_file, "r") as tf, \
            tarfile.open(output_file, "w") as out_tf:
        members = tf.getmembers()
        for wavs, names, lengths in iter_batches(
                tf, members, args.batch_size, args.max_duration):
            codes = runner.encode(wavs)  # [B, 8, 900]
            with TemporaryDirectory() as dirname:
                for i, code in enumerate(codes):
                    stem = names[i].split("/")[-1][: -len(".wav")]
                    np_path = f"{dirname}/{stem}.npy"
                    np.save(np_path, code.astype(np.int64))
                    out_tf.add(np_path, arcname=f"{stem}.npy")
                    len_path = f"{dirname}/{stem}.len.txt"
                    with open(len_path, "w") as f:
                        f.write(str(float(lengths[i])))
                    out_tf.add(len_path, arcname=f"{stem}.len.txt")
                    n_items += 1
        # copy transcripts through
        for member in members:
            if member.name.endswith(".txt"):
                data = tf.extractfile(member).read()
                info = tarfile.TarInfo(member.name.split("/")[-1])
                info.size = len(data)
                out_tf.addfile(info, io.BytesIO(data))
    print(f"wrote {output_file} ({n_items} utterances)")


if __name__ == "__main__":
    main()
