"""Build a synthetic processed-code tar at flagship shapes.

Emits the exact corpus format the reference pipeline produces
(reference data_preparation/generate_code.py:54-86: per utterance
``<id>.npy`` EnCodec codes [8, T] + ``<id>.txt`` + ``<id>.normalized.txt``
+ ``<id>.len.txt``) so ``cli/train.py --data_file`` exercises the REAL
data path (tar load, phonemizer, C++ collate, prefetch) end-to-end on
hardware without the (unfetchable) LJSpeech corpus.

Codes are random in [0, 1024) — the loss floor is high but descent,
throughput, NaN-freedom and checkpoint/resume are all real.

Run: python tools/make_synth_corpus.py --out /tmp/synth_corpus.tar --n 4096
"""

import argparse
import io
import tarfile

import numpy as np

# small word bank -> pseudo-English sentences so the phonemizer does real
# CMUdict lookups + letter-mode fallbacks at load time
WORDS = ("the quick brown fox jumps over a lazy dog while seventy two "
         "bright students read chapter eleven aloud before noon and "
         "october wind carried paper lanterns across frozen harbor water "
         "doctor miller answered every question about signal processing "
         "hardware").split()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--frames", type=int, default=900)
    ap.add_argument("--n_q", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    with tarfile.open(args.out, "w") as tf:
        for i in range(args.n):
            stem = f"SYN{i:05d}"
            # vary true length like real utterances (pad region exists)
            true_len = int(rng.integers(args.frames // 2, args.frames + 1))
            codes = rng.integers(
                0, 1024, (args.n_q, args.frames)).astype(np.int64)
            buf = io.BytesIO()
            np.save(buf, codes)
            data = buf.getvalue()
            info = tarfile.TarInfo(stem + ".npy")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            nwords = int(rng.integers(4, 10))
            text = " ".join(rng.choice(WORDS, nwords)).capitalize() + "."
            for name, payload in [
                (stem + ".txt", text.encode()),
                (stem + ".normalized.txt", text.encode()),
                (stem + ".len.txt", f"{true_len}.0".encode()),
            ]:
                info = tarfile.TarInfo(name)
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
    print(f"wrote {args.out}: {args.n} utterances, "
          f"[{args.n_q}, {args.frames}] codes each")


if __name__ == "__main__":
    main()
