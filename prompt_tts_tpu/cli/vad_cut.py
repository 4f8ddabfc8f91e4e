"""CLI for VAD corpus segmentation (reference cut_by_vad.py:167-184)."""

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Cut a dataset into short sequences using VAD files.")
    p.add_argument("--input_dir", type=str, required=True,
                   help="Input tar of (json, flac/wav) pairs.")
    p.add_argument("--n_workers", type=int, default=8)
    p.add_argument("--state_dir", type=str, default=".",
                   help="Where ignore/error lists live (resumability).")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from prompt_tts_tpu.data.vad_cut import cut_corpus
    n_ok, n_err = cut_corpus(args.input_dir, args.n_workers, args.state_dir)
    print(f"segmented {n_ok} items ({n_err} errors)")


if __name__ == "__main__":
    main()
