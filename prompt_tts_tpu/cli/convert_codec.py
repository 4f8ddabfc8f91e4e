"""Convert torch EnCodec weights -> JAX codec params (msgpack).

Accepts either a local transformers checkpoint directory
(``facebook/encodec_24khz`` layout) or ``--random`` for a reproducible
random codec (tests/smoke).
"""

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Convert EnCodec torch weights.")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--torch_dir", type=str,
                     help="Local transformers EncodecModel checkpoint dir.")
    src.add_argument("--random", action="store_true",
                     help="Random-initialized torch codec (seeded).")
    p.add_argument("--out", type=str, required=True,
                   help="Output msgpack path.")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import torch
    from transformers import EncodecConfig, EncodecModel

    from prompt_tts_tpu.codec import convert_torch_encodec
    from prompt_tts_tpu.codec.io import save_codec_params

    if args.torch_dir:
        tmodel = EncodecModel.from_pretrained(args.torch_dir).eval()
    else:
        torch.manual_seed(args.seed)
        tmodel = EncodecModel(EncodecConfig()).eval()
        with torch.no_grad():
            for layer in tmodel.quantizer.layers:
                layer.codebook.embed.normal_()

    params = convert_torch_encodec(tmodel)
    save_codec_params(params, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
