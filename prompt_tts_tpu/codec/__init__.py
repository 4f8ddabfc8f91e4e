"""EnCodec-compatible 24 kHz neural codec, implemented natively in JAX.

The reference consumes the pretrained facebook EnCodec torch package as a
black box (reference data_preparation/generate_code.py:13-14 for encode,
decode_codec.py:8-16 for decode).  This package re-implements the full
codec — SEANet conv encoder, 2-layer LSTM, residual vector quantizer, and
the mirrored transposed-conv decoder — as JAX/Flax modules with a torch
weight converter, so text→waveform never leaves the device.

Parity bar (BASELINE.md): bit-exact RVQ indices vs the torch model and
mel-distance parity on decoded audio; validated against
``transformers.EncodecModel`` in tests/test_codec_vs_torch.py.
"""

from prompt_tts_tpu.codec.encodec import (
    EncodecCodec,
    EncodecConfig24k,
    EncodecDecoder,
    EncodecEncoder,
)
from prompt_tts_tpu.codec.convert import convert_torch_encodec

__all__ = [
    "EncodecCodec", "EncodecConfig24k", "EncodecEncoder", "EncodecDecoder",
    "convert_torch_encodec",
]
