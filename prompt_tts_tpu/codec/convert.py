"""Torch -> JAX weight conversion for the EnCodec codec.

Accepts a ``transformers.EncodecModel`` (architecture-identical to the
facebook ``encodec`` package the reference uses; HF ships converted
facebook weights as ``facebook/encodec_24khz``) and emits the param pytree
of :class:`prompt_tts_tpu.codec.encodec.EncodecCodec`.

Weight norm is folded: torch materializes the effective ``conv.weight``
from its (g, v) parametrization on access, so reading ``.weight`` gives the
dense kernel directly.
"""

from typing import Dict

import numpy as np


def _conv_params(torch_conv) -> Dict[str, np.ndarray]:
    w = torch_conv.weight.detach().cpu().numpy()   # [out, in, k]
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if torch_conv.bias is not None:
        p["bias"] = torch_conv.bias.detach().cpu().numpy()
    return p


def _convt_params(torch_convt) -> Dict[str, np.ndarray]:
    w = torch_convt.weight.detach().cpu().numpy()  # [in, out, k]
    # flax ConvTranspose(transpose_kernel=True) kernel: [k, out, in]
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if torch_convt.bias is not None:
        p["bias"] = torch_convt.bias.detach().cpu().numpy()
    return p


def _lstm_params(torch_lstm_module, num_layers: int) -> Dict[str, np.ndarray]:
    lstm = torch_lstm_module.lstm
    out = {}
    for layer in range(num_layers):
        w_ih = getattr(lstm, f"weight_ih_l{layer}").detach().cpu().numpy()
        w_hh = getattr(lstm, f"weight_hh_l{layer}").detach().cpu().numpy()
        b_ih = getattr(lstm, f"bias_ih_l{layer}").detach().cpu().numpy()
        b_hh = getattr(lstm, f"bias_hh_l{layer}").detach().cpu().numpy()
        out[f"l{layer}_w_ih"] = w_ih
        out[f"l{layer}_w_hh"] = w_hh
        out[f"l{layer}_b"] = b_ih + b_hh  # torch adds both biases
    return out


def _seanet_params(torch_stack, num_lstm_layers: int) -> Dict:
    """Convert encoder.layers / decoder.layers (ModuleList) by index."""
    import torch.nn as tnn

    params = {}
    for i, layer in enumerate(torch_stack):
        name = f"layer_{i}"
        cls = type(layer).__name__
        if cls == "EncodecConv1d":
            params[name] = {"conv": _conv_params(layer.conv)}
        elif cls == "EncodecConvTranspose1d":
            params[name] = {"conv": _convt_params(layer.conv)}
        elif cls == "EncodecLSTM":
            params[name] = _lstm_params(layer, num_lstm_layers)
        elif cls == "EncodecResnetBlock":
            params[name] = {
                "block_1": {"conv": _conv_params(layer.block[1].conv)},
                "block_3": {"conv": _conv_params(layer.block[3].conv)},
                "shortcut": {"conv": _conv_params(layer.shortcut.conv)},
            }
        elif isinstance(layer, tnn.ELU):
            continue
        else:
            raise ValueError(f"unexpected codec layer {cls} at index {i}")
    return params


def convert_torch_encodec(torch_model) -> Dict:
    """transformers.EncodecModel -> EncodecCodec params pytree."""
    cfg = torch_model.config
    codebooks = np.stack([
        layer.codebook.embed.detach().cpu().numpy()
        for layer in torch_model.quantizer.layers
    ])
    params = {
        "encoder": _seanet_params(torch_model.encoder.layers,
                                  cfg.num_lstm_layers),
        "decoder": _seanet_params(torch_model.decoder.layers,
                                  cfg.num_lstm_layers),
        "codebooks": codebooks,
    }
    return {"params": params}
