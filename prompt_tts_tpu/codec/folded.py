"""Folded (space-to-depth) execution of the SEANet decoder tail.

The last two decoder stages run at C=64/T=144k and C=32/T=288k — a
quarter/eighth of the TPU's 128 lanes — and were measured at ~2% of f32
peak (ARCHITECTURE.md; tools/abl_decoder.py: the C=32 resnet alone is
12.4 ms of the 22.7 ms decode).  Round 2 tried folding PER CONV and
reverted it: each [B,T,C]->[B,T/F,F*C] reshape is a real relayout that
costs more than the recovered lanes.

This module folds ONCE around the whole tail instead, and never unfolds
in between: time stays grouped at the head-stage group count G = T0
(36000 for the 12 s window), and every op is expressed directly in the
folded layout —

* transposed convs (kernel 2*stride, stride s, causal right-trim —
  reference encodec SEANet, see codec/layers.py:80-100) decompose into
  per-parity 2-tap convs: y[s*u + p] = x[u] @ W[p] + x[u-1] @ W[p+s],
  which in folded form is ONE dense matmul against a block-banded
  weight, and the output lands ALREADY FOLDED by Fi*s (fold factors are
  created by the strides themselves: 1 -> 4 -> 8, i.e. lanes 128 -> 256
  -> 256);
* stride-1 causal convs (k=3 resnet, k=7 final) become a dense matmul
  of [prev (k-1) slots ++ F slots] against a block-banded weight; the
  global left edge reproduces the torch REFLECT padding exactly by
  materializing the k-1 reflected slots for group 0;
* k=1 convs are block-diagonal matmuls; ELU is fold-invariant.

The block-banded weights are dense (2-4x the sparse FLOPs) but every
matmul runs with K in [128, 448] and N in [128, 256] — MXU-shaped —
instead of K<=96, N<=64.  Numerics: pure f32 matmul reassociation of the
same sums; bit-comparable to the stock decoder (tests/test_codec_folded.py).
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def _block_band_conv(K: jnp.ndarray, F: int) -> jnp.ndarray:
    """Stride-1 conv weights ``[k, Cin, Cout]`` -> dense band
    ``[(k-1+F)*Cin, F*Cout]`` acting on [prev k-1 slots ++ F slots]."""
    k, Cin, Cout = K.shape
    W = jnp.zeros(((k - 1 + F) * Cin, F * Cout), K.dtype)
    for s in range(F):
        for j in range(k):
            q = s + j
            W = W.at[q * Cin:(q + 1) * Cin,
                     s * Cout:(s + 1) * Cout].set(K[j])
    return W


def _block_band_convt(K: jnp.ndarray, stride: int, Fi: int) -> jnp.ndarray:
    """Transposed-conv weights ``[2*stride, Cout, Cin]`` (flax
    transpose_kernel layout) -> dense band ``[(1+Fi)*Cin,
    Fi*stride*Cout]`` acting on [prev 1 slot ++ Fi slots]."""
    k, Cout, Cin = K.shape
    assert k == 2 * stride, (k, stride)
    W = jnp.transpose(K, (0, 2, 1))       # [k, Cin, Cout]
    B = jnp.zeros(((1 + Fi) * Cin, Fi * stride * Cout), K.dtype)
    for r in range(Fi):
        for p in range(stride):
            s = r * stride + p
            for d in (0, 1):              # input frames u and u-1
                q = r - d + 1
                B = B.at[q * Cin:(q + 1) * Cin,
                         s * Cout:(s + 1) * Cout].set(W[p + stride * d])
    return B


def _with_prev(x: jnp.ndarray, n_slots: int, Cin: int,
               edge: str) -> jnp.ndarray:
    """Append each group's previous ``n_slots`` input slots:
    ``[B, G, F*Cin] -> [B, G, (n_slots+F)*Cin]``.

    ``edge``: group 0's missing history is ``"zero"`` (transposed conv —
    VALID semantics) or ``"reflect"`` (stride-1 causal conv — torch
    reflect pad: x[-m] = x[m])."""
    B, G, FC = x.shape
    F = FC // Cin
    assert n_slots < F, (n_slots, F)
    prev = x[:, :-1, (F - n_slots) * Cin:]             # groups g-1 tails
    if edge == "zero":
        first = jnp.zeros((B, 1, n_slots * Cin), x.dtype)
    else:
        # slots for x[-n_slots .. -1] = x[n_slots .. 1] (reflect)
        parts = [x[:, :1, m * Cin:(m + 1) * Cin]
                 for m in range(n_slots, 0, -1)]
        first = jnp.concatenate(parts, axis=-1)
    prev = jnp.concatenate([first, prev], axis=1)
    return jnp.concatenate([prev, x], axis=-1)


def conv_folded(x: jnp.ndarray, K: jnp.ndarray, b: jnp.ndarray,
                F: int) -> jnp.ndarray:
    """Stride-1 causal conv (left reflect pad k-1) in folded layout."""
    k, Cin, Cout = K.shape
    if k == 1:                             # block-diagonal fast path
        W = jax.scipy.linalg.block_diag(*([K[0]] * F)) if F > 1 else K[0]
        return x @ W + jnp.tile(b, F)
    z = _with_prev(x, k - 1, Cin, edge="reflect")
    return z @ _block_band_conv(K, F) + jnp.tile(b, F)


def convt_folded(x: jnp.ndarray, K: jnp.ndarray, b: jnp.ndarray,
                 stride: int, Fi: int) -> jnp.ndarray:
    """Transposed conv (k=2*stride, causal right-trim) in folded layout;
    output fold factor is ``Fi*stride``."""
    Cin = K.shape[2]
    if Fi == 1:
        z = jnp.concatenate(
            [jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0))), x], axis=-1)
    else:
        z = _with_prev(x, 1, Cin, edge="zero")
    return z @ _block_band_convt(K, stride, Fi) + jnp.tile(b, Fi * stride)


def resnet_folded(x: jnp.ndarray, p: dict, F: int) -> jnp.ndarray:
    """SEANet residual unit (elu-conv_k-elu-conv1 + 1x1 shortcut,
    dilation 1) in folded layout."""
    h = jax.nn.elu(x)
    h = conv_folded(h, p["block_1"]["conv"]["kernel"],
                    p["block_1"]["conv"]["bias"], F)
    h = jax.nn.elu(h)
    h = conv_folded(h, p["block_3"]["conv"]["kernel"],
                    p["block_3"]["conv"]["bias"], F)
    s = conv_folded(x, p["shortcut"]["conv"]["kernel"],
                    p["shortcut"]["conv"]["bias"], F)
    return s + h


def tail_layer_indices(cfg) -> Tuple[int, int, int, int, int]:
    """Decoder layer indices of (convT_a, res_a, convT_b, res_b, final)
    for the LAST TWO upsample stages (matches EncodecDecoder naming)."""
    assert cfg.num_residual_layers == 1, "folded tail assumes 1 res layer"
    i = 2                                  # conv, lstm
    idx = []
    for _ in cfg.upsampling_ratios:
        i += 1                             # ELU
        idx.append((i, i + 1))             # convT, resnet
        i += 2
    final = i + 1
    (ca, ra), (cb, rb) = idx[-2], idx[-1]
    return ca, ra, cb, rb, final


def decode_folded(codec, params, codes: jnp.ndarray) -> jnp.ndarray:
    """Full decode with the folded tail: stock head (full-lane stages) +
    folded last-two stages.  Drop-in for ``EncodecCodec.decode``."""
    x = codec.apply(params, codes, method=type(codec).decode_head)
    return folded_tail(params["params"]["decoder"], x, codec.config)


def folded_tail(dec_params: dict, x: jnp.ndarray, cfg) -> jnp.ndarray:
    """Run the decoder's last two upsample stages + final conv in the
    folded layout.  ``x``: the head output ``[B, T0, C0]`` (C0 = 4 *
    num_filters); returns wav ``[B, T0 * r_a * r_b]``."""
    ra, rb = cfg.upsampling_ratios[-2:]
    ca_i, ra_i, cb_i, rb_i, fin_i = tail_layer_indices(cfg)
    p = dec_params
    B = x.shape[0]

    x = jax.nn.elu(x)
    x = convt_folded(x, p[f"layer_{ca_i}"]["conv"]["kernel"],
                     p[f"layer_{ca_i}"]["conv"]["bias"], ra, Fi=1)
    x = resnet_folded(x, p[f"layer_{ra_i}"], F=ra)
    x = jax.nn.elu(x)
    x = convt_folded(x, p[f"layer_{cb_i}"]["conv"]["kernel"],
                     p[f"layer_{cb_i}"]["conv"]["bias"], rb, Fi=ra)
    x = resnet_folded(x, p[f"layer_{rb_i}"], F=ra * rb)
    x = jax.nn.elu(x)
    y = conv_folded(x, p[f"layer_{fin_i}"]["conv"]["kernel"],
                    p[f"layer_{fin_i}"]["conv"]["bias"], F=ra * rb)
    return y.reshape(B, -1)                # Cout = 1: slots ARE samples
