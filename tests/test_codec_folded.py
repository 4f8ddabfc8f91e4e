"""Folded decoder-tail execution must match the stock decoder bit-for-bit
(up to f32 matmul reassociation) on the SAME params.

The folded path (codec/folded.py) re-expresses the lane-starved C=64/32
stages as dense block-banded matmuls in a space-to-depth layout; this is
pure reassociation of the same f32 sums, so outputs agree to ~1e-6 on
audio at unit scale.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prompt_tts_tpu.codec import EncodecCodec
from prompt_tts_tpu.codec.folded import (conv_folded, convt_folded,
                                         decode_folded)
from prompt_tts_tpu.codec.layers import CodecConv1d, CodecConvTranspose1d


class TestFoldedPrimitives:
    @pytest.mark.parametrize("k,F,Cin,Cout", [(3, 4, 6, 3), (7, 8, 4, 1),
                                              (1, 4, 6, 6)])
    def test_conv_folded_matches_stock(self, k, F, Cin, Cout):
        T = 4 * F
        mod = CodecConv1d(Cout, k)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, T, Cin))
        p = mod.init(jax.random.PRNGKey(1), x)
        ref = mod.apply(p, x)
        xf = x.reshape(2, T // F, F * Cin)
        out = conv_folded(xf, p["params"]["conv"]["kernel"],
                          p["params"]["conv"]["bias"], F)
        np.testing.assert_allclose(
            np.asarray(out).reshape(2, T, Cout), np.asarray(ref),
            atol=2e-6)

    @pytest.mark.parametrize("stride,Fi,Cin,Cout", [(4, 1, 8, 6),
                                                    (2, 4, 6, 4)])
    def test_convt_folded_matches_stock(self, stride, Fi, Cin, Cout):
        T = 3 * max(Fi, 1)
        mod = CodecConvTranspose1d(Cout, 2 * stride, stride=stride)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, T, Cin))
        p = mod.init(jax.random.PRNGKey(3), x)
        ref = mod.apply(p, x)                       # [2, stride*T, Cout]
        xf = x.reshape(2, T // max(Fi, 1), max(Fi, 1) * Cin)
        out = convt_folded(xf, p["params"]["conv"]["kernel"],
                           p["params"]["conv"]["bias"], stride, Fi)
        np.testing.assert_allclose(
            np.asarray(out).reshape(2, stride * T, Cout),
            np.asarray(ref), atol=2e-6)


class TestFoldedDecode:
    def test_matches_stock_decode(self):
        codec = EncodecCodec(dtype=jnp.float32)
        params = codec.init(jax.random.PRNGKey(1), jnp.zeros((1, 3200)),
                            6.0)
        codes = jax.random.randint(jax.random.PRNGKey(2), (2, 8, 40),
                                   0, 1024)
        ref = codec.apply(params, codes, method=EncodecCodec.decode)
        out = decode_folded(codec, params, codes)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
