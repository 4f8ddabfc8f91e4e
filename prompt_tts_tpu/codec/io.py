"""Codec parameter persistence (msgpack via flax.serialization)."""

from typing import Dict

import flax.serialization
import jax
import jax.numpy as jnp

from prompt_tts_tpu.codec.encodec import EncodecCodec


def save_codec_params(params: Dict, path: str) -> None:
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))


def load_codec_params(path: str) -> Dict:
    codec = EncodecCodec()
    template = jax.eval_shape(
        lambda r: codec.init(r, jnp.zeros((1, 3200)), 6.0),
        jax.random.PRNGKey(0))
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())
