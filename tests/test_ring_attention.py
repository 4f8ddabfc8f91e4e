"""Ring attention correctness on the 8-device virtual CPU mesh.

The op must equal full (single-device) attention to f32 noise for every
sharding it supports: no bias, additive key bias, and ragged head dims.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from prompt_tts_tpu.ops.attention import _xla_attention
from prompt_tts_tpu.ops.ring_attention import ring_attention


def _mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, axis_names=("sp",))


def _run_ring(q, k, v, key_bias=None):
    mesh = _mesh()
    n = mesh.shape["sp"]
    if key_bias is None:
        fn = shard_map(
            lambda q_, k_, v_: ring_attention(
                q_, k_, v_, axis_name="sp", axis_size=n),
            mesh=mesh,
            in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp"),
        )
        return fn(q, k, v)
    fn = shard_map(
        lambda q_, k_, v_, b_: ring_attention(
            q_, k_, v_, axis_name="sp", axis_size=n, key_bias=b_),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"),
                  P(None, "sp")),
        out_specs=P(None, "sp"),
    )
    return fn(q, k, v, key_bias)


class TestRingAttention:
    @pytest.mark.parametrize("T,D", [(128, 32), (256, 16)])
    def test_matches_full_attention(self, T, D):
        B, H = 2, 4
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, T, H, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, T, H, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, T, H, D), jnp.float32)
        ref = _xla_attention(q, k, v, None)
        out = _run_ring(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_matches_with_key_bias(self):
        B, T, H, D = 1, 128, 2, 16
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q = jax.random.normal(ks[0], (B, T, H, D), jnp.float32)
        k = jax.random.normal(ks[1], (B, T, H, D), jnp.float32)
        v = jax.random.normal(ks[2], (B, T, H, D), jnp.float32)
        # mask out the last quarter of keys
        key_bias = jnp.where(jnp.arange(T) < 3 * T // 4, 0.0, -1e9)[
            None, :].repeat(B, 0)
        ref = _xla_attention(q, k, v, key_bias[:, None, None, :])
        out = _run_ring(q, k, v, key_bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_jits_under_shard_map(self):
        B, T, H, D = 1, 64, 2, 8
        q = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))
        mesh = _mesh()
        fn = jax.jit(shard_map(
            lambda q_, k_, v_: ring_attention(
                q_, k_, v_, axis_name="sp", axis_size=mesh.shape["sp"]),
            mesh=mesh,
            in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp"),
        ))
        out1 = fn(q, q, q)
        out2 = fn(q, q, q)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        assert out1.shape == q.shape
