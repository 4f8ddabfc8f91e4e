"""Ring attention: exact attention over a sequence-sharded mesh axis.

The flagship model's sequences (latent T<=900, text S=550) fit one chip,
so the production attention path is single-device (SURVEY.md §2d: SP "not
needed for parity").  This op is the natural extension the survey names
for longer-audio regimes: K/V (and the optional key bias) live sharded
along a mesh axis; each device computes its local Q rows against every
K/V shard by rotating the shards around the ring with ``lax.ppermute``
(point-to-point ICI neighbor traffic, overlappable with compute) while
maintaining flash-style running softmax statistics — numerically the
standard online-softmax recursion, so the result equals full attention to
f32 noise.

Usage (under ``shard_map`` with a mesh axis ``"sp"``):

    out = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="sp",
                                       axis_size=mesh.shape["sp"]),
        mesh=mesh,
        in_specs=(P(None, "sp", None, None),) * 3,   # shard T
        out_specs=P(None, "sp", None, None),
    )(q, k, v)

Matches the semantics of ``ops.scaled_dot_product_attention`` (scale
D**-0.5, optional additive key-only bias, f32-stable softmax).
"""

from typing import Optional

import jax
import jax.numpy as jnp


def ring_attention(
    q: jnp.ndarray,                 # [B, Tq_local, H, D]
    k: jnp.ndarray,                 # [B, Tk_local, H, D] (this shard)
    v: jnp.ndarray,                 # [B, Tk_local, H, D]
    axis_name: str,
    axis_size: int,
    key_bias: Optional[jnp.ndarray] = None,   # [B, Tk_local] additive
) -> jnp.ndarray:                   # [B, Tq_local, H, D]
    """Exact attention with K/V rotating around the ``axis_name`` ring."""
    scale = q.shape[-1] ** -0.5
    B, Tq, H, D = q.shape
    qf = q.astype(jnp.float32)

    # fresh constants are "unvarying" under shard_map's manual-axes (vma)
    # tracking, but the loop carry becomes varying over every mesh axis q
    # varies over (not just the ring axis — the enclosing shard_map may
    # also shard batch/heads over data/model axes).  Deriving the initial
    # stats arithmetically from the inputs gives them exactly the inputs'
    # vma on any mesh, which keeps the fori_loop carry type consistent.
    anchor = (qf * 0.0).sum()                    # scalar, varying like q
    m = jnp.full((B, H, Tq, 1), -jnp.inf, jnp.float32) + anchor  # run. max
    l = jnp.zeros((B, H, Tq, 1), jnp.float32) + anchor           # run. sum
    acc = jnp.zeros((B, H, Tq, D), jnp.float32) + anchor         # run. out

    if key_bias is None:
        key_bias = k[:, :, 0, 0].astype(jnp.float32) * 0.0  # vma of k

    perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]

    def body(i, carry):
        k_blk, v_blk, b_blk, m, l, acc = carry
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, k_blk.astype(jnp.float32))
        s = s * scale + b_blk[:, None, None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc = alpha * acc + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_blk.astype(jnp.float32))
        # rotate the K/V shard to the next device; after the final use
        # this returns every shard to its origin (one redundant hop —
        # simpler than a data-dependent skip and free to overlap)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        b_blk = jax.lax.ppermute(b_blk, axis_name, perm)
        return k_blk, v_blk, b_blk, m_new, l, acc

    _, _, _, m, l, acc = jax.lax.fori_loop(
        0, axis_size, body,
        (k, v, key_bias.astype(jnp.float32), m, l, acc))
    out = acc / l                                # [B, H, Tq, D]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
