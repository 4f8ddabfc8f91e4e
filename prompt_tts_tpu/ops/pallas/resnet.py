"""ARCHIVED EXPERIMENT — fused UNet resnet block kernel (Pallas).

NOT a production capability: no production path dispatches this kernel
(the measured result below is a negative one and the XLA formulation is
the shipped path).  It is kept, with its tests, as the documented
evidence behind ARCHITECTURE.md's kernel scoreboard entry; treat it as a
measurement artifact, not framework surface.

One grid cell per batch element runs the WHOLE ResnetBlock1D —
GN1 -> SiLU -> conv(k3) -> +temb -> GN2 -> SiLU -> conv(k3) -> +shortcut
— over the full [T, C] panel resident in VMEM: one read of x, one write
of the output, zero intermediate HBM round-trips.  The k3 convs are three
shifted [T,Cin]@[Cin,Cout] matmuls (shifts via in-VMEM rolls with edge
masking, matching torch's zero padding); GroupNorm statistics are f32
over the (T, C/G) slab exactly like torch semantics.

Inference-only (no dropout, no vjp) — the training path keeps the
unfused XLA formulation.  Numerics are the same bf16 class as the XLA
path (bf16 matmul inputs, f32 accumulation and norm statistics).

MEASURED AND NOT DISPATCHED (v5e, honest chained timing, batch 8):
wash at T=900/C=256 (41 vs 40 us) and T=450/C=512; a small win only at
the 900-level up-block concat shape (74 vs 81); 1.4-2.1x SLOWER at the
deep narrow-T levels (225/768: 107 vs 78; 113/768: 92 vs 44) where the
per-(b,) grid cells are too small to amortize kernel overhead.  XLA's
unfused resnet already sits near the traffic floor, so the production
path stays XLA; the kernel remains as a tested, documented negative
result (the third such finding this round — standalone/hand-fused wins
do not transfer at this model's sizes).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_norm(x, scale, bias, groups: int, eps: float):
    """torch GroupNorm over a [T, C] panel: stats per group over (T, C/G).

    Mosaic cannot lower a lane-splitting reshape ([T, C] -> [T, G, C/G]),
    so group sums are computed with a 0/1 group-membership matmul and the
    variance via E[x^2] - E[x]^2 (identical in exact arithmetic; f32
    difference is ~1e-6 on O(1) activations, within the bf16 class).
    """
    T, C = x.shape
    n = T * (C // groups)
    xf = x.astype(jnp.float32)
    cg = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 0) // (C // groups)
    gg = jax.lax.broadcasted_iota(jnp.int32, (C, groups), 1)
    member = (cg == gg).astype(jnp.float32)          # [C, G]
    s1 = jnp.dot(jnp.sum(xf, axis=0, keepdims=True), member)       # [1, G]
    s2 = jnp.dot(jnp.sum(xf * xf, axis=0, keepdims=True), member)
    mean_g = s1 / n
    inv_g = jax.lax.rsqrt(jnp.maximum(s2 / n - mean_g ** 2, 0.0) + eps)
    mean_c = jnp.dot(mean_g, member.T)               # [1, C] per channel
    inv_c = jnp.dot(inv_g, member.T)
    xn = (xf - mean_c) * inv_c
    return xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _conv3(h, w, b):
    """k3 'same' conv over [T, Cin] as three shifted matmuls (+bias).

    ``w`` is [3, Cin, Cout]; shifts use zero edges (torch pad=1).
    """
    T = h.shape[0]
    dt = h.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    # h shifted DOWN by one (h[t-1] at row t), zero first row
    hm = jnp.where(rows > 0, pltpu.roll(h, shift=1, axis=0), 0).astype(dt)
    # h shifted UP by one (h[t+1] at row t), zero last row
    # (pltpu.roll requires a non-negative shift: roll by T-1 == -1)
    hp = jnp.where(rows < T - 1, pltpu.roll(h, shift=T - 1, axis=0),
                   0).astype(dt)
    acc = jnp.dot(hm, w[0], preferred_element_type=jnp.float32)
    acc += jnp.dot(h, w[1], preferred_element_type=jnp.float32)
    acc += jnp.dot(hp, w[2], preferred_element_type=jnp.float32)
    return acc + b.astype(jnp.float32)


def _resnet_kernel(x_ref, temb_ref, g1s_ref, g1b_ref, w1_ref, b1_ref,
                   g2s_ref, g2b_ref, w2_ref, b2_ref, ws_ref, bs_ref,
                   o_ref, *, groups: int, eps: float, has_shortcut: bool):
    x = x_ref[0]                                  # [T, Cin]
    dt = x.dtype

    h = _group_norm(x, g1s_ref[0], g1b_ref[0], groups, eps)
    h = jax.nn.silu(h).astype(dt)
    h = _conv3(h, w1_ref[:], b1_ref[0])           # [T, Cout] f32
    # temb rides as the full [B, Cout] panel (a (1, C) block of it would
    # violate Mosaic's second-minor-divisible-by-8 rule)
    h = h + temb_ref[pl.program_id(0)].astype(jnp.float32)

    h = _group_norm(h.astype(dt), g2s_ref[0], g2b_ref[0], groups, eps)
    h = jax.nn.silu(h).astype(dt)
    h = _conv3(h, w2_ref[:], b2_ref[0])           # [T, Cout] f32

    if has_shortcut:
        s = jnp.dot(x, ws_ref[0], preferred_element_type=jnp.float32)
        s = s + bs_ref[0].astype(jnp.float32)
    else:
        s = x.astype(jnp.float32)
    o_ref[0] = (s + h).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps"))
def fused_resnet_block(x, temb_proj, gn1_scale, gn1_bias, conv1_w, conv1_b,
                       gn2_scale, gn2_bias, conv2_w, conv2_b,
                       shortcut_w=None, shortcut_b=None,
                       groups: int = 32, eps: float = 1e-5):
    """Run the fused resnet block.

    Args:
      x: ``[B, T, Cin]`` (bf16 or f32).
      temb_proj: ``[B, Cout]`` — the already-projected time embedding
        (``silu(temb) @ W + b``, computed outside; it is tiny).
      conv*_w: ``[3, C, C']`` flax conv kernels; gn*_scale/bias ``[C]``.
      shortcut_w/b: ``[Cin, Cout]`` 1x1 shortcut (None when Cin == Cout).
    Returns:
      ``[B, T, Cout]`` in ``x.dtype``.
    """
    B, T, Cin = x.shape
    Cout = conv1_w.shape[-1]
    has_shortcut = shortcut_w is not None
    if not has_shortcut:
        shortcut_w = jnp.zeros((Cin, Cout), x.dtype)
        shortcut_b = jnp.zeros((Cout,), x.dtype)
    dt = x.dtype

    def vec(a):  # [C] params ride as [1, C] blocks
        return a.astype(dt)[None, :]

    out = pl.pallas_call(
        functools.partial(_resnet_kernel, groups=groups, eps=eps,
                          has_shortcut=has_shortcut),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, Cin), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Cout), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cin), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cin), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Cin, Cout), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Cout, Cout), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cin, Cout), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, Cout), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, Cout), dt),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * 3 * Cin * Cout + 2 * B * T * 3 * Cout * Cout,
            bytes_accessed=(x.size + B * T * Cout) * x.dtype.itemsize,
            transcendentals=2 * B * T * max(Cin, Cout),
        ),
    )(x, temb_proj.astype(dt), vec(gn1_scale), vec(gn1_bias),
      conv1_w.astype(dt), vec(conv1_b), vec(gn2_scale), vec(gn2_bias),
      conv2_w.astype(dt), vec(conv2_b),
      shortcut_w.astype(dt)[None], vec(shortcut_b))
    return out
