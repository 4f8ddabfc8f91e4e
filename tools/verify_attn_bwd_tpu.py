"""Fused attention backward: NUMERICS verification on the real TPU.

tests/test_attention_bwd.py proves gradient equivalence under the Pallas
interpreter (CPU); this tool closes the remaining gap by running the same
comparison on the actual chip through Mosaic, at the flagship train
shapes. Two tiers:

- f32: the kernel recomputes the probabilities the primal computed, so
  gradients must match XLA autodiff to f32-reorder tolerance (~1e-5 rel).
- bf16 (the production train dtype): the kernel's f32-recomputed probs
  are marginally MORE accurate than autodiff's bf16-stored scores, so
  grads differ by O(bf16 eps) — we report the relative error and assert
  it stays in that class (< 0.05), far below gradient noise.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u tools/verify_attn_bwd_tpu.py
"""

import jax
import jax.numpy as jnp

from prompt_tts_tpu.ops.attention import _xla_attention
from prompt_tts_tpu.ops.pallas.attention_bwd import attention_fused_bwd

print("backend:", jax.default_backend(), flush=True)

# (label, B, Tq, Tk, H, D) — flagship sites (batch shrunk to keep the
# pulled grad tensors small; the kernel is batch-row-parallel so B does
# not change the numerics)
CASES = [
    ("self T=900 C=256 ", 4, 900, 900, 8, 32),
    ("self T=450 C=512 ", 4, 450, 450, 8, 64),
    ("cross T=900 S=550", 4, 900, 550, 8, 32),
    ("text  S=550 C=768", 4, 550, 550, 12, 64),
]


def grads(fn, q, k, v, bias, w):
    def loss(q, k, v):
        return jnp.sum(fn(q, k, v, bias).astype(jnp.float32) * w)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)


def rel_err(a, b):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-30))


failures = 0
for dtype, bound in ((jnp.float32, 2e-5), (jnp.bfloat16, 0.05)):
    for label, B, Tq, Tk, H, D in CASES:
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        q = jax.random.normal(ks[0], (B, Tq, H, D), dtype)
        k = jax.random.normal(ks[1], (B, Tk, H, D), dtype)
        v = jax.random.normal(ks[2], (B, Tk, H, D), dtype)
        mask = (jax.random.uniform(ks[3], (B, Tk)) > 0.1).astype(jnp.float32)
        mask = mask.at[:, 0].set(1.0)
        bias = jnp.where(mask > 0, 0.0, -1e4)[:, None, None, :]
        w = jax.random.normal(ks[4], (B, Tq, H, D), jnp.float32)

        ref = grads(_xla_attention, q, k, v, bias, w)
        got = grads(attention_fused_bwd, q, k, v, bias, w)
        errs = [rel_err(g, r) for g, r in zip(got, ref)]
        ok = all(e < bound for e in errs)
        failures += not ok
        print(f"{label} {jnp.dtype(dtype).name:8s} rel-err "
              f"dq={errs[0]:.2e} dk={errs[1]:.2e} dv={errs[2]:.2e} "
              f"bound={bound:g} {'OK' if ok else 'FAIL'}", flush=True)

print("RESULT:", "FAIL" if failures else "PASS", flush=True)
raise SystemExit(1 if failures else 0)
