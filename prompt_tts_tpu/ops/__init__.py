"""Compute ops: XLA reference implementations + Pallas TPU kernels.

The public entry points here are dispatchers: they pick the fused Pallas
kernel on TPU when the shape/dtype qualifies, and fall back to a plain XLA
formulation (which XLA fuses well on any backend, including the CPU test
mesh).
"""

from prompt_tts_tpu.ops.attention import scaled_dot_product_attention
from prompt_tts_tpu.ops.ring_attention import ring_attention

__all__ = ["scaled_dot_product_attention", "ring_attention"]
