"""prompt_tts_tpu — a TPU-native latent-diffusion text-to-speech framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
khaidoan25/prompt-tts (PyTorch/diffusers/accelerate/EnCodec):

* ``frontend``  — text normalization + CMU phonemization + static-shape
  tokenizer (reference: tts/process_text/, tts/get_cmu.py).
* ``diffusion`` — DDPM noise schedules, training objective, and DDIM/DDPM
  samplers as jit-able pure functions (reference: diffusers DDPMScheduler
  used at train.py:32-36; the sampler is absent from the reference and is
  built new here).
* ``models``    — text encoder + 1-D conditional UNet denoiser in Flax
  (reference: tts/models.py, tts/ldm/*).
* ``codec``     — EnCodec-compatible 24 kHz neural codec (SEANet encoder /
  RVQ / decoder) in JAX with a torch-weight converter (reference dependency:
  encodec package, used by data_preparation/generate_code.py and
  decode_codec.py).
* ``train``     — jitted SPMD train step over a jax.sharding.Mesh, optax
  optimizer chain, orbax checkpointing with restore (reference: train.py).
* ``data``      — corpus construction + host-side fixed-shape batch loader
  (reference: data_preparation/*, tts/dataloader.py).
* ``parallel``  — mesh/sharding policy (data/model axes) replacing the
  reference's accelerate/NCCL DDP (train.py:25-29).

Everything on the compute path is a pure function over pytrees, designed for
XLA: static shapes, lax control flow, bf16 matmul-friendly layouts
([batch, time, channels]), collectives over ICI via sharding annotations.
"""

__version__ = "0.1.0"
