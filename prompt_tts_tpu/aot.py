"""Ahead-of-time synthesis-program export (deployment artifacts).

Once the params are baked in, the synthesis device program —
``(x_T, text_ids, text_mask[, prompt_latents]) -> (pcm16|f32 wav, codes)``
— is a pure array function, and :mod:`jax.export` can serialize it as a
versioned, portable StableHLO artifact.  A serving process then
``load_synthesis(path)``s the artifact and calls it WITHOUT the model
code, the checkpoint, or the config: the weights travel inside the
artifact as constants, and tokenization (the only host stage) ships with
the package as pure Python + the bundled CMU dictionary.

This is the TPU-native analog of the torch ecosystem's
``torch.jit.save``/ONNX deployment exports, which the reference leans on
implicitly through its dependencies (it has no inference entry point at
all — SURVEY.md §3.4 note); XLA recompiles the StableHLO for the target
at load time (pair with JAX's persistent compilation cache to amortize),
but tracing, Python model code, and weight plumbing are all gone from
the serving box.

Artifact layout (single file): ``b"PTTSAOT1"`` magic, a little-endian
u32 header length, a JSON header (shapes, sampler/steps/guidance,
platforms, jax version), then the ``jax.export`` blob.
"""

import json
import struct
from typing import Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"PTTSAOT1"


def export_synthesis(
    synth,
    batch_size: int,
    path: str,
    pcm16: bool = True,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Serialize ``synth``'s full synthesis program at ``batch_size``.

    ``synth``: a :class:`~prompt_tts_tpu.pipeline.Synthesizer` (its
    model+codec params are baked into the artifact as constants).
    ``pcm16``: export the device-quantized int16 program (the serving
    wire format) instead of float32 wav.  ``platforms``: lowering
    targets, e.g. ``["tpu"]`` or ``["tpu", "cpu"]``; ``None`` exports
    for the current default backend.  Returns the artifact header.
    """
    import jax
    import jax.export
    import jax.numpy as jnp

    mcfg = synth.config.model
    mp, cp = synth.model_params, synth.codec_params
    inner = (synth._synthesize_device_pcm16 if pcm16
             else synth._synthesize_device)

    if synth._prompted:
        def fn(x_T, ids, mask, prompt):
            return inner(mp, cp, x_T, ids, mask, prompt)
    else:
        def fn(x_T, ids, mask):
            return inner(mp, cp, x_T, ids, mask)

    specs = [
        jax.ShapeDtypeStruct(
            (batch_size, mcfg.sample_size, mcfg.in_channels), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, mcfg.cmu_seq_len), jnp.int32),
        jax.ShapeDtypeStruct((batch_size, mcfg.cmu_seq_len), jnp.int32),
    ]
    if synth._prompted:
        specs.append(jax.ShapeDtypeStruct(
            (batch_size, mcfg.prompt_frames, mcfg.in_channels),
            jnp.float32))

    kw = {"platforms": list(platforms)} if platforms else {}
    with synth._sp_scope():
        exported = jax.export.export(jax.jit(fn), **kw)(*specs)
    blob = exported.serialize()

    header = {
        "version": 1,
        "batch_size": batch_size,
        "pcm16": bool(pcm16),
        "prompted": bool(synth._prompted),
        "sampler": synth.sampler,
        "num_inference_steps": synth.num_inference_steps,
        "guidance_scale": synth.guidance_scale,
        "sample_rate": 24000,
        "sample_size": mcfg.sample_size,
        "in_channels": mcfg.in_channels,
        "cmu_seq_len": mcfg.cmu_seq_len,
        "prompt_frames": mcfg.prompt_frames if synth._prompted else 0,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    hdr = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        f.write(blob)
    return header


def load_synthesis(path: str) -> Tuple[object, dict]:
    """Load an artifact; returns ``(call, header)``.

    ``call(x_T, ids, mask[, prompt])`` runs the program on the current
    backend (which must be in ``header["platforms"]``).
    """
    import jax.export

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a ptts AOT artifact "
                             f"(magic {magic!r})")
        (hdr_len,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hdr_len).decode("utf-8"))
        blob = f.read()
    exported = jax.export.deserialize(bytearray(blob))
    return exported.call, header


class SynthesisProgram:
    """Text -> wav over a loaded artifact: the deployment serving object.

    Reconstructs only the HOST stages around the device program — the
    package tokenizer (pure Python + bundled CMU dict) and the seeded
    x_T draw — mirroring ``Synthesizer._device_args``.  No model code,
    config, or checkpoint is touched.
    """

    def __init__(self, path: str):
        self.call, self.header = load_synthesis(path)
        from prompt_tts_tpu.frontend.tokenizer import Tokenizer
        self.tokenizer = Tokenizer(max_len=self.header["cmu_seq_len"])

    @property
    def batch_size(self) -> int:
        return self.header["batch_size"]

    def synthesize(self, texts: Sequence[str], seed: int = 0,
                   prompt_latents: Optional[np.ndarray] = None,
                   return_codes: bool = False):
        """texts (exactly ``batch_size`` of them; pad with "") -> wav.

        int16 PCM or float32 per the artifact's ``pcm16`` flag.  For a
        prompted artifact pass ``prompt_latents``
        ``[B, prompt_frames, in_channels]`` (see
        ``pipeline.codes_to_latents``).
        """
        import jax
        import jax.numpy as jnp

        h = self.header
        if len(texts) != h["batch_size"]:
            raise ValueError(
                f"artifact is batch-{h['batch_size']}; got {len(texts)} "
                "texts (pad with empty strings)")
        ids, mask = self.tokenizer.encode_batch(list(texts))
        x_T = jax.random.normal(
            jax.random.PRNGKey(seed),
            (h["batch_size"], h["sample_size"], h["in_channels"]))
        args = [x_T, jnp.asarray(ids), jnp.asarray(mask)]
        if h["prompted"]:
            if prompt_latents is None:
                raise ValueError("prompted artifact needs prompt_latents")
            args.append(jnp.asarray(prompt_latents, jnp.float32))
        wav, codes = self.call(*args)
        wav = np.asarray(wav)
        if return_codes:
            return wav, np.asarray(codes)
        return wav
