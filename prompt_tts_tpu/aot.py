"""Ahead-of-time synthesis-program export (deployment artifacts).

The synthesis device program —
``(model_params, codec_params, x_T, text_ids, text_mask[, prompt_latents])
-> (pcm16|f32 wav, codes)`` — is a pure array function, and
:mod:`jax.export` can serialize it as a versioned, portable StableHLO
artifact.  A serving process then ``load_synthesis(path)``s the artifact
and calls it WITHOUT the model code, the checkpoint, or the config: the
weights travel inside the artifact as an args pytree (NOT baked into the
program as constants — baking changes XLA constant-folding numerics vs
the live jit, which takes params as arguments; shipping them as
arguments keeps the exported HLO identical to the live program and the
output bit-exact), and tokenization (the only host stage) ships with the
package as pure Python + the bundled CMU dictionary.

This is the TPU-native analog of the torch ecosystem's
``torch.jit.save``/ONNX deployment exports, which the reference leans on
implicitly through its dependencies (it has no inference entry point at
all — SURVEY.md §3.4 note); XLA recompiles the StableHLO for the target
at load time (pair with JAX's persistent compilation cache to amortize),
but tracing, Python model code, and weight plumbing are all gone from
the serving box.

Artifact layout (single file): ``b"PTTSAOT1"`` magic, a little-endian
u32 header length, a JSON header (format version 2: shapes,
sampler/steps/guidance, platforms, jax version, params-section sizes),
the model-params npz section, the codec-params npz section, then the
``jax.export`` blob.
"""

import io
import json
import struct
from typing import Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"PTTSAOT1"
_VERSION = 2
# nested-dict path separator for npz keys; ASCII unit separator never
# appears in flax module names
_SEP = "\x1f"


def _to_plain(tree):
    """Mappings -> plain nested dicts (stable pytree structure across
    export and load — flax FrozenDict and dict flatten identically by
    sorted key, but jax.export checks the in_tree exactly)."""
    if hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree


def _params_to_npz_bytes(tree) -> bytes:
    """Flatten a nested-dict param tree into one npz blob, keys joined
    with the unit separator.  ml_dtypes dtypes (bfloat16) round-trip
    through .npy because jax registers them with numpy."""
    flat = {}

    def walk(prefix, node):
        if hasattr(node, "items"):
            for k, v in node.items():
                walk(prefix + [str(k)], v)
        else:
            flat[_SEP.join(prefix)] = np.asarray(node)

    walk([], tree)
    buf = io.BytesIO()
    np.savez(buf, **flat)
    return buf.getvalue()


def _params_from_npz_bytes(blob: bytes):
    tree = {}
    with np.load(io.BytesIO(blob)) as z:
        for key in z.files:
            node = tree
            parts = key.split(_SEP)
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return tree


def export_synthesis(
    synth,
    batch_size: int,
    path: str,
    pcm16: bool = True,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Serialize ``synth``'s full synthesis program at ``batch_size``.

    ``synth``: a :class:`~prompt_tts_tpu.pipeline.Synthesizer`; its
    model+codec params ship inside the artifact as the program's first
    two (pytree) arguments, so the exported HLO is the live program's
    HLO and the reloaded output is bit-identical.
    ``pcm16``: export the device-quantized int16 program (the serving
    wire format) instead of float32 wav.  ``platforms``: lowering
    targets, e.g. ``["tpu"]`` or ``["tpu", "cpu"]``; ``None`` exports
    for the current default backend.  Returns the artifact header.
    """
    import jax
    import jax.export
    import jax.numpy as jnp

    if synth.mesh is not None:
        raise ValueError(
            "cannot export a mesh-sharded Synthesizer (tp/sp): the "
            "traced program contains collectives over a device mesh the "
            "loading process would have to reconstruct; export from an "
            "unsharded Synthesizer (the artifact is single-device)")

    mcfg = synth.config.model
    # plain nested dicts so the load-time reconstruction flattens to the
    # exact in_tree jax.export recorded
    mp = _to_plain(synth.model_params)
    cp = _to_plain(synth.codec_params)
    inner = (synth._synthesize_device_pcm16 if pcm16
             else synth._synthesize_device)

    if synth._prompted:
        def fn(model_params, codec_params, x_T, ids, mask, prompt):
            return inner(model_params, codec_params, x_T, ids, mask, prompt)
    else:
        def fn(model_params, codec_params, x_T, ids, mask):
            return inner(model_params, codec_params, x_T, ids, mask)

    def spec_of(a):
        a = jnp.asarray(a)
        return jax.ShapeDtypeStruct(a.shape, a.dtype)

    specs = [
        jax.tree_util.tree_map(spec_of, mp),
        jax.tree_util.tree_map(spec_of, cp),
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
    exported = jax.export.export(jax.jit(fn), **kw)(*specs)
    blob = exported.serialize()
    mp_bytes = _params_to_npz_bytes(mp)
    cp_bytes = _params_to_npz_bytes(cp)

    header = {
        "version": _VERSION,
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
        "model_params_nbytes": len(mp_bytes),
        "codec_params_nbytes": len(cp_bytes),
    }
    hdr = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        f.write(mp_bytes)
        f.write(cp_bytes)
        f.write(blob)
    return header


def _check_platform(header: dict):
    """Fail fast with an actionable message when the artifact was not
    lowered for the current backend (otherwise the mismatch surfaces as
    a low-level jax.export error at call time).  'axon' (the tunneled
    TPU plugin) and 'tpu' are treated as the same platform."""
    import jax

    backend = jax.default_backend()
    aliases = {backend}
    if backend in ("axon", "tpu"):
        aliases.update({"axon", "tpu"})
    if backend == "gpu":
        aliases.add("cuda")
    plats = set(header.get("platforms", []))
    if plats and not (plats & aliases):
        raise ValueError(
            f"artifact was exported for platforms {sorted(plats)} but the "
            f"current backend is {backend!r}; re-export with "
            f"--platforms {backend} (or a list including it)")


def load_synthesis(path: str) -> Tuple[object, dict]:
    """Load an artifact; returns ``(call, header)``.

    ``call(x_T, ids, mask[, prompt])`` runs the program on the current
    backend (which must be in ``header["platforms"]``); the shipped
    params are already bound.
    """
    import jax.export

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a ptts AOT artifact "
                             f"(magic {magic!r})")
        (hdr_len,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hdr_len).decode("utf-8"))
        if header.get("version") != _VERSION:
            raise ValueError(
                f"{path}: artifact format version "
                f"{header.get('version')!r} is not supported by this "
                f"build (expected {_VERSION}); re-export it with the "
                "current prompt_tts_tpu")
        _check_platform(header)
        mp = _params_from_npz_bytes(f.read(header["model_params_nbytes"]))
        cp = _params_from_npz_bytes(f.read(header["codec_params_nbytes"]))
        blob = f.read()
    exported = jax.export.deserialize(bytearray(blob))

    def call(*array_args):
        return exported.call(mp, cp, *array_args)

    return call, header


class SynthesisProgram:
    """Text -> wav over a loaded artifact: the deployment serving object.

    Reconstructs only the HOST stages around the device program — the
    package tokenizer (pure Python + bundled CMU dict), the seeded x_T
    draw, and the prompt pad/crop — mirroring
    ``Synthesizer._device_args``.  No model code, config, or checkpoint
    is touched.
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
        prompted artifact pass ``prompt_latents`` ``[B, T, in_channels]``
        for any T — padded/cropped to the artifact's static
        ``prompt_frames`` exactly like the live
        ``Synthesizer._device_args`` (see ``pipeline.codes_to_latents``).
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
            prompt = np.asarray(prompt_latents, np.float32)
            # pad/crop to the static prompt length (= live _device_args)
            Tp = h["prompt_frames"]
            fixed = np.zeros((prompt.shape[0], Tp, h["in_channels"]),
                             np.float32)
            fixed[:, : min(Tp, prompt.shape[1])] = prompt[:, :Tp]
            args.append(jnp.asarray(fixed))
        wav, codes = self.call(*args)
        wav = np.asarray(wav)
        if return_codes:
            return wav, np.asarray(codes)
        return wav
