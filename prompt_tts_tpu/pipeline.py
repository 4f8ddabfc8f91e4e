"""End-to-end synthesis: text -> phonemes -> DDIM denoising -> codec -> wav.

The reference never composes this chain (it has no sampler and no
inference entry point — SURVEY.md §3.4 note); here it is one object whose
device path (denoise loop + code decode) is a single jitted program.

Code normalization contract (reference tts/dataloader.py:64, 168-170):
model latents live in [-1, 1] via ``c * 2/1023 - 1``; synthesis inverts
with round + clip before codec decode.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from prompt_tts_tpu.codec import EncodecCodec
from prompt_tts_tpu.config import Config
from prompt_tts_tpu.diffusion import (ddim_sample, dpm_solver_sample,
                                      linear_schedule)
from prompt_tts_tpu.frontend.tokenizer import Tokenizer
from prompt_tts_tpu.models import TTSPromptSpeaker, TTSSingleSpeaker

SAMPLE_RATE = 24000


def codes_to_latents(codes: jnp.ndarray) -> jnp.ndarray:
    """int codes [B, n_q, T] -> model latents [B, T, n_q] in [-1, 1]."""
    x = codes.astype(jnp.float32) * (2.0 / 1023.0) - 1.0
    return x.transpose(0, 2, 1)


def latents_to_codes(latents: jnp.ndarray) -> jnp.ndarray:
    """model latents [B, T, n_q] -> int codes [B, n_q, T] in [0, 1023]."""
    c = jnp.round((latents + 1.0) * (1023.0 / 2.0))
    c = jnp.clip(c, 0, 1023).astype(jnp.int32)
    return c.transpose(0, 2, 1)


def wav_to_pcm16(wav: jnp.ndarray) -> jnp.ndarray:
    """float wav in [-1, 1] -> int16 PCM, on device.

    Bit-identical to ``utils.wav.pcm16_bytes`` (both are
    clip(round-half-to-even(x * 32767))), so a serving path can quantize
    on device and pull HALF the bytes — the served WAV is 16-bit anyway,
    making this lossless for the wire format."""
    return jnp.clip(jnp.round(wav * 32767.0),
                    -32768.0, 32767.0).astype(jnp.int16)


def codec_decode(codec, params, codes: jnp.ndarray) -> jnp.ndarray:
    """Decode dispatch: the f32 path uses the folded decoder tail
    (codec/folded.py — the lane-starved C=64/32 stages as block-banded
    matmuls in a space-to-depth layout; measured 11.7 ms vs 23.2 ms stock
    per batch-8 decode on v5e, numerics-equal to ~1e-6).
    PROMPT_TTS_FOLDED_DECODE=0 falls back to the stock layer-by-layer
    decoder; non-f32 codecs always use stock."""
    import os
    cfg = codec.config
    ra, rb = cfg.upsampling_ratios[-2:]
    foldable = (cfg.num_residual_layers == 1
                and cfg.residual_kernel_size - 1 < ra       # reflect slots
                and cfg.last_kernel_size - 1 < ra * rb)     # fit one group
    if (codec.dtype == jnp.float32 and foldable
            and os.environ.get("PROMPT_TTS_FOLDED_DECODE", "1") != "0"):
        from prompt_tts_tpu.codec.folded import decode_folded
        return decode_folded(codec, params, codes)
    return codec.apply(params, codes, method=EncodecCodec.decode)


class CodecRunner:
    """Codec-only encode/decode with jitted device programs.

    Used standalone by the decode_codec / generate_codes tools (no TTS
    model is built) and composed by :class:`Synthesizer`.
    """

    def __init__(self, codec_params=None):
        self.codec = EncodecCodec(dtype=jnp.float32)
        if codec_params is None:
            codec_params = jax.jit(
                lambda r: self.codec.init(r, jnp.zeros((1, 3200)), 6.0)
            )(jax.random.PRNGKey(1))
        self.codec_params = codec_params
        self._decode = jax.jit(
            lambda p, c: codec_decode(self.codec, p, c))
        self._encode = jax.jit(
            lambda p, w: self.codec.apply(p, w, 6.0,
                                          method=EncodecCodec.encode))

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """int codes [B, n_q, T] -> wav [B, T*320] float32 @ 24 kHz."""
        return np.asarray(self._decode(self.codec_params,
                                       jnp.asarray(codes)))

    def encode(self, wav: np.ndarray) -> np.ndarray:
        """wav [B, T] @ 24 kHz -> int codes [B, 8, ceil(T/320)] (6 kbps)."""
        return np.asarray(self._encode(self.codec_params, jnp.asarray(wav)))


class Synthesizer:
    """Owns model+codec params and the jitted text->wav program."""

    def __init__(
        self,
        config: Optional[Config] = None,
        model_params=None,
        codec_params=None,
        num_inference_steps: int = 50,
        guidance_scale: float = 1.0,
        sampler: str = "ddim",
        dtype=jnp.bfloat16,
        codec_dtype=jnp.float32,
        rng: Optional[jax.Array] = None,
        mesh=None,
    ):
        # mesh: an optional (data, model, seq) jax.sharding.Mesh for
        # sharded synthesis.  A non-trivial seq axis arms sequence-
        # parallel attention dispatch (parallel/sp.py — exact ring
        # attention for self-attn, GSPMD elsewhere) and shards x_T's
        # latent time, for longer-than-one-chip audio windows.  A
        # non-trivial model axis Megatron-shards the TTS model params
        # (parallel/tp.py rules) so the denoiser itself runs tensor-
        # parallel — the multi-chip batch-1 latency axis: each denoise
        # step's matmuls split over the model axis with GSPMD all-
        # reduces over ICI.  Codec params stay replicated (decode is
        # ~5% of synthesis).
        # sampler: "ddim" (50-step reference configuration) or "dpm"
        # (DPM-Solver++(2M): comparable quality at ~20-25 steps, ~2x
        # cheaper synthesis).
        if sampler not in ("ddim", "dpm"):
            raise ValueError(f"unknown sampler {sampler!r}")
        self.sampler = sampler
        # guidance_scale > 1 enables classifier-free guidance (the model
        # should have been trained with train.cond_dropout_prob > 0).
        # Supported for both model families: the unconditional branch is
        # null text (zero ids/mask) and, for the prompt-conditioned
        # model, additionally a null (zero-latent) prompt — matching the
        # joint conditioning dropout in train/step.py.
        self.guidance_scale = float(guidance_scale)
        self.mesh = mesh
        self._sp_mesh = None
        if mesh is not None:
            from prompt_tts_tpu.parallel.mesh import seq_size
            if seq_size(mesh) > 1:
                self._sp_mesh = mesh
        self.config = config or Config()
        mcfg = self.config.model
        self._prompted = mcfg.prompt_conditioning
        model_cls = TTSPromptSpeaker if self._prompted else TTSSingleSpeaker
        self.model = model_cls(mcfg, dtype=dtype)
        self._codec_runner = CodecRunner(codec_params)
        self.codec = self._codec_runner.codec
        # codec_dtype=bf16 is an OPTIONAL fast decode (~2x on the
        # bandwidth/MXU-bound SEANet pyramid) with a measured fidelity
        # cost: mel distance vs torch 0.209 (bf16) vs 1.7e-5 (f32) —
        # tools/mel_parity.py --codec_dtype bf16.  Decode is only ~5% of
        # the synthesis pipeline, so the default stays at the reference's
        # f32 fidelity point; params are shared f32 either way.
        self._codec_fast = (self.codec if codec_dtype == jnp.float32
                            else EncodecCodec(dtype=codec_dtype))
        self.schedule = linear_schedule(
            self.config.train.num_train_timesteps)
        self.tokenizer = Tokenizer(max_len=mcfg.cmu_seq_len)
        self.num_inference_steps = num_inference_steps
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        if model_params is None:
            ids = jnp.zeros((1, mcfg.cmu_seq_len), jnp.int32)
            init_args = (
                jnp.zeros((1, mcfg.sample_size, mcfg.in_channels)),
                jnp.zeros((1,), jnp.int32), ids, jnp.ones_like(ids))
            if self._prompted:
                init_args = init_args + (
                    jnp.zeros((1, mcfg.prompt_frames, mcfg.in_channels)),)
            with self._sp_scope():
                model_params = jax.jit(self.model.init)(rng, *init_args)
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            from prompt_tts_tpu.parallel.tp import shard_params
            model_params = shard_params(model_params, mesh)
        self.model_params = model_params
        self.codec_params = self._codec_runner.codec_params

        self._synth_fn = jax.jit(self._synthesize_device)
        # guards the lazily-built jitted programs (_synth_fn_pcm16,
        # _codes_fn, ...): concurrent server threads must never observe a
        # partially-initialized set or trace the same program twice
        # (duplicate compiles are minutes-scale through the TPU tunnel)
        import threading
        self._jit_lock = threading.Lock()

    def _sp_scope(self):
        """Context that arms ring-attention dispatch for THIS synthesizer's
        mesh only while its programs trace — scoped, so several
        Synthesizer/Trainer objects with different meshes in one process
        never leak arming into each other's (lazy) traces."""
        if self._sp_mesh is None:
            import contextlib
            return contextlib.nullcontext()
        from prompt_tts_tpu.parallel import sp
        return sp.sequence_parallel(self._sp_mesh)

    def _cross_kv(self, model_params, context):
        """Precompute the UNet's cross-attention k/v from the loop-invariant
        text context (~57 GFLOP of projections per step made explicit).

        Measured end-to-end NEUTRAL on v5e (522.7 ms vs 522.0 per
        batch-8 DDIM-50 synthesis): XLA's loop-invariant code motion
        already hoists these out of the ``lax.scan`` on its own.  Kept
        because it is bit-exact, makes the invariant explicit, and gives
        serving a reusable kv-cache API for repeated synthesis with the
        same text.  PROMPT_TTS_HOIST=0 disables it (A/B switch)."""
        import os
        if os.environ.get("PROMPT_TTS_HOIST", "1") == "0":
            return None
        from prompt_tts_tpu.models.unet1d import cross_attention_kv
        return cross_attention_kv(model_params["params"]["unet"], context,
                                  self.config.model, dtype=self.model.dtype)

    def _denoise_latents(self, model_params, x_T, ids, mask, prompt=None):
        # conditioning is loop-invariant: compute it ONCE, not per DDIM step
        if self._prompted and self.guidance_scale != 1.0:
            # classifier-free guidance, prompt-conditioned model: the
            # unconditional branch nulls BOTH conditions (zero text ids/
            # mask AND zero prompt latents), pairing with the joint
            # conditioning dropout used in training (train/step.py)
            context, speaker = self.model.apply(
                model_params, ids, mask, prompt,
                method=TTSPromptSpeaker.encode_conditioning)
            null_ctx, null_spk = self.model.apply(
                model_params, jnp.zeros_like(ids), jnp.zeros_like(mask),
                jnp.zeros_like(prompt),
                method=TTSPromptSpeaker.encode_conditioning)
            ctx2 = jnp.concatenate([context, null_ctx], axis=0)
            spk2 = jnp.concatenate([speaker, null_spk], axis=0)
            kv = self._cross_kv(model_params, ctx2)
            s = self.guidance_scale

            def denoise(x, t):
                eps2 = self.model.apply(
                    model_params, jnp.concatenate([x, x], axis=0),
                    jnp.concatenate([t, t], axis=0), ctx2, spk2,
                    cross_kv=kv, method=TTSPromptSpeaker.denoise)
                eps_c, eps_u = jnp.split(eps2, 2, axis=0)
                return eps_u + s * (eps_c - eps_u)
        elif self._prompted:
            context, speaker = self.model.apply(
                model_params, ids, mask, prompt,
                method=TTSPromptSpeaker.encode_conditioning)
            kv = self._cross_kv(model_params, context)

            def denoise(x, t):
                return self.model.apply(
                    model_params, x, t, context, speaker, cross_kv=kv,
                    method=TTSPromptSpeaker.denoise)
        elif self.guidance_scale != 1.0:
            # classifier-free guidance: batch the conditional and
            # unconditional (null-text) passes through one UNet call
            context = self.model.apply(model_params, ids, mask,
                                       method=TTSSingleSpeaker.encode_text)
            null_ctx = self.model.apply(
                model_params, jnp.zeros_like(ids), jnp.zeros_like(mask),
                method=TTSSingleSpeaker.encode_text)
            ctx2 = jnp.concatenate([context, null_ctx], axis=0)
            kv = self._cross_kv(model_params, ctx2)
            s = self.guidance_scale

            def denoise(x, t):
                eps2 = self.model.apply(
                    model_params, jnp.concatenate([x, x], axis=0),
                    jnp.concatenate([t, t], axis=0), ctx2, cross_kv=kv,
                    method=TTSSingleSpeaker.denoise)
                eps_c, eps_u = jnp.split(eps2, 2, axis=0)
                return eps_u + s * (eps_c - eps_u)
        else:
            context = self.model.apply(model_params, ids, mask,
                                       method=TTSSingleSpeaker.encode_text)
            kv = self._cross_kv(model_params, context)

            def denoise(x, t):
                return self.model.apply(model_params, x, t, context,
                                        cross_kv=kv,
                                        method=TTSSingleSpeaker.denoise)

        if self.sampler == "dpm":
            return dpm_solver_sample(
                denoise, self.schedule, x_T,
                num_inference_steps=self.num_inference_steps)
        return ddim_sample(
            denoise, self.schedule, x_T,
            num_inference_steps=self.num_inference_steps)

    def _synthesize_device(self, model_params, codec_params, x_T, ids, mask,
                           prompt=None):
        latents = self._denoise_latents(model_params, x_T, ids, mask, prompt)
        codes = latents_to_codes(latents)
        wav = codec_decode(self._codec_fast, codec_params, codes)
        return wav.astype(jnp.float32), codes

    def _synthesize_device_pcm16(self, model_params, codec_params, x_T,
                                 ids, mask, prompt=None):
        """Like ``_synthesize_device`` but the wav leaves the device as
        int16 PCM — half the host-transfer bytes, zero loss for a 16-bit
        wire format (see :func:`wav_to_pcm16`)."""
        wav, codes = self._synthesize_device(model_params, codec_params,
                                             x_T, ids, mask, prompt)
        return wav_to_pcm16(wav), codes

    def _codes_device(self, model_params, x_T, ids, mask, prompt=None):
        """Denoise to int codes only (no decode) — the streaming path."""
        return latents_to_codes(
            self._denoise_latents(model_params, x_T, ids, mask, prompt))

    def _get_synth_fn(self, pcm16: bool):
        """The jitted full-synthesis program (f32 wav, or device-quantized
        int16 PCM — one cached executable each; synthesize /
        synthesize_async / synthesize_long all share them)."""
        if not pcm16:
            return self._synth_fn
        if not hasattr(self, "_synth_fn_pcm16"):
            with self._jit_lock:
                if not hasattr(self, "_synth_fn_pcm16"):
                    self._synth_fn_pcm16 = jax.jit(
                        self._synthesize_device_pcm16)
        return self._synth_fn_pcm16

    def synthesize(
        self,
        texts: Sequence[str],
        seed: int = 0,
        return_codes: bool = False,
        prompt_wav: Optional[np.ndarray] = None,
        prompt_codes: Optional[np.ndarray] = None,
        pcm16: bool = False,
    ):
        """texts -> float32 wav ``[B, frames*320]`` at 24 kHz
        (int16 PCM with ``pcm16=True`` — quantized on device, half the
        host transfer, bit-identical to ``utils.wav.pcm16_bytes``).

        For a prompt-conditioned model, pass either ``prompt_wav``
        ``[B, Tsamples]`` @ 24 kHz (encoded on the fly) or ``prompt_codes``
        ``[B, n_q, Tp]`` int.
        """
        args = self._device_args(texts, seed, prompt_wav, prompt_codes)
        fn = self._get_synth_fn(pcm16)
        with self._sp_scope():
            wav, codes = fn(self.model_params, self.codec_params, *args)
        wav = np.asarray(wav)
        if return_codes:
            return wav, np.asarray(codes)
        return wav

    def synthesize_async(self, texts, seed: int = 0, prompt_wav=None,
                         prompt_codes=None, pcm16: bool = False):
        """Dispatch the device program; return the DEVICE wav (no host pull).

        JAX dispatch is asynchronous, so this returns as soon as the
        program is enqueued; ``np.asarray(result)`` performs the blocking
        host transfer.  A serving loop can therefore overlap batch k's
        host pull with batch k+1's device compute (cli/serve.py
        _Batcher does exactly that).

        ``pcm16=True`` quantizes to int16 ON DEVICE — half the transfer
        bytes and no host float->int16 pass, bit-identical to
        ``utils.wav.pcm16_bytes`` of the float result (the production
        serve path; lossless for 16-bit WAV responses).
        """
        args = self._device_args(texts, seed, prompt_wav, prompt_codes)
        fn = self._get_synth_fn(pcm16)
        with self._sp_scope():
            wav, _codes = fn(self.model_params, self.codec_params, *args)
        return wav

    def _device_args(self, texts, seed, prompt_wav=None, prompt_codes=None):
        """Tokenize + draw x_T (+ fixed-length prompt latents)."""
        mcfg = self.config.model
        ids, mask = self.tokenizer.encode_batch(list(texts))
        x_T = jax.random.normal(
            jax.random.PRNGKey(seed),
            (len(texts), mcfg.sample_size, mcfg.in_channels))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from prompt_tts_tpu.parallel.mesh import (DATA_AXIS, SEQ_AXIS,
                                                      seq_size)
            seq = SEQ_AXIS if (seq_size(self.mesh) > 1 and
                               mcfg.sample_size % seq_size(self.mesh) == 0
                               ) else None
            data = (DATA_AXIS if len(texts) % self.mesh.shape[DATA_AXIS]
                    == 0 else None)
            x_T = jax.device_put(
                x_T, NamedSharding(self.mesh, P(data, seq)))
        args = [x_T, jnp.asarray(ids), jnp.asarray(mask)]
        if self._prompted:
            if prompt_codes is None:
                if prompt_wav is None:
                    raise ValueError(
                        "prompt-conditioned model needs prompt_wav or "
                        "prompt_codes")
                prompt_codes = self._codec_runner.encode(prompt_wav)
            prompt = np.asarray(codes_to_latents(jnp.asarray(prompt_codes)))
            # pad/crop to the static prompt length
            Tp = mcfg.prompt_frames
            fixed = np.zeros((prompt.shape[0], Tp, prompt.shape[2]),
                             np.float32)
            fixed[:, : min(Tp, prompt.shape[1])] = prompt[:, :Tp]
            args.append(jnp.asarray(fixed))
        return args

    def synthesize_stream(
        self,
        texts: Sequence[str],
        seed: int = 0,
        chunk_frames: int = 300,
        prompt_wav: Optional[np.ndarray] = None,
        prompt_codes: Optional[np.ndarray] = None,
        pcm16: bool = False,
    ):
        """Yield float32 wav chunks ``[B, chunk*320]`` as they decode
        (int16 PCM chunks with ``pcm16=True`` — quantized on device, for
        streaming 16-bit WAV responses).

        First audio leaves after denoise + ONE chunk-prefix decode instead
        of the full 12 s window: the SEANet decoder is causal (causal
        reflect-pad convs, right-trimmed transposed convs — reference
        EnCodec 24 kHz, decode_codec.py:12-16), so decoding a code PREFIX
        equals the prefix of the full decode (bit-exact beyond ~30 frames;
        tests/test_pipeline.py::TestStreaming).  Each chunk re-decodes the
        grown prefix (n_chunks static programs; ~(n+1)/2x decode compute)
        — decode is ~5% of synthesis, so this trades a few percent of
        total work for a ~(n-1)/n cut in time-to-first-audio.
        """
        if not hasattr(self, "_decode_fn_pcm16"):
            # under the lock, and the hasattr-checked attribute is
            # assigned LAST, so a concurrent thread either waits here or
            # sees all three programs (a half-initialized set would raise
            # AttributeError on its request thread)
            with self._jit_lock:
                if not hasattr(self, "_decode_fn_pcm16"):
                    self._codes_fn = jax.jit(self._codes_device)
                    self._decode_fn = jax.jit(
                        lambda p, c: codec_decode(
                            self._codec_fast, p, c).astype(jnp.float32))
                    self._decode_fn_pcm16 = jax.jit(
                        lambda p, c: wav_to_pcm16(codec_decode(
                            self._codec_fast, p, c).astype(jnp.float32)))
        decode = self._decode_fn_pcm16 if pcm16 else self._decode_fn
        args = self._device_args(texts, seed, prompt_wav, prompt_codes)
        with self._sp_scope():
            codes = self._codes_fn(self.model_params, *args)
        T = codes.shape[-1]
        bounds = list(range(chunk_frames, T, chunk_frames)) + [T]
        prev = 0
        for end in bounds:
            wav = decode(self.codec_params, codes[:, :, :end])
            yield np.asarray(wav[:, prev * 320: end * 320])
            prev = end

    def split_long_text(self, text: str) -> list:
        """Split ``text`` into chunks whose token sequences fit the model.

        Sentences (split on ``.!?;`` + whitespace) are greedily packed up
        to ``cmu_seq_len`` tokens; a single overlong sentence is hard-split
        on word boundaries.  The reference trains on <=550-token
        utterances (train.py:164-165), so this is the faithful way to
        run longer passages through the fixed-shape model.
        """
        import re
        limit = self.config.model.cmu_seq_len
        sentences = [s for s in re.split(r"(?<=[.!?;])\s+", text.strip())
                     if s]

        def n_tokens(t: str) -> int:
            return len(self.tokenizer.ids(t))

        # hard-split any single sentence that alone exceeds the limit
        units: list = []
        for s in sentences:
            if n_tokens(s) <= limit:
                units.append(s)
                continue
            words = s.split()
            cur = ""
            for w in words:
                cand = (cur + " " + w).strip()
                if cur and n_tokens(cand) > limit:
                    units.append(cur)
                    cur = w
                else:
                    cur = cand
            if cur:
                units.append(cur)

        chunks: list = []
        cur = ""
        for u in units:
            cand = (cur + " " + u).strip()
            if cur and n_tokens(cand) > limit:
                chunks.append(cur)
                cur = u
            else:
                cur = cand
        if cur:
            chunks.append(cur)
        return chunks or [""]

    def _continuity_tail(self, codes: np.ndarray, wav_len: int):
        """Last ``prompt_frames`` SPOKEN code frames of a generated window
        — the natural continuity prompt for the next window (codes
        ``[n_q, T]``, ``wav_len`` = post-trim sample count)."""
        Tp = self.config.model.prompt_frames
        end = max(1, min(codes.shape[-1], -(-wav_len // 320)))
        return codes[None, :, max(0, end - Tp): end]

    def synthesize_long(
        self,
        text: str,
        seed: int = 0,
        max_batch: int = 8,
        trim_threshold_db: float = -40.0,
        prompt_wav: Optional[np.ndarray] = None,
        prompt_codes: Optional[np.ndarray] = None,
        pcm16: bool = False,
        pad_groups: bool = False,
        crossfade_ms: float = 0.0,
        continuity_prompt: bool = False,
    ) -> np.ndarray:
        """Long-form synthesis: split -> batch-synthesize -> trim -> join.

        Each chunk is synthesized in the model's fixed 12 s window;
        trailing silence past the spoken content is trimmed per chunk
        (``trim_threshold_db``; pass ``None`` to keep full windows) and
        the chunks are joined into one waveform.

        Seam quality (windows draw INDEPENDENT noise, so a hard
        concatenation steps discontinuously at every join):

        * ``crossfade_ms > 0`` overlap-adds adjacent windows with an
          equal-power crossfade (``utils.wav.crossfade_join``), removing
          the sample-level step at each seam.
        * ``continuity_prompt=True`` (prompt-conditioned family only)
          carries each window's trailing ``prompt_frames`` GENERATED code
          frames as the next window's prompt, so window k+1 is conditioned
          on how window k actually sounded — windows become sequential
          (batch-1; ``pad_groups`` still reuses the warmed batch
          executable) in exchange for cross-window speaker/style
          continuity.  The user prompt conditions the first window.

        ``pcm16=True`` returns device-quantized int16 PCM (the trim RMS is
        scale-invariant, so trimming behaves the same; the crossfade blends
        in float32 and re-quantizes).  ``pad_groups=True``
        pads EVERY partial group to ``max_batch`` — a server whose
        batch-``max_batch`` program is already compiled passes this so a
        short long-form request reuses that executable instead of
        compiling a fresh smaller-batch program (minutes through the TPU
        tunnel).
        """
        from prompt_tts_tpu.utils.wav import (crossfade_join,
                                              trim_trailing_silence)
        if continuity_prompt and not self._prompted:
            raise ValueError("continuity_prompt needs the prompt-"
                             "conditioned model family")
        chunks = self.split_long_text(text)
        pieces = []
        if continuity_prompt:
            # sequential: window k+1's prompt is window k's generated tail
            prev_tail = None
            for i, chunk in enumerate(chunks):
                group = [chunk]
                if pad_groups:
                    group = group + [""] * (max_batch - 1)
                if prev_tail is None:
                    rep = lambda a: (None if a is None else np.repeat(
                        np.asarray(a)[:1], len(group), 0))
                    kw = dict(prompt_wav=rep(prompt_wav),
                              prompt_codes=rep(prompt_codes))
                else:
                    kw = dict(prompt_codes=np.repeat(prev_tail,
                                                     len(group), 0))
                wavs, codes = self.synthesize(group, seed=seed + i,
                                              pcm16=pcm16,
                                              return_codes=True, **kw)
                wav = wavs[0]
                if trim_threshold_db is not None:
                    wav = trim_trailing_silence(
                        wav, threshold_db=trim_threshold_db)
                prev_tail = self._continuity_tail(codes[0], len(wav))
                pieces.append(wav)
        else:
            for i in range(0, len(chunks), max_batch):
                group = chunks[i:i + max_batch]
                # pad a trailing partial group up to max_batch (empty
                # texts, results sliced off) so it reuses the batch-size
                # program the full groups already compiled instead of
                # compiling a second device program — minutes-scale
                # through the TPU tunnel
                n_real = len(group)
                if ((pad_groups or len(chunks) > max_batch)
                        and n_real < max_batch):
                    group = group + [""] * (max_batch - n_real)
                kw = {}
                if self._prompted:
                    rep = lambda a: (None if a is None else np.repeat(
                        np.asarray(a)[:1], len(group), 0))
                    kw = dict(prompt_wav=rep(prompt_wav),
                              prompt_codes=rep(prompt_codes))
                wavs = self.synthesize(group, seed=seed + i, pcm16=pcm16,
                                       **kw)[:n_real]
                for wav in wavs:
                    if trim_threshold_db is not None:
                        wav = trim_trailing_silence(
                            wav, threshold_db=trim_threshold_db)
                    pieces.append(wav)
        if not pieces:
            return np.zeros(0, dtype=np.int16 if pcm16 else np.float32)
        if crossfade_ms > 0.0:
            return crossfade_join(pieces, int(crossfade_ms * 24))
        return np.concatenate(pieces)

    def synthesize_long_stream(
        self,
        text: str,
        seed: int = 0,
        trim_threshold_db: float = -40.0,
        prompt_wav: Optional[np.ndarray] = None,
        prompt_codes: Optional[np.ndarray] = None,
        pcm16: bool = False,
        crossfade_ms: float = 0.0,
        continuity_prompt: bool = False,
    ):
        """Yield one trimmed wav piece per 12-s window of a long text.

        The streaming long-form path: each text chunk is synthesized
        batch-1 and yielded as soon as its window decodes, so the first
        audio leaves after ONE window instead of the whole passage.
        Trimming needs the full window (trailing silence is only known
        once the window ends), so the granularity is per-window, not
        per-prefix — a server streams these with an unknown-length WAV
        header (``utils.wav.wav_header(None, ...)``) since the post-trim
        total is not known upfront.

        Seam options match :meth:`synthesize_long`: ``crossfade_ms > 0``
        equal-power-blends each seam by HOLDING BACK the overlap tail of
        every piece until the next window arrives (the concatenated
        stream is byte-identical to the non-streaming crossfaded wav
        whenever every trimmed window outlasts the fade — pcm16 windows
        shorter than the fade re-quantize their chained overlap);
        ``continuity_prompt=True`` (prompt-conditioned family) carries
        each window's generated tail codes as the next window's prompt —
        the streaming path is already sequential, so it costs nothing.

        Batch-1 window synthesis reuses the programs a streaming server
        already compiled (``synthesize_stream``'s codes + full-window
        decode executables).  Seeds fold the window index, so different
        windows draw different noise.
        """
        from prompt_tts_tpu.utils.wav import (crossfade_join,
                                              trim_trailing_silence)
        if continuity_prompt and not self._prompted:
            raise ValueError("continuity_prompt needs the prompt-"
                             "conditioned model family")
        T = self.config.model.sample_size
        n_fade = int(crossfade_ms * 24) if crossfade_ms > 0 else 0
        kw = {}
        if self._prompted:
            kw = dict(prompt_wav=prompt_wav, prompt_codes=prompt_codes)
        held = None  # the previous piece's held-back crossfade tail
        for i, chunk in enumerate(self.split_long_text(text)):
            if continuity_prompt:
                wavs, codes = self.synthesize([chunk], seed=seed + i,
                                              pcm16=pcm16,
                                              return_codes=True, **kw)
                wav = wavs[0]
            else:
                pieces = list(self.synthesize_stream(
                    [chunk], seed=seed + i, chunk_frames=T, pcm16=pcm16,
                    **kw))
                wav = np.concatenate(pieces, axis=1)[0]
            if trim_threshold_db is not None:
                wav = trim_trailing_silence(
                    wav, threshold_db=trim_threshold_db)
            if continuity_prompt:
                kw = dict(prompt_codes=self._continuity_tail(
                    codes[0], len(wav)))
            if n_fade > 0:
                if held is not None:
                    wav = crossfade_join([held, wav], n_fade)
                k = min(n_fade, len(wav))
                held, wav = wav[len(wav) - k:], wav[: len(wav) - k]
                if len(wav) == 0:
                    continue
            yield wav
        if held is not None and len(held):
            yield held

    def decode_codes(self, codes: np.ndarray) -> np.ndarray:
        """int codes [B, n_q, T] -> wav (the decode_codec tool path)."""
        return self._codec_runner.decode(codes)

    def encode_audio(self, wav: np.ndarray) -> np.ndarray:
        """wav [B, T] @24 kHz -> int codes [B, 8, ceil(T/320)] (6 kbps)."""
        return self._codec_runner.encode(wav)
