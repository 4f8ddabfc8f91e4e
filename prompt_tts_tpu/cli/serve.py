"""Batching TTS inference server: ``python -m prompt_tts_tpu.cli.serve``.

A serving surface the reference never had: HTTP POST /synthesize with
``{"text": "...", "seed": 0}`` (or a JSON list of texts) returns a WAV.
Requests are micro-batched up to ``--max_batch`` within ``--batch_window_ms``
so concurrent callers share one device program invocation — the jitted
program has a static batch size, so the server pads the batch and slices
the results.

Multi-speaker serving: start a prompt-conditioned model (config with
``prompt_conditioning: true``) with ``--speakers DIR`` — every ``*.wav``
in DIR is encoded ONCE at startup into fixed-length prompt codes and
registered under its filename stem; requests pick one with
``{"speaker": "name"}`` (default: first registered).  GET /speakers
lists them.

Stdlib-only (http.server + threading); model/codec params load the same
way as the synthesize CLI.
"""

import argparse
import io
import json
import logging
import queue
import threading
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TTS inference server.")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8777)
    p.add_argument("--ckpt_dir", type=str, default=None)
    p.add_argument("--codec_params", type=str, default=None)
    p.add_argument("--config_file", type=str, default=None)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--sampler", choices=("ddim", "dpm"), default="ddim",
                   help="dpm = DPM-Solver++(2M): ~20-25 steps suffice.")
    p.add_argument("--max_batch", type=int, default=8,
                   help="Static device batch size.")
    p.add_argument("--batch_window_ms", type=int, default=30,
                   help="How long to wait to fill a batch.")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--guidance_scale", type=float, default=1.0,
                   help="Classifier-free guidance scale (>1 needs a "
                        "model trained with cond_dropout_prob>0; "
                        "works for both model families).")
    p.add_argument("--speakers", type=str, default=None,
                   help="Directory of reference *.wav files for a "
                        "prompt-conditioned model; each is registered as "
                        "a speaker under its filename stem.")
    p.add_argument("--ema", action="store_true",
                   help="Serve the checkpoint's EMA params (requires "
                        "training with --ema_decay).")
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel serving: Megatron-shard the "
                        "denoiser over the mesh 'model' axis "
                        "(multi-chip latency).")
    p.add_argument("--sp", type=int, default=1,
                   help="Sequence-parallel serving: shard latent time "
                        "over the mesh 'seq' axis (ring attention).")
    return p.parse_args(argv)


class _Batcher:
    """Collects requests into fixed-size batches for the device program.

    Two-stage pipeline: the dispatcher thread builds batches and enqueues
    the device program WITHOUT blocking (Synthesizer.synthesize_async —
    JAX dispatch is async), the collector thread performs the blocking
    host transfer and fulfills request slots.  Batch k's ~9 MB audio pull
    therefore overlaps batch k+1's device compute instead of serializing
    with it (round-2 measured a ~31% serving RTF loss to host transfers).

    Note: one device invocation uses one PRNG seed, so requests batched
    together share the first request's ``seed`` for their noise draw
    (each still gets distinct noise — the draw is per batch element).
    """

    def __init__(self, synth, max_batch: int, window_s: float,
                 prompted: bool = False):
        self.synth = synth
        self.max_batch = max_batch
        self.window_s = window_s
        self.prompted = prompted
        self.q: "queue.Queue" = queue.Queue()
        # maxsize bounds device-queue depth (backpressure): at most 2
        # dispatched-but-unpulled batches in flight
        self.pending: "queue.Queue" = queue.Queue(maxsize=2)
        self.thread = threading.Thread(target=self._dispatch_loop,
                                       daemon=True)
        self.collector = threading.Thread(target=self._collect_loop,
                                          daemon=True)
        self.thread.start()
        self.collector.start()

    def submit(self, text: str, seed: int, prompt_codes=None):
        done = threading.Event()
        slot = {"done": done}
        self.q.put((text, seed, prompt_codes, slot))
        return slot

    def _dispatch_loop(self):
        import numpy as np
        while True:
            item = self.q.get()
            batch = [item]
            deadline = time.monotonic() + self.window_s
            while len(batch) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=timeout))
                except queue.Empty:
                    break
            texts = [b[0] for b in batch]
            # pad to the static batch size so one compiled program serves all
            padded = texts + [""] * (self.max_batch - len(texts))
            kw = {}
            if self.prompted:
                # per-request speaker prompts, zero-padded fill rows
                prompts = [b[2] for b in batch]
                fill = np.zeros_like(prompts[0])
                prompts = prompts + [fill] * (self.max_batch - len(prompts))
                kw["prompt_codes"] = np.stack(prompts)
            try:
                dev_wav = self.synth.synthesize_async(
                    padded, seed=batch[0][1], **kw)
                self.pending.put((batch, dev_wav))
            except Exception as e:  # noqa: BLE001 — report per request
                for b in batch:
                    s = b[3]
                    s["error"] = str(e)
                    s["done"].set()

    def _collect_loop(self):
        import numpy as np
        while True:
            batch, dev_wav = self.pending.get()
            try:
                wavs = np.asarray(dev_wav)       # blocking host transfer
                for i, b in enumerate(batch):
                    s = b[3]
                    s["wav"] = wavs[i]
                    s["done"].set()
            except Exception as e:  # noqa: BLE001
                for b in batch:
                    s = b[3]
                    s["error"] = str(e)
                    s["done"].set()


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from prompt_tts_tpu.config import Config
    from prompt_tts_tpu.pipeline import SAMPLE_RATE, Synthesizer
    from prompt_tts_tpu.utils.wav import write_wav

    config = Config.from_json(args.config_file) if args.config_file else None
    codec_params = None
    if args.codec_params:
        from prompt_tts_tpu.codec.io import load_codec_params
        codec_params = load_codec_params(args.codec_params)

    if args.ema and not args.ckpt_dir:
        raise SystemExit("--ema requires --ckpt_dir (EMA params live in "
                         "orbax checkpoints produced by train --ema_decay)")

    model_params = None
    if args.ckpt_dir:
        from prompt_tts_tpu.cli._common import restore_model_params
        cfg = config or Config()
        model_params, _ = restore_model_params(args.ckpt_dir, cfg,
                                               ema=args.ema)
        config = cfg

    mesh = None
    if args.tp > 1 or args.sp > 1:
        from prompt_tts_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_model=args.tp, n_seq=args.sp)
    synth = Synthesizer(config=config, model_params=model_params,
                        sampler=args.sampler,
                        codec_params=codec_params,
                        num_inference_steps=args.steps,
                        guidance_scale=args.guidance_scale,
                        mesh=mesh)

    # --- speaker registry (prompt-conditioned models) ---
    import numpy as np
    speakers: dict = {}
    if synth._prompted:
        if not args.speakers:
            raise SystemExit(
                "prompt-conditioned model requires --speakers DIR")
        import os
        from prompt_tts_tpu.utils.wav import read_wav
        from prompt_tts_tpu.utils.resample import resample
        tp = synth.config.model.prompt_frames
        n_q = synth.config.model.in_channels
        for name in sorted(os.listdir(args.speakers)):
            if not name.lower().endswith(".wav"):
                continue
            audio, sr = read_wav(os.path.join(args.speakers, name))
            if sr != SAMPLE_RATE:
                audio = resample(audio, sr, SAMPLE_RATE)
            codes = synth.encode_audio(
                np.asarray(audio[None, :, 0] if audio.ndim == 2
                           else audio[None]))[0]        # [n_q, F]
            # pad short references by REPEATING the last code frame: RVQ
            # index 0 is a real codebook entry (arbitrary audio content,
            # not silence), so zero-fill would inject garbage into the
            # prompt conditioning
            F = min(tp, codes.shape[1])
            if F == 0:
                raise SystemExit(f"speaker wav {name} is empty")
            fixed = np.repeat(codes[:, F - 1:F], tp, axis=1)
            fixed[:, :F] = codes[:, :F]
            speakers[os.path.splitext(name)[0]] = fixed
        if not speakers:
            raise SystemExit(f"no *.wav files in {args.speakers}")
        logging.info("registered %d speakers: %s", len(speakers),
                     ", ".join(speakers))
    elif args.speakers:
        raise SystemExit(
            "--speakers needs a prompt-conditioned model config")

    logging.info("warming up (compiling the device programs)...")
    if synth._prompted:
        first = next(iter(speakers.values()))
        synth.synthesize([""] * args.max_batch,
                         prompt_codes=np.stack([first] * args.max_batch))
        for _ in synth.synthesize_stream([""], prompt_codes=first[None]):
            pass                     # compile the streaming-path programs
    else:
        synth.synthesize([""] * args.max_batch)
        for _ in synth.synthesize_stream([""]):
            pass
    logging.info("ready")

    batcher = _Batcher(synth, args.max_batch, args.batch_window_ms / 1e3,
                       prompted=synth._prompted)
    # streaming requests bypass the batcher; bound their in-flight device
    # work like the batcher's pending queue bounds batched work
    stream_slots = threading.Semaphore(2)

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1: required for chunked transfer encoding (the streaming
        # path); non-streamed responses all carry Content-Length
        protocol_version = "HTTP/1.1"
        def do_POST(self):
            if self.path != "/synthesize":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                text = req["text"]
                seed = int(req.get("seed", 0))
                stream = bool(req.get("stream", False))
                chunk_frames = int(req.get("chunk_frames", 300))
                # quantize to T/8 multiples: every distinct prefix length
                # compiles a fresh device program (minutes through the
                # TPU tunnel), so client-chosen values must map onto a
                # BOUNDED shape set
                T = synth.config.model.sample_size
                q = max(1, -(-T // 8))          # ceil(T/8)
                chunk_frames = min(max(q * round(chunk_frames / q), q), T)
            except Exception as e:  # noqa: BLE001
                self.send_error(400, f"bad request: {e}")
                return
            prompt = None
            if speakers:
                name = req.get("speaker", next(iter(speakers)))
                if name not in speakers:
                    self.send_error(
                        400, f"unknown speaker {name!r}; see /speakers")
                    return
                prompt = speakers[name]
            if stream:
                self._stream_response(text, seed, prompt, chunk_frames)
                return
            slot = batcher.submit(text, seed, prompt)
            slot["done"].wait(timeout=600)
            if "error" in slot:
                self.send_error(500, slot["error"])
                return
            from prompt_tts_tpu.utils.wav import pcm16_bytes, wav_header
            data = (wav_header(len(slot["wav"]), SAMPLE_RATE)
                    + pcm16_bytes(slot["wav"]))
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _stream_response(self, text, seed, prompt, chunk_frames=300):
            """Chunked-transfer WAV: first audio bytes leave after ONE
            decoded chunk instead of the full 12 s window (the causal
            codec decoder makes prefix decode exact —
            pipeline.synthesize_stream).  Streaming requests bypass the
            batcher: time-to-first-byte is the point, not throughput."""
            from prompt_tts_tpu.utils.wav import pcm16_bytes, wav_header
            kw = {}
            if prompt is not None:
                kw["prompt_codes"] = prompt[None]
            n_total = synth.config.model.sample_size * 320
            with stream_slots:
                try:
                    gen = synth.synthesize_stream(
                        [text], seed=seed, chunk_frames=chunk_frames, **kw)
                    first = next(gen)             # denoise + first chunk
                except Exception as e:  # noqa: BLE001
                    self.send_error(500, str(e))
                    return
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def chunk(data: bytes):
                    self.wfile.write(f"{len(data):X}\r\n".encode())
                    self.wfile.write(data)
                    self.wfile.write(b"\r\n")
                    self.wfile.flush()

                chunk(wav_header(n_total, SAMPLE_RATE)
                      + pcm16_bytes(first[0]))
                for piece in gen:
                    chunk(pcm16_bytes(piece[0]))
                self.wfile.write(b"0\r\n\r\n")

        def do_GET(self):
            if self.path == "/healthz":
                body = b'{"status": "ok"}'
            elif self.path == "/speakers":
                body = json.dumps(sorted(speakers)).encode()
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *fmt_args):
            logging.info("%s " + fmt, self.address_string(), *fmt_args)

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    logging.info("serving on http://%s:%d", args.host, args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
