"""Batching TTS inference server: ``python -m prompt_tts_tpu.cli.serve``.

A serving surface the reference never had: HTTP POST /synthesize with
``{"text": "...", "seed": 0}`` returns a WAV (one utterance per request;
concurrent requests share a device batch).
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
    p.add_argument("--drain_s", type=float, default=600.0,
                   help="SIGTERM drain budget: wait up to this long for "
                        "in-flight requests (incl. streaming/long-form) "
                        "to complete before exiting.")
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
    p.add_argument("--max_queue", type=int, default=32,
                   help="Admission control: bound on queued batcher "
                        "requests; past it, POSTs are rejected with 429 "
                        "immediately instead of queueing (keeps overload "
                        "memory bounded and admitted-work latency "
                        "intact).")
    p.add_argument("--crossfade_ms", type=float, default=20.0,
                   help="Long-form seam treatment: equal-power crossfade "
                        "of this many milliseconds at every window join "
                        "(0 = hard concatenation; windows draw "
                        "independent noise, so hard joins step "
                        "discontinuously).")
    p.add_argument("--continuity_prompt", action="store_true",
                   help="Prompt-conditioned family: condition each "
                        "long-form window on the previous window's "
                        "generated tail codes (sequential windows, "
                        "cross-window speaker/style continuity). "
                        "Applies to prompted requests only.")
    p.add_argument("--stream_wait_s", type=float, default=30.0,
                   help="Admission control for streaming/long-form "
                        "requests (which bypass the batcher): max wait "
                        "for one of the two in-flight slots before "
                        "rejecting with 429.")
    return p.parse_args(argv)


class _Batcher:
    """Collects requests into fixed-size batches for the device program.

    Two-stage pipeline: the dispatcher thread builds batches and enqueues
    the device program WITHOUT blocking (Synthesizer.synthesize_async —
    JAX dispatch is async), the collector thread performs the blocking
    host transfer and fulfills request slots.  Batch k's audio pull
    therefore overlaps batch k+1's device compute instead of serializing
    with it (round-2 measured a ~31% serving RTF loss to host transfers);
    the pull itself is device-quantized int16 PCM (pcm16=True) — ~4.6 MB
    per batch-8 window instead of f32's ~9.2 MB, bit-identical to the
    16-bit WAV the response carries anyway.

    Note: one device invocation uses one PRNG seed, so requests batched
    together share the first request's ``seed`` for their noise draw
    (each still gets distinct noise — the draw is per batch element).
    """

    def __init__(self, synth, max_batch: int, window_s: float,
                 prompted: bool = False, max_queue: int = 32):
        self.synth = synth
        self.max_batch = max_batch
        self.window_s = window_s
        self.prompted = prompted
        # ADMISSION CONTROL: the request queue is bounded; submit()
        # returns None when it is full and the handler answers 429
        # immediately.  Under sustained overload, memory and worst-case
        # admitted latency therefore stay bounded by
        # max_queue + max_batch * (1 + pending depth) requests instead of
        # growing with the backlog while every caller waits out the
        # 600 s slot timeout.
        self.q: "queue.Queue" = queue.Queue(maxsize=max_queue)
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
        """Enqueue one request; returns its slot, or ``None`` when the
        bounded queue is full (the caller must reject with 429)."""
        done = threading.Event()
        slot = {"done": done}
        try:
            self.q.put_nowait((text, seed, prompt_codes, slot))
        except queue.Full:
            return None
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
                # pcm16=True: quantize to int16 ON DEVICE — half the host
                # pull and no host float->int16 pass; bit-identical to
                # pcm16_bytes of the float wav (the response is 16-bit
                # WAV either way)
                dev_wav = self.synth.synthesize_async(
                    padded, seed=batch[0][1], pcm16=True, **kw)
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
                # blocking host transfer of int16 PCM (half of f32)
                wavs = np.asarray(dev_wav).astype("<i2", copy=False)
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

    # Client chunk_frames snap onto MULTIPLES of the warmed default chunk:
    # every distinct prefix length is a separate compiled device program
    # (minutes through the TPU tunnel), and a chunk of k*c0 only decodes
    # prefixes {k*c0, 2k*c0, ...} ∪ {T} — a subset of the default chunk's
    # warmed set {c0, 2c0, ...} ∪ {T} — so NO client value can trigger a
    # request-path compile (the serving-design contract, ARCHITECTURE.md).
    T_frames = synth.config.model.sample_size
    default_chunk = min(max(1, -(-T_frames // 3)), T_frames)  # ceil(T/3)

    def quantize_chunk(frames: int) -> int:
        k = max(1, round(frames / default_chunk))
        return min(k * default_chunk, T_frames)

    logging.info("warming up (compiling the device programs)...")
    if synth._prompted:
        first = next(iter(speakers.values()))
        np.asarray(synth.synthesize_async(
            [""] * args.max_batch, pcm16=True,
            prompt_codes=np.stack([first] * args.max_batch)))
        for _ in synth.synthesize_stream([""], pcm16=True,
                                         chunk_frames=default_chunk,
                                         prompt_codes=first[None]):
            pass                     # compile the streaming-path programs
    else:
        np.asarray(synth.synthesize_async([""] * args.max_batch,
                                          pcm16=True))
        for _ in synth.synthesize_stream([""], pcm16=True,
                                         chunk_frames=default_chunk):
            pass
    logging.info("ready")

    batcher = _Batcher(synth, args.max_batch, args.batch_window_ms / 1e3,
                       prompted=synth._prompted, max_queue=args.max_queue)
    # streaming requests bypass the batcher; bound their in-flight device
    # work like the batcher's pending queue bounds batched work.  Their
    # admission control is the bounded acquire below: a streamer that
    # cannot get a slot within --stream_wait_s is rejected with 429
    # instead of queueing on the semaphore forever.
    stream_slots = threading.Semaphore(2)

    # --- serving stats (GET /stats): counters + a sliding latency window ---
    stats_lock = threading.Lock()
    stats = {"requests": 0, "errors": 0, "streamed": 0, "rejected": 0,
             "started": time.time()}
    lat_window: list = []               # last <=256 request latencies (s)
    inflight = [0]                      # POSTs being handled RIGHT NOW —
    # the SIGTERM drain waits on this, not just the batcher queues:
    # streaming/long-form requests bypass the batcher entirely, and the
    # collector pops the final batch from `pending` before its host pull
    # completes, so queue sizes alone under-count in-flight work

    def record(t0: float, error: bool = False, streamed: bool = False):
        dt = time.time() - t0
        with stats_lock:
            stats["requests"] += 1
            stats["errors"] += int(error)
            stats["streamed"] += int(streamed)
            lat_window.append(dt)
            if len(lat_window) > 256:
                del lat_window[: len(lat_window) - 256]

    def reject():
        # 429s are tracked separately from errors and kept OUT of the
        # latency window: they are the admission policy working, and
        # they must not drag p50/p90 for admitted work
        with stats_lock:
            stats["requests"] += 1
            stats["rejected"] += 1

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1: required for chunked transfer encoding (the streaming
        # path); non-streamed responses all carry Content-Length
        protocol_version = "HTTP/1.1"
        def do_POST(self):
            # count the WHOLE handling (response write included) so the
            # SIGTERM drain never kills a daemon handler thread mid-reply
            with stats_lock:
                inflight[0] += 1
            try:
                self._do_post()
            finally:
                with stats_lock:
                    inflight[0] -= 1

        def _do_post(self):
            if self.path != "/synthesize":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                text = req["text"]
                seed = int(req.get("seed", 0))
                stream = bool(req.get("stream", False))
                # quantized so client-chosen values map onto the bounded
                # shape set whose default the warmup already compiled
                chunk_frames = quantize_chunk(
                    int(req.get("chunk_frames", default_chunk)))
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
            t0 = time.time()
            # texts past the model's fixed window take the long-form path
            # (split -> per-window synthesis -> trim -> join); a single
            # window goes through the batcher / prefix-streaming as before
            if len(synth.split_long_text(text)) > 1:
                if stream:
                    self._stream_long_response(text, seed, prompt, t0)
                else:
                    self._long_response(text, seed, prompt, t0)
                return
            if stream:
                self._stream_response(text, seed, prompt, chunk_frames, t0)
                return
            slot = batcher.submit(text, seed, prompt)
            if slot is None:
                reject()
                self.send_error(429, "server overloaded: request queue "
                                     "is full, retry later")
                return
            slot["done"].wait(timeout=600)
            if "error" in slot:
                record(t0, error=True)
                self.send_error(500, slot["error"])
                return
            if "wav" not in slot:
                # wait() timed out with the slot unfulfilled (sustained
                # overload or a wedged chip): answer 503 instead of
                # raising KeyError into the handler thread
                record(t0, error=True)
                self.send_error(503, "synthesis timed out")
                return
            from prompt_tts_tpu.utils.wav import wav_header
            # slot["wav"] is already little-endian int16 (device-quantized)
            data = (wav_header(len(slot["wav"]), SAMPLE_RATE)
                    + slot["wav"].tobytes())
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            record(t0)

        def _long_response(self, text, seed, prompt, t0):
            """Long-form (multi-window) synthesis in one response.

            pad_groups=True keeps it on the batch-``max_batch`` pcm16
            executable the warmup already compiled (a fresh smaller-batch
            program would cost minutes through the TPU tunnel); like
            streaming, long requests bypass the batcher — they own whole
            device batches, so slotting them between other callers'
            requests would only add head-of-line blocking."""
            from prompt_tts_tpu.utils.wav import wav_header
            kw = {}
            if prompt is not None:
                kw["prompt_codes"] = prompt[None]
            if not stream_slots.acquire(timeout=args.stream_wait_s):
                reject()
                self.send_error(429, "server overloaded: long-form slots "
                                     "busy, retry later")
                return
            try:
                wav = synth.synthesize_long(
                    text, seed=seed, max_batch=args.max_batch,
                    pcm16=True, pad_groups=True,
                    crossfade_ms=args.crossfade_ms,
                    continuity_prompt=(args.continuity_prompt
                                       and prompt is not None), **kw)
            except Exception as e:  # noqa: BLE001
                record(t0, error=True)
                self.send_error(500, str(e))
                return
            finally:
                stream_slots.release()
            data = (wav_header(len(wav), SAMPLE_RATE)
                    + wav.astype("<i2", copy=False).tobytes())
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            record(t0)

        def _stream_long_response(self, text, seed, prompt, t0):
            """Chunked-transfer long-form WAV: one trimmed piece per
            12-s window, first audio after ONE window instead of the
            whole passage.  The post-trim total length isn't known
            upfront, so the header is the standard unknown-length
            streaming header (sizes 0xFFFFFFFF — read until close)."""
            from prompt_tts_tpu.utils.wav import wav_header
            kw = {}
            if prompt is not None:
                kw["prompt_codes"] = prompt[None]
            if not stream_slots.acquire(timeout=args.stream_wait_s):
                reject()
                self.send_error(429, "server overloaded: streaming slots "
                                     "busy, retry later")
                return
            try:
                try:
                    gen = synth.synthesize_long_stream(
                        text, seed=seed, pcm16=True,
                        crossfade_ms=args.crossfade_ms,
                        continuity_prompt=(args.continuity_prompt
                                           and prompt is not None), **kw)
                    first = next(gen)            # first window's audio
                except Exception as e:  # noqa: BLE001
                    record(t0, error=True, streamed=True)
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

                def pcm(piece):
                    return piece.astype("<i2", copy=False).tobytes()

                chunk(wav_header(None, SAMPLE_RATE) + pcm(first))
                for piece in gen:
                    chunk(pcm(piece))
                self.wfile.write(b"0\r\n\r\n")
                record(t0, streamed=True)
            finally:
                stream_slots.release()

        def _stream_response(self, text, seed, prompt, chunk_frames=300,
                             t0=None):
            """Chunked-transfer WAV: first audio bytes leave after ONE
            decoded chunk instead of the full 12 s window (the causal
            codec decoder makes prefix decode exact —
            pipeline.synthesize_stream).  Streaming requests bypass the
            batcher: time-to-first-byte is the point, not throughput."""
            from prompt_tts_tpu.utils.wav import wav_header
            kw = {}
            if prompt is not None:
                kw["prompt_codes"] = prompt[None]
            n_total = synth.config.model.sample_size * 320
            t0 = time.time() if t0 is None else t0
            if not stream_slots.acquire(timeout=args.stream_wait_s):
                reject()
                self.send_error(429, "server overloaded: streaming slots "
                                     "busy, retry later")
                return
            try:
                try:
                    # pcm16=True: chunks arrive device-quantized int16
                    gen = synth.synthesize_stream(
                        [text], seed=seed, chunk_frames=chunk_frames,
                        pcm16=True, **kw)
                    first = next(gen)             # denoise + first chunk
                except Exception as e:  # noqa: BLE001
                    record(t0, error=True, streamed=True)
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

                def pcm(piece):
                    return piece[0].astype("<i2", copy=False).tobytes()

                chunk(wav_header(n_total, SAMPLE_RATE) + pcm(first))
                for piece in gen:
                    chunk(pcm(piece))
                self.wfile.write(b"0\r\n\r\n")
                record(t0, streamed=True)
            finally:
                stream_slots.release()

        def do_GET(self):
            if self.path == "/healthz":
                body = b'{"status": "ok"}'
            elif self.path == "/speakers":
                body = json.dumps(sorted(speakers)).encode()
            elif self.path == "/stats":
                with stats_lock:
                    lat = sorted(lat_window)
                    body_obj = {
                        "requests": stats["requests"],
                        "errors": stats["errors"],
                        "streamed": stats["streamed"],
                        "rejected": stats["rejected"],
                        "uptime_s": round(time.time() - stats["started"], 1),
                        "queue_depth": batcher.q.qsize(),
                        "max_queue": args.max_queue,
                        "batches_in_flight": batcher.pending.qsize(),
                        "requests_in_flight": inflight[0],
                    }
                    if lat:
                        # same nearest-rank formula for both quantiles so
                        # p50 <= p90 holds at ANY window size (mixed
                        # upper-median/floor indexing inverts at n=2)
                        def pct(q):
                            return round(lat[int(q * (len(lat) - 1))], 4)
                        body_obj["latency_s_p50"] = pct(0.5)
                        body_obj["latency_s_p90"] = pct(0.9)
                body = json.dumps(body_obj).encode()
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

    class Server(ThreadingHTTPServer):
        # The listen backlog must comfortably exceed the admission bound:
        # with the stock backlog of 5, a burst of simultaneous connects
        # overflows the kernel accept queue and the dropped embryonic
        # connections surface as ECONNRESET on clients — overload must be
        # answered by the 429 admission policy above, never by kernel
        # connection drops (verified: a 24-way burst against backlog 5
        # reset 10 connections before any handler ran).
        request_queue_size = max(128, 4 * args.max_queue)

    server = Server((args.host, args.port), Handler)

    # graceful shutdown: SIGTERM stops accepting connections, drains the
    # batcher's queued + in-flight work, then exits 0 (the production
    # rollout contract — in-flight synthesis requests complete)
    import signal

    def _sigterm(signum, frame):
        logging.info("SIGTERM: draining and shutting down")
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _sigterm)

    logging.info("serving on http://%s:%d", args.host, args.port)
    try:
        server.serve_forever()
    finally:
        # drain EVERYTHING in flight: queued batches, the collector's
        # current host pull, and handler threads (streaming/long-form
        # requests never touch the batcher queues) — handler threads are
        # daemons, so returning from main would kill them mid-response
        deadline = time.monotonic() + args.drain_s

        def busy():
            with stats_lock:
                n = inflight[0]
            return n or batcher.q.qsize() or batcher.pending.qsize()

        while time.monotonic() < deadline and busy():
            time.sleep(0.05)
        server.server_close()
        logging.info("drained; exiting")


if __name__ == "__main__":
    main()
