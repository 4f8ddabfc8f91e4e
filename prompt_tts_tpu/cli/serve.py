"""Batching TTS inference server: ``python -m prompt_tts_tpu.cli.serve``.

A serving surface the reference never had: HTTP POST /synthesize with
``{"text": "...", "seed": 0}`` (or a JSON list of texts) returns a WAV.
Requests are micro-batched up to ``--max_batch`` within ``--batch_window_ms``
so concurrent callers share one device program invocation — the jitted
program has a static batch size, so the server pads the batch and slices
the results.

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
    return p.parse_args(argv)


class _Batcher:
    """Collects requests into fixed-size batches for the device program.

    Note: one device invocation uses one PRNG seed, so requests batched
    together share the first request's ``seed`` for their noise draw
    (each still gets distinct noise — the draw is per batch element).
    """

    def __init__(self, synth, max_batch: int, window_s: float):
        self.synth = synth
        self.max_batch = max_batch
        self.window_s = window_s
        self.q: "queue.Queue" = queue.Queue()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, text: str, seed: int):
        done = threading.Event()
        slot = {"done": done}
        self.q.put((text, seed, slot))
        return slot

    def _loop(self):
        while True:
            text, seed, slot = self.q.get()
            batch = [(text, seed, slot)]
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
            try:
                wavs = self.synth.synthesize(padded, seed=batch[0][1])
                for i, (_, _, s) in enumerate(batch):
                    s["wav"] = wavs[i]
                    s["done"].set()
            except Exception as e:  # noqa: BLE001 — report per request
                for _, _, s in batch:
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

    model_params = None
    if args.ckpt_dir:
        import jax.numpy as jnp
        from prompt_tts_tpu.models import TTSSingleSpeaker
        from prompt_tts_tpu.train.checkpoint import CheckpointManager
        from prompt_tts_tpu.train.state import create_train_state
        cfg = config or Config()
        model = TTSSingleSpeaker(cfg.model)
        ids = jnp.zeros((1, cfg.model.cmu_seq_len), jnp.int32)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.model.sample_size, cfg.model.in_channels)),
            jnp.zeros((1,), jnp.int32), ids, jnp.ones_like(ids))
        state = create_train_state(model, params, cfg.train, 1)
        state, step = CheckpointManager(args.ckpt_dir).restore(state)
        logging.info("restored checkpoint at step %d", step)
        model_params = state.params
        config = cfg

    synth = Synthesizer(config=config, model_params=model_params,
                        sampler=args.sampler,
                        codec_params=codec_params,
                        num_inference_steps=args.steps)
    logging.info("warming up (compiling the device program)...")
    synth.synthesize([""] * args.max_batch)
    logging.info("ready")

    batcher = _Batcher(synth, args.max_batch, args.batch_window_ms / 1e3)

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path != "/synthesize":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                text = req["text"]
                seed = int(req.get("seed", 0))
            except Exception as e:  # noqa: BLE001
                self.send_error(400, f"bad request: {e}")
                return
            slot = batcher.submit(text, seed)
            slot["done"].wait(timeout=600)
            if "error" in slot:
                self.send_error(500, slot["error"])
                return
            buf = io.BytesIO()
            # write wav into memory via a temp path-free encoder
            import tempfile, os
            with tempfile.NamedTemporaryFile(suffix=".wav",
                                             delete=False) as f:
                tmp = f.name
            write_wav(tmp, slot["wav"], SAMPLE_RATE)
            data = open(tmp, "rb").read()
            os.unlink(tmp)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/healthz":
                body = b'{"status": "ok"}'
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def log_message(self, fmt, *fmt_args):
            logging.info("%s " + fmt, self.address_string(), *fmt_args)

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    logging.info("serving on http://%s:%d", args.host, args.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
