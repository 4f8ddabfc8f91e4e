"""Inference server test: start on CPU with a tiny config, hit the HTTP
surface (healthz, synthesize, concurrency, error paths)."""

import http.client
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

TINY_CONFIG = {
    "block_out_channels": [32, 64, 64, 64],
    "cross_attention_dim": 64,
    "attention_head_dim": 32,
    "text_encoder_layers": 1,
    "cmu_seq_len": 64,
    "sample_size": 40,
    "layers_per_block": 1,
    "unet_num_heads": 4,
}

PORT = 8791


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    cfg_path = tmp_path_factory.mktemp("serve") / "cfg.json"
    cfg_path.write_text(json.dumps(TINY_CONFIG))
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "prompt_tts_tpu.cli.serve",
         "--cpu", "--steps", "2", "--max_batch", "2",
         "--port", str(PORT), "--config_file", str(cfg_path),
         "--batch_window_ms", "50"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # wait for "ready" (compile takes a while on CPU)
    deadline = time.time() + 420
    ready = False
    lines = []
    while time.time() < deadline:
        line = proc.stdout.readline()
        lines.append(line)
        if "serving on" in line:
            ready = True
            break
        if proc.poll() is not None:
            break
    if not ready:
        proc.kill()
        pytest.fail("server did not become ready:\n" + "".join(lines[-20:]))
    yield proc
    proc.kill()
    proc.wait()


def _post(path, body, timeout=120):
    conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=timeout)
    conn.request("POST", path, body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


@pytest.mark.slow
class TestServer:
    def test_healthz(self, server):
        conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=30)
        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        assert resp.status == 200
        assert json.loads(resp.read())["status"] == "ok"
        conn.close()

    def test_synthesize_returns_wav(self, server):
        status, data = _post("/synthesize",
                             json.dumps({"text": "hello server"}))
        assert status == 200
        assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
        # tiny config: 40 frames * 320 samples * 2 bytes + header
        assert len(data) > 40 * 320 * 2

    def test_concurrent_requests_batched(self, server):
        results = {}

        def call(name, text):
            results[name] = _post("/synthesize",
                                  json.dumps({"text": text}))

        t1 = threading.Thread(target=call, args=("a", "first request"))
        t2 = threading.Thread(target=call, args=("b", "second request"))
        t1.start(); t2.start(); t1.join(120); t2.join(120)
        assert results["a"][0] == 200 and results["b"][0] == 200
        # different texts -> different audio payloads
        assert results["a"][1] != results["b"][1]

    def test_streaming_first_byte_before_full_body(self, server):
        """stream=true returns chunked WAV; chunked audio is bit-equal to
        a single-chunk stream of the same request (causal prefix decode
        == full decode), with first audio readable before completion."""
        def stream(chunk_frames):
            conn = http.client.HTTPConnection("127.0.0.1", PORT,
                                              timeout=120)
            t0 = time.time()
            conn.request(
                "POST", "/synthesize",
                body=json.dumps({"text": "hello server", "seed": 0,
                                 "stream": True,
                                 "chunk_frames": chunk_frames}),
                headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            assert resp.status == 200
            assert resp.getheader("Transfer-Encoding") == "chunked"
            # first chunk: header + chunk PCM16 (http.client returns as
            # soon as that chunk arrives, not when the stream completes)
            first = resp.read(44 + chunk_frames * 320 * 2)
            t_first = time.time() - t0
            rest = resp.read()
            t_full = time.time() - t0
            conn.close()
            return first + rest, t_first, t_full

        # 40-frame window, default chunk ceil(40/3)=14: chunk 8 snaps to
        # 14 (3 chunks {14,28,40}, all warmed); chunk 40 -> one chunk
        data, t_first, t_full = stream(8)
        ref, _, _ = stream(40)
        assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
        assert len(data) == 44 + 40 * 320 * 2
        assert data[:44] == ref[:44]
        # +-1 LSB: prefixes under ~30 frames sit in the codec's
        # small-input reflect fallback (production chunks are 300 frames,
        # where prefix decode is bit-exact — see synthesize_stream)
        a = np.frombuffer(data[44:], "<i2").astype(np.int32)
        b = np.frombuffer(ref[44:], "<i2").astype(np.int32)
        assert np.abs(a - b).max() <= 1
        assert t_first <= t_full

    def test_bad_json_400(self, server):
        status, _ = _post("/synthesize", "this is not json")
        assert status == 400

    def test_unknown_path_404(self, server):
        status, _ = _post("/nope", "{}")
        assert status == 404

    LONG_TEXT = ("The first sentence. A second one follows! "
                 "Then a third; and a fourth? Finally the fifth.")

    def test_long_text_request(self, server):
        """Texts past the model window route through synthesize_long
        (multiple trimmed windows in one exact-length response)."""
        import struct
        status, data = _post(
            "/synthesize", json.dumps({"text": self.LONG_TEXT}))
        assert status == 200
        assert data[:4] == b"RIFF"
        window_bytes = TINY_CONFIG["sample_size"] * 320 * 2
        assert len(data) - 44 > window_bytes      # more than one window
        # exact-length response: the data-chunk size matches the payload
        assert struct.unpack("<I", data[40:44])[0] == len(data) - 44

    def test_long_text_streaming(self, server):
        """Streamed long-form: unknown-length WAV header, > one window."""
        import struct
        status, data = _post(
            "/synthesize",
            json.dumps({"text": self.LONG_TEXT, "stream": True}))
        assert status == 200
        assert data[:4] == b"RIFF"
        # the post-trim total isn't known upfront -> 0xFFFFFFFF marker
        assert struct.unpack("<I", data[40:44])[0] == 0xFFFFFFFF
        window_bytes = TINY_CONFIG["sample_size"] * 320 * 2
        assert len(data) - 44 > window_bytes

    def test_stats_endpoint(self, server):
        # at least one request has been served by the earlier tests
        _post("/synthesize", json.dumps({"text": "stats probe"}))
        conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=30)
        conn.request("GET", "/stats")
        resp = conn.getresponse()
        assert resp.status == 200
        body = json.loads(resp.read())
        conn.close()
        assert body["requests"] >= 1
        assert body["errors"] == 0
        assert body["uptime_s"] > 0
        assert 0 < body["latency_s_p50"] <= body["latency_s_p90"]

    def test_sigterm_graceful_exit(self, server):
        """SIGTERM drains and exits 0 — must run LAST (kills the server)."""
        import signal
        server.send_signal(signal.SIGTERM)
        rc = server.wait(timeout=60)
        assert rc == 0


PORT3 = 8793


@pytest.fixture(scope="module")
def overload_server(tmp_path_factory):
    """A deliberately capacity-starved server: batch 1, queue bound 2 —
    admission control must 429 the overflow instead of queueing it."""
    cfg_path = tmp_path_factory.mktemp("serve_overload") / "cfg.json"
    cfg_path.write_text(json.dumps(TINY_CONFIG))
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "prompt_tts_tpu.cli.serve",
         "--cpu", "--steps", "2", "--max_batch", "1",
         "--port", str(PORT3), "--config_file", str(cfg_path),
         "--batch_window_ms", "10", "--max_queue", "2",
         "--stream_wait_s", "0.05"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    deadline = time.time() + 420
    ready = False
    lines = []
    while time.time() < deadline:
        line = proc.stdout.readline()
        lines.append(line)
        if "serving on" in line:
            ready = True
            break
        if proc.poll() is not None:
            break
    if not ready:
        proc.kill()
        pytest.fail("overload server did not become ready:\n"
                    + "".join(lines[-20:]))
    yield proc
    proc.kill()
    proc.wait()


@pytest.mark.slow
class TestOverload:
    def test_sustained_overload_bounded(self, overload_server):
        """24 simultaneous requests against capacity ~5: the overflow is
        rejected promptly with 429, admitted work completes with intact
        latency, and the queue never exceeds its bound."""
        results = []
        lock = threading.Lock()

        def call(i):
            try:
                status, data = _post_port(
                    "/synthesize",
                    json.dumps({"text": f"overload {i}"}), PORT3,
                    timeout=180)
            except Exception as e:  # noqa: BLE001
                status, data = -1, str(e).encode()
            with lock:
                results.append((status, data))

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(24)]
        t0 = time.time()
        for t in threads:
            t.start()
        # while the flood is in flight, the queue must stay bounded
        depth_seen = 0
        for _ in range(10):
            try:
                st, body = _get("/stats", PORT3, timeout=30)
                if st == 200:
                    depth_seen = max(depth_seen,
                                     json.loads(body)["queue_depth"])
            except Exception:  # noqa: BLE001 — server busy is fine
                pass
            time.sleep(0.05)
        for t in threads:
            t.join(180)
        elapsed = time.time() - t0

        statuses = [s for s, _ in results]
        assert len(statuses) == 24
        assert set(statuses) <= {200, 429}, statuses
        n_ok = statuses.count(200)
        n_rej = statuses.count(429)
        assert n_ok >= 1, "no request was admitted"
        assert n_rej >= 1, "overload produced no rejections"
        assert depth_seen <= 2, f"queue grew past its bound: {depth_seen}"
        # admitted responses are real WAVs
        for s, data in results:
            if s == 200:
                assert data[:4] == b"RIFF"
        # rejections are prompt, not 600-s slot timeouts
        assert elapsed < 120

        st, body = _get("/stats", PORT3, timeout=30)
        assert st == 200
        stats = json.loads(body)
        assert stats["rejected"] == n_rej
        assert stats["errors"] == 0
        # 429s stay OUT of the latency window: p50 reflects admitted work
        assert stats["latency_s_p50"] < 60

    def test_recovers_after_overload(self, overload_server):
        """Once the flood clears, a fresh request is served normally."""
        status, data = _post_port(
            "/synthesize", json.dumps({"text": "after the storm"}),
            PORT3, timeout=180)
        assert status == 200
        assert data[:4] == b"RIFF"


PROMPTED_CONFIG = dict(TINY_CONFIG, prompt_conditioning=True,
                       prompt_frames=8, prompt_encoder_layers=1,
                       prompt_tokens=4)

PORT2 = 8792


@pytest.fixture(scope="module")
def prompted_server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_prompted")
    cfg_path = root / "cfg.json"
    cfg_path.write_text(json.dumps(PROMPTED_CONFIG))
    spk_dir = root / "speakers"
    spk_dir.mkdir()
    from prompt_tts_tpu.utils.wav import write_wav
    rng = np.random.default_rng(0)
    for name in ("alice", "bob"):
        write_wav(str(spk_dir / f"{name}.wav"),
                  (0.1 * rng.standard_normal(4800)).astype(np.float32),
                  24000)
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "prompt_tts_tpu.cli.serve",
         "--cpu", "--steps", "2", "--max_batch", "2",
         "--port", str(PORT2), "--config_file", str(cfg_path),
         "--speakers", str(spk_dir), "--batch_window_ms", "50"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    deadline = time.time() + 420
    ready = False
    lines = []
    while time.time() < deadline:
        line = proc.stdout.readline()
        lines.append(line)
        if "serving on" in line:
            ready = True
            break
        if proc.poll() is not None:
            break
    if not ready:
        proc.kill()
        pytest.fail("prompted server did not become ready:\n"
                    + "".join(lines[-20:]))
    yield proc
    proc.kill()
    proc.wait()


def _get(path, port, timeout=30):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("GET", path)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def _post_port(path, body, port, timeout=180):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", path, body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


@pytest.mark.slow
class TestPromptedServer:
    def test_speakers_listed(self, prompted_server):
        status, data = _get("/speakers", PORT2)
        assert status == 200
        assert json.loads(data) == ["alice", "bob"]

    def test_synthesize_with_speaker(self, prompted_server):
        status, data = _post_port(
            "/synthesize",
            json.dumps({"text": "hello", "speaker": "bob"}), PORT2)
        assert status == 200
        assert data[:4] == b"RIFF"  # a WAV came back

    def test_unknown_speaker_rejected(self, prompted_server):
        status, _ = _post_port(
            "/synthesize",
            json.dumps({"text": "hello", "speaker": "nobody"}), PORT2)
        assert status == 400
