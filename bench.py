"""Headline benchmark: end-to-end text->speech RTF on one chip.

Prints ONE JSON line:
  {"metric": "rtf_text_to_wav", "value": N, "unit": "x_realtime",
   "vs_baseline": N}

Measures the BASELINE.json north-star config: batch-8, 50-step DDIM over
[8, 900, 8] code latents with the flagship 245M-param denoiser (bf16) and
EnCodec decode to 24 kHz audio, all in ONE jitted device program
(prompt_tts_tpu.pipeline.Synthesizer).  96 s of audio per batch.
``vs_baseline`` is value / 50 — the >=50x real-time-per-chip target
(BASELINE.md; the reference itself publishes no benchmark numbers).

Timing methodology (round 2, frozen — validated against a matmul chain
hitting ~96% of v5e bf16 peak):
  * value / rtf_device_program — K synthesis programs CHAINED inside one
    jitted scan (each x_T depends on the previous wav, so nothing can be
    hoisted or cached), final scalar pulled to the host; per-iteration
    time is the (2K-chain - K-chain) difference, which cancels the fixed
    dispatch+read floor exactly.  Through this dev setup's axon relay,
    ``block_until_ready`` returns WITHOUT waiting and repeated identical
    calls can be served from a cache, so the round-1 per-call timings
    were unreliable; the chained-difference number is the device-program
    throughput and is comparable across rounds.
  * rtf_with_host_transfers — every call pulls the audio batch to the
    host the way production serving does: device-side int16 quantization,
    4.6 MB pcm16 pull (cli/serve.py's wire format; r4 pulled f32 — 9.2 MB
    the server never transfers).  The JSON carries a per-call
    decomposition (dispatch / pull / chained device time / residual
    overhead, median across the 5 calls) PLUS three compute-free probes
    that attribute the overhead term: a scalar pull (the pure per-call
    relay floor), a 9.2 MB f32 pull and a 4.6 MB pcm16 pull (the
    bandwidth slope).  r4 measured the overhead at 291.6 ms/call —
    an order of magnitude above the "~25-30 ms RPC floor" earlier docs
    assumed; the probes exist so that term is attributed on sight:
    device_ms moved = real regression; probe floor moved = relay;
    bandwidth slope moved = transfer path.
"""

import json
import time

BATCH = 8
STEPS = 50
AUDIO_SECONDS_PER_ITEM = 12.0  # 900 frames @ 75 Hz
TARGET_RTF = 50.0

TEXTS = [
    "Printing, in the only sense with which we are at present concerned.",
    "The quick brown fox jumps over the lazy dog near the river bank.",
    "In being comparatively modern, the art of printing differs from most.",
    "The invention of movable metal letters in the fifteenth century.",
    "May justly be considered as the invention of the art of printing.",
    "Speech synthesis has advanced rapidly in the last decade of research.",
    "Neural codecs compress audio into discrete tokens at low bitrates.",
    "Latent diffusion models denoise those tokens conditioned on text.",
]


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from prompt_tts_tpu.pipeline import Synthesizer

    synth = Synthesizer(num_inference_steps=STEPS)

    ids, mask = synth.tokenizer.encode_batch(TEXTS)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    x_T = jax.random.normal(
        jax.random.PRNGKey(0),
        (BATCH, synth.config.model.sample_size,
         synth.config.model.in_channels))

    # one full host round-trip validates the output
    wav, codes = synth._synth_fn(synth.model_params, synth.codec_params,
                                 x_T, ids, mask)
    host_wav = np.asarray(wav)
    assert host_wav.shape == (BATCH, 288000), host_wav.shape
    assert np.isfinite(host_wav).all()

    # --- device-program RTF: chained-scan difference timing ---
    def chain(iters):
        def run(mp, cp, x0, ids_, mask_):
            def body(c, _):
                # EVERY input must depend on the carry or XLA hoists the
                # consuming subgraph out of the chain (CLAUDE.md timing
                # rule).  ``z`` is a runtime zero (c ~ 1.0, so c*1e-38
                # truncates to int 0) that makes ids/mask — and therefore
                # the text encoder + cross-attention KV projections —
                # carry-dependent, so per-call conditioning cost is
                # included in the difference, not amortized away.
                z = (c * 1e-38).astype(jnp.int32)
                w, _codes = synth._synthesize_device(
                    mp, cp, x0 * c, ids_ + z, mask_ + z)
                return 1.0 + jnp.mean(w).astype(jnp.float32) * 1e-20, None

            c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
            return c

        fn = jax.jit(run)
        float(fn(synth.model_params, synth.codec_params, x_T, ids, mask))
        best = float("inf")
        for trial in range(3):
            # perturb one input per trial: repeated byte-identical
            # executions through the axon relay can be served from a
            # cache (CLAUDE.md), which would collapse min-of-3 to the
            # RPC floor
            x0 = x_T * (1.0 + 1e-6 * (trial + 1))
            t0 = time.perf_counter()
            float(fn(synth.model_params, synth.codec_params, x0, ids,
                     mask))
            best = min(best, time.perf_counter() - t0)
        return best

    K = 2
    t1 = chain(K)
    t2 = chain(2 * K)
    per_iter = (t2 - t1) / K

    audio_seconds = BATCH * AUDIO_SECONDS_PER_ITEM
    rtf = audio_seconds / per_iter

    # --- serving-style RTF: per-call with the PRODUCTION host pull ---
    # Per-call DECOMPOSITION (round-3 verdict #7): each call is timed as
    # dispatch (async enqueue returning) + pull (np.asarray host read),
    # and the chained-diff device time above bounds the true compute.
    # Since r5 this measures the pull production serving actually does:
    # cli/serve.py quantizes to int16 ON DEVICE and pulls 4.6 MB pcm16
    # (bit-identical to the 16-bit WAV wire format), not the 9.2 MB f32
    # batch r4 timed.
    fn16 = synth._get_synth_fn(pcm16=True)
    n_iters = 5
    seeds = [jax.random.normal(jax.random.PRNGKey(i + 1), x_T.shape)
             for i in range(n_iters)]
    # compile outside the timed loop, on an input the loop never reuses
    # (byte-identical re-executions can be served from the relay cache)
    warm = jax.random.normal(jax.random.PRNGKey(10_000), x_T.shape)
    np.asarray(fn16(synth.model_params, synth.codec_params,
                    warm, ids, mask)[0])
    call_ms = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        w16 = fn16(synth.model_params, synth.codec_params,
                   seeds[i], ids, mask)[0]
        t1 = time.perf_counter()
        np.asarray(w16)
        t2 = time.perf_counter()
        call_ms.append(((t1 - t0) * 1e3, (t2 - t1) * 1e3))
    totals = sorted(d + p for d, p in call_ms)
    med_total = totals[len(totals) // 2]
    elapsed_xfer = med_total / 1e3
    rtf_xfer = audio_seconds / elapsed_xfer
    device_ms = per_iter * 1e3

    # --- overhead ATTRIBUTION probes (r4 verdict #5): compute-free
    # programs isolate the relay's per-call floor from pull bandwidth.
    # Each probe result depends on a fresh input so no call can be
    # cache-served; median of n_iters.
    wav_elems = BATCH * host_wav.shape[1]

    def probe(make_out):
        fn = jax.jit(make_out)
        np.asarray(fn(jnp.float32(1.5)))  # compile
        times = []
        for i in range(n_iters):
            seed = jnp.float32(1.0 + 1e-6 * (i + 1))
            t0 = time.perf_counter()
            np.asarray(fn(seed))
            times.append((time.perf_counter() - t0) * 1e3)
        return sorted(times)[n_iters // 2]

    probe_scalar = probe(lambda s: s * 2.0)
    probe_f32 = probe(lambda s: jnp.full((wav_elems,), s, jnp.float32))
    probe_pcm16 = probe(
        lambda s: jnp.full((wav_elems,), s * 1e4, jnp.float32)
        .astype(jnp.int16))
    f32_mb = wav_elems * 4 / 1e6
    bw = (f32_mb / ((probe_f32 - probe_scalar) / 1e3)
          if probe_f32 > probe_scalar else float("inf"))

    seq_breakdown = {
        "seq_dispatch_ms_med": round(
            sorted(d for d, _ in call_ms)[n_iters // 2], 1),
        "seq_pull_ms_med": round(
            sorted(p for _, p in call_ms)[n_iters // 2], 1),
        "seq_total_ms_min": round(totals[0], 1),
        "seq_total_ms_med": round(med_total, 1),
        "seq_pull_bytes": wav_elems * 2,   # pcm16, the serving format
        "device_ms_chained": round(device_ms, 1),
        # what the relay adds per sequential call beyond pure compute;
        # attribute it with the probes below: floor (scalar) + bandwidth
        # (f32-vs-scalar slope) + residual
        "seq_overhead_ms_med": round(med_total - device_ms, 1),
        "probe_scalar_ms_med": round(probe_scalar, 1),
        "probe_pull_f32_ms_med": round(probe_f32, 1),
        "probe_pull_pcm16_ms_med": round(probe_pcm16, 1),
        "pull_bandwidth_mb_s": round(bw, 1),
    }

    # --- pipelined serving: dispatch batch i+1 BEFORE pulling batch i's
    # audio (JAX dispatch is async), so the host transfer overlaps the
    # next batch's device compute — what cli/serve.py's two-stage batcher
    # does in production, including its device-side int16 quantization
    # (half the pull bytes; bit-identical to the 16-bit WAV wire format)
    # fn16 (the pipeline's cached pcm16 executable — what serve.py runs)
    # was compiled and warmed above for the sequential metric.  FRESH
    # seeds: the sequential loop already executed seeds[0..n) through
    # this same program, and a byte-identical re-execution can be served
    # from the relay cache, which would fake the pipelined number.
    pseeds = [jax.random.normal(jax.random.PRNGKey(100 + i), x_T.shape)
              for i in range(n_iters)]
    t_start = time.perf_counter()
    dev = fn16(synth.model_params, synth.codec_params,
               pseeds[0], ids, mask)[0]
    for i in range(n_iters):
        nxt = None
        if i + 1 < n_iters:
            nxt = fn16(synth.model_params, synth.codec_params,
                       pseeds[i + 1], ids, mask)[0]
        np.asarray(dev)
        dev = nxt
    elapsed_pipe = (time.perf_counter() - t_start) / n_iters
    rtf_pipe = audio_seconds / elapsed_pipe

    print(json.dumps({
        "metric": "rtf_text_to_wav",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / TARGET_RTF, 3),
        "rtf_device_program": round(rtf, 2),
        # r4: median of per-call totals (r2/r3 used the loop mean; the
        # median resists one slow relay round-trip)
        "rtf_with_host_transfers": round(rtf_xfer, 2),
        "rtf_serving_pipelined": round(rtf_pipe, 2),
        "methodology": "r5-chained-diff+pcm16-pull+attributed",
        **seq_breakdown,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        # the chip/tunnel can be unavailable (observed: axon backend init
        # raising after its retry window) — the driver still expects ONE
        # parseable JSON line, so report the failure as data, then fail
        print(json.dumps({
            "metric": "rtf_text_to_wav",
            "value": 0.0,
            "unit": "x_realtime",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        raise SystemExit(1)
