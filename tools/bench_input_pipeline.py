"""Host input-pipeline throughput at the flagship operating point.

r4 verdict weak #6: the C++ collate + prefetch thread exist but no
number showed the 1-core host can feed the device's consumption rate
(batch-32 flagship step ~235 ms device time = ~136 ex/s).  This
measures, on a synthetic corpus at the exact flagship shapes
(900-frame 8-book codes, real phonemizer text at load time):

  * CodeDataset (in-RAM): corpus load time, then collate-only ex/s over
    full epochs — the per-step host work the Trainer's async-dispatch
    loop overlaps with device compute;
  * StreamingCodeDataset: end-to-end streamed ex/s (tar read + decode +
    collate + prefetch hand-off), the large-corpus path.

Prints one JSON line per measurement; the BENCHMARKS "host input
pipeline" row quotes these against the 136 ex/s device consumption.

Run: PYTHONPATH=/root/.axon_site:/root/repo python -u \
       tools/bench_input_pipeline.py --tar /tmp/synth_corpus.tar
(make the corpus first: tools/make_synth_corpus.py --out ... --n 4096)
"""

import argparse
import json
import time

ap = argparse.ArgumentParser()
ap.add_argument("--tar", required=True)
ap.add_argument("--batch_size", type=int, default=32)
ap.add_argument("--epochs", type=int, default=3)
ap.add_argument("--max_seq_length", type=int, default=550)
args = ap.parse_args()

from prompt_tts_tpu.data import CodeDataset  # noqa: E402
from prompt_tts_tpu.data.streaming import StreamingCodeDataset  # noqa: E402


def consume(ds, epochs):
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for b in ds.batches(args.batch_size, shuffle=True, seed=1):
            n += b["codes"].shape[0]
    dt = time.perf_counter() - t0
    return n, dt


t0 = time.perf_counter()
ram = CodeDataset(args.tar, max_seq_length=args.max_seq_length)
load_s = time.perf_counter() - t0
print(json.dumps({"metric": "corpus_load_s", "value": round(load_s, 1),
                  "n_utts": len(ram)}), flush=True)

n, dt = consume(ram, args.epochs)
print(json.dumps({"metric": "host_collate_ex_s", "value": round(n / dt, 1),
                  "unit": "examples_per_s", "batches": n // args.batch_size,
                  "ms_per_batch": round(dt / (n / args.batch_size) * 1e3, 1),
                  }), flush=True)

stream = StreamingCodeDataset(args.tar, max_seq_length=args.max_seq_length)
n, dt = consume(stream, 1)
print(json.dumps({"metric": "host_streaming_ex_s",
                  "value": round(n / dt, 1),
                  "unit": "examples_per_s",
                  "ms_per_batch": round(dt / (n / args.batch_size) * 1e3, 1),
                  }), flush=True)
