"""Metrics writer: TensorBoard event files + JSONL mirror.

Replaces the reference's torch SummaryWriter usage (reference
train.py:22, 113) with the tensorboard package's own event writer (no torch
in the logging path), plus a JSONL mirror that is trivially machine-readable
for benchmarking and the training driver.
"""

import json
import os
import time
from typing import Optional


class MetricsWriter:
    def __init__(self, log_dir: str, jsonl_name: str = "metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self._log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, jsonl_name), "a")
        self._tb = None
        try:
            from tensorboard.compat.proto import event_pb2, summary_pb2
            from tensorboard.summary.writer.event_file_writer import (
                EventFileWriter,
            )
            self._event_pb2 = event_pb2
            self._summary_pb2 = summary_pb2
            self._tb = EventFileWriter(log_dir)
        except Exception:  # tensorboard absent: JSONL only
            self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        value = float(value)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": int(step),
                        "ts": time.time()}) + "\n")
        if self._tb is not None:
            summary = self._summary_pb2.Summary(
                value=[self._summary_pb2.Summary.Value(
                    tag=tag, simple_value=value)])
            event = self._event_pb2.Event(
                wall_time=time.time(), step=int(step), summary=summary)
            self._tb.add_event(event)

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class NullMetricsWriter:
    """No-op writer with the same interface; non-zero ranks under
    ``--multihost`` use it so only process 0 writes event/JSONL files
    (the SPMD analog of the reference's ``is_main_process`` gating,
    reference train.py:75,140)."""

    def __init__(self, log_dir: str):
        self._log_dir = log_dir

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        pass

    def flush(self) -> None:
        pass

    def close(self) -> None:
        pass
