"""Loss-parity harness test: synthetic matched and diverging runs."""

import json

import numpy as np
import pytest

import sys
sys.path.insert(0, "tools")

from compare_losses import compare, ema, load_ours, load_tensorboard  # noqa: E402


def _write_ours(path, steps, values):
    with open(path, "w") as f:
        for s, v in zip(steps, values):
            f.write(json.dumps(
                {"tag": "Loss/train", "step": int(s), "value": float(v),
                 "ts": 0}) + "\n")


def _write_tb(dirname, steps, values):
    from tensorboard.compat.proto import event_pb2, summary_pb2
    from tensorboard.summary.writer.event_file_writer import (
        EventFileWriter,
    )
    w = EventFileWriter(str(dirname))
    for s, v in zip(steps, values):
        summary = summary_pb2.Summary(
            value=[summary_pb2.Summary.Value(tag="Loss/train",
                                             simple_value=float(v))])
        w.add_event(event_pb2.Event(wall_time=0.0, step=int(s),
                                    summary=summary))
    w.close()


class TestCompareLosses:
    def test_matched_curves_pass(self, tmp_path):
        rng = np.random.default_rng(0)
        steps = np.arange(1, 201)
        base = 1.0 / np.sqrt(steps)
        ours = base + rng.normal(size=len(steps)) * 0.01
        ref = base + rng.normal(size=len(steps)) * 0.01
        _write_ours(tmp_path / "m.jsonl", steps, ours)
        _write_tb(tmp_path / "tb", steps, ref)

        a = load_ours(str(tmp_path / "m.jsonl"))
        b = load_tensorboard(str(tmp_path / "tb"))
        gap, n = compare(a, b)
        assert n == 200
        assert gap < 0.05, gap

    def test_diverging_curves_fail(self, tmp_path):
        steps = np.arange(1, 201)
        _write_ours(tmp_path / "m.jsonl", steps, 1.0 / np.sqrt(steps))
        _write_tb(tmp_path / "tb", steps, 0.5 / np.sqrt(steps))
        a = load_ours(str(tmp_path / "m.jsonl"))
        b = load_tensorboard(str(tmp_path / "tb"))
        gap, _ = compare(a, b)
        assert gap > 0.5

    def test_ref_scale_undoes_accumulation(self, tmp_path):
        steps = np.arange(1, 101)
        vals = 1.0 / np.sqrt(steps)
        _write_ours(tmp_path / "m.jsonl", steps, vals)
        _write_tb(tmp_path / "tb", steps, vals / 4.0)  # ref logs loss/accum
        a = load_ours(str(tmp_path / "m.jsonl"))
        b = load_tensorboard(str(tmp_path / "tb"))
        gap, _ = compare(a, b, ref_scale=4.0)
        assert gap < 1e-6

    def test_ema_smooths(self):
        x = np.ones(100)
        x[50] = 100.0
        sm = ema(x)
        assert sm.max() < 5.0
