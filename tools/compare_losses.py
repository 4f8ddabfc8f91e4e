"""Loss-curve parity harness (BASELINE.md: "TensorBoard loss-curve match").

Compares this framework's training metrics against a reference run:

  python tools/compare_losses.py --ours runs/lj/metrics.jsonl \\
      --reference /path/to/reference/tb_event_dir_or_file

"ours" is the JSONL the Trainer writes; "reference" is a torch
SummaryWriter event file/dir with a ``Loss/train`` scalar (what the
original train.py logs, reference train.py:113).  Curves are aligned on
step, smoothed with an EMA (diffusion losses are noisy micro-step values;
the reference additionally logs loss/accum per micro-step — pass
--ref_scale to undo its accumulation scaling), and compared on relative
area-between-curves.
"""

import argparse
import json
import os
from typing import Dict, List, Tuple

import numpy as np


def load_ours(path: str, tag: str = "Loss/train") -> Dict[int, float]:
    out = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == tag:
                out[int(rec["step"])] = float(rec["value"])
    return out


def load_tensorboard(path: str, tag: str = "Loss/train") -> Dict[int, float]:
    """Read scalars from a TB event file/dir (tensorboard package)."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )
    if os.path.isfile(path):
        path = os.path.dirname(path) or "."
    acc = EventAccumulator(path, size_guidance={"scalars": 0})
    acc.Reload()
    if tag not in acc.Tags().get("scalars", []):
        raise SystemExit(
            f"tag {tag!r} not in reference run; has {acc.Tags()}")
    return {int(e.step): float(e.value) for e in acc.Scalars(tag)}


def ema(values: np.ndarray, alpha: float = 0.02) -> np.ndarray:
    out = np.empty_like(values)
    acc = values[0]
    for i, v in enumerate(values):
        acc = (1 - alpha) * acc + alpha * v
        out[i] = acc
    return out


def compare(ours: Dict[int, float], ref: Dict[int, float],
            ref_scale: float = 1.0) -> Tuple[float, int]:
    steps = sorted(set(ours) & set(ref))
    if len(steps) < 10:
        raise SystemExit(
            f"only {len(steps)} overlapping steps; need >= 10")
    a = ema(np.asarray([ours[s] for s in steps]))
    b = ema(np.asarray([ref[s] * ref_scale for s in steps]))
    rel_gap = float(np.mean(np.abs(a - b) / np.maximum(np.abs(b), 1e-8)))
    return rel_gap, len(steps)


def main():
    p = argparse.ArgumentParser(description="Compare training loss curves.")
    p.add_argument("--ours", required=True, help="metrics.jsonl path")
    p.add_argument("--reference", required=True,
                   help="reference TB event file or dir")
    p.add_argument("--tag", default="Loss/train")
    p.add_argument("--ref_scale", type=float, default=1.0,
                   help="multiply reference values (e.g. accum steps to "
                        "undo the reference's loss/accum scaling)")
    p.add_argument("--tolerance", type=float, default=0.05,
                   help="max mean relative gap to PASS")
    args = p.parse_args()

    ours = load_ours(args.ours, args.tag)
    ref = load_tensorboard(args.reference, args.tag)
    rel_gap, n = compare(ours, ref, args.ref_scale)
    verdict = "PASS" if rel_gap <= args.tolerance else "FAIL"
    print(json.dumps({
        "metric": "loss_curve_relative_gap",
        "value": round(rel_gap, 4),
        "overlapping_steps": n,
        "tolerance": args.tolerance,
        "verdict": verdict,
    }))
    raise SystemExit(0 if verdict == "PASS" else 1)


if __name__ == "__main__":
    main()
