"""Loss-curve parity A/B regression: torch-twin recipe vs this framework.

Runs tools/loss_parity_ab.py end-to-end at a reduced step count: identical
converted weights + identical pre-drawn noise/timesteps must yield
step-identical loss curves (the BASELINE.md "training parity" row; full
300-step result recorded in BENCHMARKS.md).
"""

import json
import sys

import pytest

sys.path.insert(0, "tools")


def test_ab_curves_match(tmp_path, capsys, monkeypatch):
    from loss_parity_ab import main

    monkeypatch.setattr(sys, "argv", [
        "loss_parity_ab", "--steps", "25", "--batch", "4",
        "--out", str(tmp_path)])
    with pytest.raises(SystemExit) as e:
        main()
    assert e.value.code == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rec["verdict"] == "PASS"
    assert rec["value"] <= 0.02
    # identical first loss proves identical init + forward + noise
    assert abs(rec["first"][0] - rec["first"][1]) < 1e-4
