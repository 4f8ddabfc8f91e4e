"""Profiler CLI: cost analysis + chained-difference timing (tiny, CPU).

The reference has no profiling subsystem (SURVEY.md §5); ours must at
minimum report the compiler's own FLOP/byte counts per pipeline stage
and, with --time, a per-stage wall time using the repo's frozen
methodology.  These tests run the real CLI end to end on a tiny config.
"""

import json

from prompt_tts_tpu.cli import profile as profile_cli
from prompt_tts_tpu.config import Config, ModelConfig, TrainConfig


def _tiny_cfg():
    return Config(
        model=ModelConfig(
            block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
            attention_head_dim=32, text_encoder_layers=1,
            cmu_seq_len=64, sample_size=40, layers_per_block=1,
            unet_num_heads=4),
        train=TrainConfig(batch_size=2),
    )


def _run(tmp_path, capsys, extra):
    cfg_path = str(tmp_path / "cfg.json")
    _tiny_cfg().to_json(cfg_path)
    profile_cli.main(["--config_file", cfg_path, "--batch_size", "1",
                      "--num_inference_steps", "2"] + extra)
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


class TestCostAnalysis:
    def test_default_stages_report_flops(self, tmp_path, capsys):
        res = _run(tmp_path, capsys, ["--train_batch_size", "1"])
        assert set(res["stages"]) == {"cond", "denoise", "decode", "train"}
        for name, row in res["stages"].items():
            assert row.get("gflop", 0) > 0, (name, row)
        # a full train step (fwd+bwd) must cost more than one denoise fwd
        assert (res["stages"]["train"]["gflop"]
                > res["stages"]["denoise"]["gflop"])

    def test_synth_stage_covers_whole_program(self, tmp_path, capsys):
        res = _run(tmp_path, capsys, ["--stages", "synth,denoise,decode"])
        stages = res["stages"]
        # the fused text->wav program contains 2 denoise steps + decode
        assert stages["synth"]["gflop"] >= (
            2 * stages["denoise"]["gflop"] + stages["decode"]["gflop"]) * 0.9

    def test_unknown_stage_rejected(self, tmp_path, capsys):
        cfg_path = str(tmp_path / "cfg.json")
        _tiny_cfg().to_json(cfg_path)
        try:
            profile_cli.main(["--config_file", cfg_path,
                              "--stages", "nope"])
        except SystemExit as e:
            assert "nope" in str(e)
        else:  # pragma: no cover
            raise AssertionError("expected SystemExit")


class TestTiming:
    def test_time_mode_reports_ms(self, tmp_path, capsys):
        res = _run(tmp_path, capsys,
                   ["--stages", "cond,denoise", "--time", "--chain", "2"])
        for name in ("cond", "denoise"):
            row = res["stages"][name]
            assert "ms" in row and row["ms"] == row["ms"]  # not NaN
            assert "pct_peak" in row

    def test_time_mode_train(self, tmp_path, capsys):
        res = _run(tmp_path, capsys,
                   ["--stages", "train", "--train_batch_size", "1",
                    "--time", "--chain", "2"])
        assert "ms" in res["stages"]["train"]
