"""CLI drive of sharded synthesis: ``synthesize --tp 2 --sp 2`` on an
8-virtual-device CPU mesh (random weights — plumbing smoke, numerics are
covered by tests/test_tp.py + tests/test_sp.py).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/drive_tp_cli.py
(it re-execs itself with the forced device count).
"""

import json
import os
import subprocess
import sys
import tempfile

TINY_FLAT = dict(
    block_out_channels=[32, 64, 64, 64], cross_attention_dim=64,
    attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
    sample_size=48, layers_per_block=1, unet_num_heads=4,
)


def _inner():
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    root = tempfile.mkdtemp(prefix="tp_cli_")
    cfg_path = os.path.join(root, "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(TINY_FLAT, f)
    from prompt_tts_tpu.cli.synthesize import main as synth_main
    out = os.path.join(root, "tp.wav")
    synth_main(["--text", "sharded synthesis", "--out", out,
                "--config_file", cfg_path, "--steps", "2",
                "--tp", "2", "--sp", "2"])
    assert os.path.exists(out) and os.path.getsize(out) > 1000, out
    print("SYNTHESIZE --tp 2 --sp 2: OK", os.path.getsize(out), "bytes")


def main():
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    code = ("import sys; sys.argv=['x']; "
            f"sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r}); "
            "import drive_tp_cli; drive_tp_cli._inner()")
    proc = subprocess.run([sys.executable, "-c", code], env=env, text=True)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
