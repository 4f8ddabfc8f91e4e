"""End-to-end CLI drive of the EMA surface (CPU-forced).

train --smoke --ema_decay -> checkpoint with ema_params
synthesize --ema           -> wav sampled from the EMA params
synthesize --ema (no-EMA ckpt) -> clean SystemExit

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/drive_ema_cli.py
"""

import json
import os
import sys
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TINY_FLAT = dict(
    block_out_channels=[32, 64, 64, 64], cross_attention_dim=64,
    attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
    sample_size=48, layers_per_block=1, unet_num_heads=4,
    batch_size=8, num_train_epochs=1, learning_rate=1e-3,
    lr_warmup_steps=0,
)


def main():
    root = tempfile.mkdtemp(prefix="ema_cli_")
    cfg_path = os.path.join(root, "cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(TINY_FLAT, f)

    from prompt_tts_tpu.cli.synthesize import main as synth_main
    from prompt_tts_tpu.cli.train import main as train_main

    ckpt = os.path.join(root, "ckpt")
    train_main(["--smoke", "--config_file", cfg_path, "--ema_decay", "0.9",
                "--ckpt_dir", ckpt, "--log_dir", os.path.join(root, "logs")])
    print("TRAIN WITH EMA: OK")

    out = os.path.join(root, "ema.wav")
    synth_main(["--text", "hello world", "--out", out, "--ckpt_dir", ckpt,
                "--ema", "--config_file", cfg_path, "--steps", "4"])
    assert os.path.exists(out) and os.path.getsize(out) > 1000, out
    print("SYNTHESIZE --ema: OK", os.path.getsize(out), "bytes")

    # raw-params path still works from the same checkpoint
    out2 = os.path.join(root, "raw.wav")
    synth_main(["--text", "hello world", "--out", out2, "--ckpt_dir", ckpt,
                "--config_file", cfg_path, "--steps", "4"])
    assert os.path.exists(out2), out2
    print("SYNTHESIZE raw params: OK")

    # negative: a checkpoint trained WITHOUT ema must refuse --ema cleanly
    ckpt2 = os.path.join(root, "ckpt_noema")
    train_main(["--smoke", "--config_file", cfg_path,
                "--ckpt_dir", ckpt2, "--log_dir", os.path.join(root, "l2")])
    try:
        synth_main(["--text", "x", "--out", os.path.join(root, "no.wav"),
                    "--ckpt_dir", ckpt2, "--ema", "--config_file", cfg_path,
                    "--steps", "2"])
    except SystemExit as e:
        print("NEGATIVE --ema on non-EMA ckpt: OK ->", e)
    else:
        raise AssertionError("--ema on a non-EMA checkpoint did not exit")

    print("ALL EMA CLI DRIVES PASSED")


if __name__ == "__main__":
    main()
