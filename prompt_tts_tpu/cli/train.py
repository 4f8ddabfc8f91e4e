"""Train the TTS model: ``python -m prompt_tts_tpu.cli.train``.

CLI surface mirrors the reference (reference train.py:150-168:
--data_file/--log_dir/--config_file/--ckpt_dir/--batch_size/
--max_seq_length) with additions the reference lacks: ``--resume`` (the
reference has no load path), ``--smoke`` (synthetic-data CPU smoke run),
``--bf16``, ``--remat``.
"""

import argparse
import logging


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train the TTS diffusion model.")
    p.add_argument("--data_file", type=str, default=None,
                   help="Processed code tar (generate_codes output).")
    p.add_argument("--log_dir", type=str, default="runs/train",
                   help="TensorBoard/JSONL metrics directory.")
    p.add_argument("--config_file", type=str, default=None,
                   help="JSON config (flat reference schema or nested).")
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="Checkpoint directory (orbax).")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--max_seq_length", type=int, default=550)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--resume", action="store_true",
                   help="Restore the latest checkpoint before training.")
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel degree: size of the mesh 'model' "
                        "axis (params+moments Megatron-sharded over it; "
                        "the remaining devices form the 'data' axis).")
    p.add_argument("--sp", type=int, default=1,
                   help="Sequence-parallel degree: size of the mesh 'seq' "
                        "axis. Latent time is sharded over it (ring "
                        "attention for self-attn, GSPMD halo exchange for "
                        "convs); longer-audio regimes than one chip holds.")
    p.add_argument("--log_every", type=int, default=0,
                   help="Pull loss/grad_norm to the host (and NaN-guard "
                        "them) every N steps. Each pull is a blocking "
                        "device sync; between pulls steps enqueue "
                        "asynchronously and the input pipeline overlaps "
                        "device compute. 0 = auto (50 on TPU, 1 "
                        "elsewhere).")
    p.add_argument("--eval_every", type=int, default=0,
                   help="Run a deterministic eval pass (Loss/eval) every "
                        "N epochs (0 = never).")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="Capture a jax.profiler trace of N steps into "
                        "<log_dir>/xprof (0 = off).")
    p.add_argument("--init_from_ref", type=str, default=None,
                   help="Warm-start from a reference torch checkpoint "
                        "(ckpt_N.pt from the original repo's train.py), "
                        "converted on the fly — continue a migrated "
                        "training run here. Fresh optimizer state; "
                        "mutually exclusive with --resume.")
    p.add_argument("--ema_decay", type=float, default=None,
                   help="Maintain an exponential moving average of the "
                        "params at this decay (e.g. 0.9999); checkpointed "
                        "as 'ema_params', sampled via synthesize --ema.")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay f32).")
    p.add_argument("--remat", action="store_true",
                   help="Activation rematerialization (jax.checkpoint).")
    p.add_argument("--bucketed_opt",
                   choices=("auto", "on", "off", "stacked"),
                   default="auto",
                   help="Optimizer layout. 'on': shape-bucketed update "
                        "with per-step copies (train/bucketed.py) — wins "
                        "standalone (58.0 -> 9.5 ms) but LOSES inside "
                        "the fused step program, so auto = off; its "
                        "layout is part of the checkpoint. 'stacked': "
                        "params AND moments live natively bucketed "
                        "across steps — no per-step copies "
                        "(train/stacked.py); checkpoints stay canonical "
                        "per-leaf, so restore works across layouts. "
                        "Neither is TP-compatible.")
    p.add_argument("--stacked_max_mb", type=float, default=4.0,
                   help="With --bucketed_opt stacked: leaves larger than "
                        "this stay per-leaf (partial stacking — full "
                        "stacking doubles params+grads at peak and OOMs "
                        "the flagship batch-32 step; "
                        "tools/abl_leaf_sizes.py). 0 = stack everything.")
    p.add_argument("--fused_attn_bwd", choices=("auto", "on", "off"),
                   default="auto",
                   help="Pallas fused attention backward (forward and "
                        "inference numerics unchanged). auto = on for "
                        "TPU dp/tp meshes (multi-device via shard_map); "
                        "seq-parallel meshes keep XLA autodiff.")
    p.add_argument("--dropout_rng", choices=("threefry", "rbg"),
                   default="threefry",
                   help="PRNG for the dropout stream only. 'rbg' uses the "
                        "XLA-native RngBitGenerator: measured 253.8 -> "
                        "250.4 ms on the flagship batch-32 step "
                        "(tools/abl_train_opt.py); bits are not stable "
                        "across XLA releases, hence opt-in.")
    p.add_argument("--smoke", action="store_true",
                   help="Tiny synthetic run on CPU (sanity check).")
    p.add_argument("--streaming", action="store_true",
                   help="Stream batches from the tar instead of loading "
                        "the corpus into RAM (large corpora).")
    p.add_argument("--multihost", action="store_true",
                   help="Call jax.distributed.initialize() for multi-host "
                        "SPMD (TPU pods; env-configured).")
    p.add_argument("--per_process_data", action="store_true",
                   help="With --multihost: each host loads only its 1/P "
                        "slice of every batch (per-host corpus I/O scales "
                        "down; streaming datasets never read the other "
                        "hosts' rows).")
    return p.parse_args(argv)


def init_multihost():
    """Multi-host SPMD init (the ``--multihost`` path).

    On TPU pods ``jax.distributed.initialize()`` auto-detects coordinator
    and process info from the pod environment (the SPMD replacement for
    the reference's accelerate/NCCL launch, reference train.py:25-29).
    The ``PTTS_COORDINATOR`` / ``PTTS_NUM_PROCESSES`` / ``PTTS_PROCESS_ID``
    env vars override auto-detection for environments without a cluster
    resolver (e.g. multi-process CPU — exercised by tests/test_multihost.py).
    After init every process sees the global device set and rank-gates
    host I/O on ``jax.process_index() == 0``.
    """
    import os

    import jax
    coord = os.environ.get("PTTS_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["PTTS_NUM_PROCESSES"]),
            process_id=int(os.environ["PTTS_PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(
        format="%(asctime)s - %(levelname)s: %(message)s",
        level=logging.INFO, datefmt="%I:%M:%S",
    )

    import jax
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        init_multihost()

    import jax.numpy as jnp
    from prompt_tts_tpu.config import Config, ModelConfig, TrainConfig
    from prompt_tts_tpu.data import CodeDataset, SyntheticDataset
    from prompt_tts_tpu.train import Trainer

    if args.config_file:
        config = Config.from_json(args.config_file)
    elif args.smoke:
        config = Config(
            model=ModelConfig(
                block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
                attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
                sample_size=48, layers_per_block=1, unet_num_heads=4),
            train=TrainConfig(batch_size=8, num_train_epochs=1,
                              learning_rate=1e-3, lr_warmup_steps=0),
        )
    else:
        config = Config()

    if args.batch_size:
        import dataclasses
        config = dataclasses.replace(
            config, train=dataclasses.replace(
                config.train, batch_size=args.batch_size))
    if args.ema_decay is not None:
        import dataclasses
        config = dataclasses.replace(
            config, train=dataclasses.replace(
                config.train, ema_decay=args.ema_decay))

    if args.smoke:
        dataset = SyntheticDataset(
            n=16, frames=config.model.sample_size,
            max_seq_length=config.model.cmu_seq_len)
    else:
        if not args.data_file:
            raise SystemExit("--data_file is required (or use --smoke)")
        # prompt-conditioned configs need each batch to carry a speaker
        # prompt crop; without this the train step has no prompt input
        pf = (config.model.prompt_frames
              if config.model.prompt_conditioning else None)
        if args.streaming:
            from prompt_tts_tpu.data.streaming import StreamingCodeDataset
            dataset = StreamingCodeDataset(
                args.data_file, max_seq_length=args.max_seq_length,
                prompt_frames=pf)
        else:
            dataset = CodeDataset(args.data_file,
                                  max_seq_length=args.max_seq_length,
                                  prompt_frames=pf)

    init_params = None
    if args.init_from_ref:
        if args.resume:
            raise SystemExit("--init_from_ref and --resume are mutually "
                             "exclusive (resume restores params itself)")
        from prompt_tts_tpu.models.convert import load_reference_checkpoint
        init_params = load_reference_checkpoint(args.init_from_ref)
        logging.info("warm-starting from converted reference checkpoint %s",
                     args.init_from_ref)

    trainer = Trainer(
        config, dataset,
        log_dir=args.log_dir,
        ckpt_dir=args.ckpt_dir,
        n_model=args.tp,
        n_seq=args.sp,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        remat=args.remat,
        profile_steps=args.profile_steps,
        eval_every=args.eval_every,
        init_params=init_params,
        per_process_data=args.per_process_data,
        dropout_rng_impl=args.dropout_rng,
        bucketed_opt=args.bucketed_opt,
        stacked_max_bytes=(None if args.stacked_max_mb == 0
                           else int(args.stacked_max_mb * 2**20)),
        fused_attn_bwd=args.fused_attn_bwd,
        log_every=args.log_every,
    )
    if args.resume:
        trainer.restore_latest()

    loss = trainer.train(epochs=args.epochs)
    logging.info("final loss: %f (step %d)", loss, trainer.global_step)
    return loss


if __name__ == "__main__":
    main()
