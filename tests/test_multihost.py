"""Multi-host SPMD init: a real 2-process jax.distributed run on CPU.

The ``--multihost`` path (cli/train.py init_multihost — the SPMD
replacement for the reference's accelerate/NCCL launch, reference
train.py:25-29) is exercised by spawning TWO fresh python processes that
initialize a distributed runtime over localhost, build a global 2-device
mesh, run a cross-process collective (global sum through a jitted
replicated output), and rank-gate host writes on ``process_index() == 0``
— the same gating the Trainer uses for metrics/checkpoints.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import os, sys
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prompt_tts_tpu.cli.train import init_multihost

init_multihost()
assert jax.process_count() == 2, jax.process_count()
rank = jax.process_index()
assert rank == int(os.environ["PTTS_PROCESS_ID"])

devs = jax.devices()
assert len(devs) == 2, devs            # one CPU device per process
mesh = Mesh(np.array(devs), ("data",))
sh = NamedSharding(mesh, P("data"))

# each process contributes its shard; the jitted sum crosses processes
local = np.full((1,), float(rank + 1), np.float32)
x = jax.make_array_from_process_local_data(sh, local)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
assert float(total) == 3.0, float(total)

# rank gating, as the Trainer gates metrics/checkpoint writes
if rank == 0:
    with open(os.path.join(os.environ["PTTS_OUT"], "rank0_marker"), "w") as f:
        f.write("ok")
print(f"worker {rank} OK", flush=True)
"""


def _run_workers(script_text, tmp_path, timeout=240):
    """Spawn two distributed worker processes; return their outputs."""
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(script_text)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_base = {
        **os.environ,
        "PTTS_COORDINATOR": coord,
        "PTTS_NUM_PROCESSES": "2",
        "PTTS_OUT": str(tmp_path),
        # workers must not inherit the 8-device test flag: one device per
        # process makes the global mesh exactly 2 devices
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        # the worker script lives in tmp, so the repo must be importable
        "PYTHONPATH": (os.environ.get("PYTHONPATH", "") + ":" + repo)
        .lstrip(":"),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script)],
            env={**env_base, "PTTS_PROCESS_ID": str(i)},
            cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    return outs


@pytest.mark.slow
def test_two_process_distributed_init(tmp_path):
    outs = _run_workers(_WORKER, tmp_path)
    for i, out in enumerate(outs):
        assert f"worker {i} OK" in out
    # only rank 0 wrote
    assert (tmp_path / "rank0_marker").exists()


# A REAL sharded train step across two processes: each process holds the
# same global host batch (the deterministic-iteration contract) and
# shard_batch materializes only its addressable shard
# (parallel/mesh._to_global — device_put is invalid for non-addressable
# meshes, the thing a single-process test can never catch).
_TRAIN_WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import os
import numpy as np
import jax.numpy as jnp

from prompt_tts_tpu.cli.train import init_multihost

init_multihost()
rank = jax.process_index()
assert jax.process_count() == 2

from prompt_tts_tpu.config import ModelConfig, TrainConfig
from prompt_tts_tpu.data import SyntheticDataset
from prompt_tts_tpu.diffusion.schedule import linear_schedule
from prompt_tts_tpu.models import TTSSingleSpeaker
from prompt_tts_tpu.parallel.mesh import (make_mesh, shard_batch,
                                          shard_local_batch)
from prompt_tts_tpu.train import (create_train_state, jit_train_step,
                                  make_train_step)

mcfg = ModelConfig(
    block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
    attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
    sample_size=48, layers_per_block=1, unet_num_heads=4)
tcfg = TrainConfig(batch_size=2, learning_rate=1e-3, lr_warmup_steps=0)
model = TTSSingleSpeaker(mcfg)
ds = SyntheticDataset(n=4, frames=48, max_seq_length=32)
batch = next(ds.batches(2))
params = model.init(
    jax.random.PRNGKey(0), jnp.asarray(batch["codes"][:1]),
    jnp.zeros((1,), jnp.int32), jnp.asarray(batch["text_ids"][:1]),
    jnp.asarray(batch["text_mask"][:1]))
state = create_train_state(model, params, tcfg, 10)
# the jitted step DONATES its state (train/step.py) — build the second
# state from a fresh copy of params BEFORE the first step deletes them
params2 = jax.tree.map(jnp.copy, params)
mesh = make_mesh()                       # (2, 1, 1) over the GLOBAL mesh
step = jit_train_step(make_train_step(model.apply, linear_schedule()), mesh)
_, m = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(1))
print(f"worker {rank} loss {float(m['loss']):.8f}", flush=True)

# per-process data path: this process loads only ITS row of each global
# batch (datasets' process_shard) and shard_local_batch assembles the
# global arrays — same shardings, so the step does not recompile
local = next(ds.batches(2, process_shard=(rank, 2)))
assert local["codes"].shape[0] == 1
state2 = create_train_state(model, params2, tcfg, 10)
_, m2 = step(state2, shard_local_batch(local, mesh), jax.random.PRNGKey(1))
print(f"worker {rank} local-loss {float(m2['loss']):.8f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_train_step(tmp_path):
    # two workers compile the same tiny program CONCURRENTLY on this
    # box's single core — budget accordingly
    outs = _run_workers(_TRAIN_WORKER, tmp_path, timeout=1200)
    losses, local_losses = [], []
    for i, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith(f"worker {i} loss "):
                losses.append(float(line.split()[-1]))
            if line.startswith(f"worker {i} local-loss "):
                local_losses.append(float(line.split()[-1]))
    assert len(losses) == 2 and len(local_losses) == 2, outs

    # the replicated loss must agree across processes...
    assert losses[0] == losses[1]
    # ...the per-process-data path (each host feeding only its rows)
    # must produce the SAME global step
    assert local_losses[0] == local_losses[1] == losses[0]

    # ...and match the SAME step computed single-process on a local
    # 2-device mesh with the identical global batch and PRNG key
    import jax
    import jax.numpy as jnp
    from prompt_tts_tpu.config import ModelConfig, TrainConfig
    from prompt_tts_tpu.data import SyntheticDataset
    from prompt_tts_tpu.diffusion.schedule import linear_schedule
    from prompt_tts_tpu.models import TTSSingleSpeaker
    from prompt_tts_tpu.parallel.mesh import make_mesh, shard_batch
    from prompt_tts_tpu.train import (create_train_state, jit_train_step,
                                      make_train_step)

    mcfg = ModelConfig(
        block_out_channels=(32, 64, 64, 64), cross_attention_dim=64,
        attention_head_dim=32, text_encoder_layers=1, cmu_seq_len=32,
        sample_size=48, layers_per_block=1, unet_num_heads=4)
    tcfg = TrainConfig(batch_size=2, learning_rate=1e-3, lr_warmup_steps=0)
    model = TTSSingleSpeaker(mcfg)
    ds = SyntheticDataset(n=4, frames=48, max_seq_length=32)
    batch = next(ds.batches(2))
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["codes"][:1]),
        jnp.zeros((1,), jnp.int32), jnp.asarray(batch["text_ids"][:1]),
        jnp.asarray(batch["text_mask"][:1]))
    state = create_train_state(model, params, tcfg, 10)
    mesh = make_mesh(devices=jax.devices()[:2])
    step = jit_train_step(make_train_step(model.apply, linear_schedule()),
                          mesh)
    _, m = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(1))
    assert abs(float(m["loss"]) - losses[0]) < 1e-5
