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


@pytest.mark.slow
def test_two_process_distributed_init(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
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
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"worker {i} OK" in out
    # only rank 0 wrote
    assert (tmp_path / "rank0_marker").exists()
