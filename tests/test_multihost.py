"""Multi-host (DCN) simulation: 2 real processes over a localhost
coordinator run the process-count-agnostic data + step path.

The reference cannot span hosts at all (thread DataParallel,
SURVEY.md §5). Here each process: initializes the cluster, builds the
GLOBAL device mesh, loads only its host-shard of the global batch
(PrefetchLoader shard_index/shard_count), assembles the global sharded
array with `shard_batch` (make_array_from_process_local_data), and runs
one jitted mean-grad step — asserting the result equals the single-host
value, i.e. hosts change nothing but throughput.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.environ["REPO_ROOT"])
from cvpr23_lfdm_tpu.parallel.distributed import (
    host_shard, init_distributed, is_primary,
)
from cvpr23_lfdm_tpu.parallel.mesh import make_mesh, replicate, shard_batch

import numpy as np

info = init_distributed(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(os.environ["PROC_ID"]),
)
assert info["process_count"] == 2, info
assert info["device_count"] == 4, info  # 2 hosts x 2 local devices

# global mesh over all 4 devices; global batch 8 -> 4 per host
mesh = make_mesh()
assert mesh.devices.size == 4
shard_i, shard_n, local_bs = host_shard(8)
assert shard_n == 2 and local_bs == 4

# the deterministic "loader": every host derives the same global batch,
# slices its shard (what PrefetchLoader(shard_index=...) does)
global_x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
local_x = global_x[shard_i * local_bs : (shard_i + 1) * local_bs]

batch = shard_batch({"x": local_x}, mesh)
assert batch["x"].shape == (8, 3)  # GLOBAL shape

w = replicate(jax.numpy.ones((3,)), mesh)


@jax.jit
def step(w, x):
    return jax.grad(lambda w: ((x @ w) ** 2).mean())(w)


g = np.asarray(jax.device_get(step(w, batch["x"])))
# single-host oracle (computable everywhere)
gw = 2.0 * (global_x * (global_x @ np.ones(3))[:, None]).mean(0)
np.testing.assert_allclose(g, gw, rtol=1e-5)
print(f"proc {info['process_index']} primary={is_primary()} OK", flush=True)
"""


def test_two_process_dcn_simulation(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in (0, 1):
        env = dict(
            os.environ,
            COORD=coord,
            PROC_ID=str(pid),
            REPO_ROOT=repo,
            JAX_PLATFORMS="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
    assert "proc 0 primary=True OK" in outs[0]
    assert "proc 1 primary=False OK" in outs[1]
