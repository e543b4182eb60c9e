"""Multi-host (multi-process) distributed init: 2 real processes, one
global mesh (SURVEY.md §2.3 distributed-backend row; VERDICT r1 item 3).

Each worker is a separate python process with 4 virtual CPU devices; the
pair forms one 8-device global mesh via jax.distributed.initialize and
runs a cross-process collective. This is the same code path a multi-host
TPU pod run takes (there, initialize() autodetects the pod topology).
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import os, sys
import numpy as np
sys.path.insert(0, os.environ["VQVAE_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
from scripts._common import maybe_init_distributed
assert maybe_init_distributed(), "distributed init did not trigger"
pid = jax.process_index()
assert jax.process_count() == 2
assert jax.local_device_count() == 4
assert len(jax.devices()) == 8, f"global devices: {jax.devices()}"

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from vqvae_tpu.parallel import get_mesh
from vqvae_tpu.parallel.mesh import is_primary

mesh = get_mesh()
assert len(mesh.devices.ravel()) == 8
local = (np.arange(8, dtype=np.float32) + 100.0 * pid).reshape(8, 1)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data", None)), local, (16, 1))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
expect = float(np.arange(8).sum() * 2 + 100.0 * 8)
assert abs(float(total) - expect) < 1e-5, (float(total), expect)
assert is_primary() == (pid == 0)
print(f"DISTOK {pid}")
"""


def test_two_process_global_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env.update({
            "VQVAE_REPO": str(REPO),
            "VQVAE_TPU_DISTRIBUTED": "1",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {pid} timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"DISTOK {pid}" in out
