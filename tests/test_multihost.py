"""Two-process distributed smoke test (VERDICT r2 item 10).

parallel/multihost.py wraps ``jax.distributed.initialize`` + a global mesh;
until now it was validated-by-construction only.  This test launches TWO
actual OS processes that form a jax.distributed cluster over the CPU
backend, build the global mesh through ``multihost.global_mesh``, and run a
psum across processes — asserting the cross-process collective result and
the process/device topology.
"""
import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
sys.path.insert(0, os.environ["REPO_ROOT"])
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from srrg2_proslam_tpu.parallel import multihost

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert multihost.is_coordinator() == (pid == 0)

mesh = multihost.global_mesh("d")
ndev = len(jax.devices())
assert ndev == nproc * 2, ndev  # 2 virtual CPU devices per process

# one shard per device, value = 1 + process index; the psum must see the
# shards of BOTH processes (expect nproc * 2 devices' worth)
sharding = NamedSharding(mesh, P("d"))
local = jnp.asarray([1.0 + pid for _ in jax.local_devices()])
garr = jax.make_array_from_process_local_data(sharding, local, (ndev,))

import jax.experimental.shard_map as shard_map
def f(x):
    return jax.lax.psum(x, "d")
out = jax.jit(shard_map.shard_map(
    f, mesh=mesh, in_specs=P("d"), out_specs=P()))(garr)
expect = 2 * (1.0 + 0) + 2 * (1.0 + 1)  # both processes' shards
got = float(jax.device_get(out)[0] if out.ndim else jax.device_get(out))
assert got == expect, (got, expect)
print(f"proc {pid}: psum over {ndev} devices across {nproc} processes OK",
      flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_psum(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ)
    env["REPO_ROOT"] = os.path.join(os.path.dirname(__file__), "..")
    env.pop("JAX_PLATFORMS", None)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "OK" in out, out
