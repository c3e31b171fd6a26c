"""Multi-host wiring: 2-process CPU cluster through runtime.mesh.init_distributed
(coordinator from STGCMA_* env), cross-process global array + collective."""
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ["STGCMA_PLATFORM"] = "cpu"
import jax
from stgcma_tpu.runtime.mesh import init_distributed
assert init_distributed(), "env not picked up"
assert init_distributed(), "second call must be a no-op returning True"
assert jax.process_count() == 2
assert jax.device_count() == 2
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("data",))
x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")),
    np.ones((1, 4), np.float32) * (jax.process_index() + 1), (2, 4))
s = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(x)
assert float(jax.device_get(s)) == 12.0
print("DIST_OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_cluster(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   STGCMA_COORDINATOR=f"127.0.0.1:{port}",
                   STGCMA_NUM_PROCESSES="2",
                   STGCMA_PROCESS_ID=str(pid),
                   STGCMA_PLATFORM="cpu")
        env.pop("XLA_FLAGS", None)  # no forced host device multiplication
        procs.append(subprocess.Popen([sys.executable, str(script)],
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, env=env,
                                      text=True))
    outs = [p.communicate(timeout=150)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "DIST_OK" in out


def test_init_distributed_noop_without_env(monkeypatch):
    from stgcma_tpu.runtime import mesh
    for k in ("STGCMA_COORDINATOR", "STGCMA_NUM_PROCESSES",
              "STGCMA_PROCESS_ID", "STGCMA_DISTRIBUTED"):
        monkeypatch.delenv(k, raising=False)
    assert mesh.init_distributed() is False
