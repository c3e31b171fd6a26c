"""Cross-process FULL train step (VERDICT r3 #9): a 2-process x 4-virtual-
device CPU cluster (8 global devices) runs one complete fwd+bwd+Adam step of
the tiny AVE Swin fusion model over a ('data':4, 'model':2) mesh — the same
dp+tp placement path the single-process dryrun exercises, but with the
gradient all-reduce genuinely crossing the process boundary (data rows 0-1
live on process 0, rows 2-3 on process 1).

test_distributed.py stops at a collective smoke; this drives
__graft_entry__._run_task_step (the real dryrun step builder) end to end.
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
sys.path.insert(0, {repo!r})
os.environ["STGCMA_PLATFORM"] = "cpu"
os.environ["STGCMA_FUSED_ATTN"] = "0"   # pallas compiled mode is TPU-only
import jax
from stgcma_tpu.runtime.mesh import init_distributed, make_mesh
assert init_distributed(), "env not picked up"
assert jax.process_count() == 2
assert jax.local_device_count() == 4
assert jax.device_count() == 8
from stgcma_tpu.configs import swin_tiny_test
import __graft_entry__ as GE
mesh = make_mesh(data=4, model=2, devices=jax.devices())
# the tp pairs (model axis) sit within one process; the dp all-reduce spans
# both processes
local_procs = {{d.process_index for d in mesh.devices[0]}}
assert len(local_procs) == 1, "tp pair must not straddle processes"
all_procs = {{d.process_index for d in mesh.devices.flat}}
assert all_procs == {{0, 1}}
cfg = swin_tiny_test(ftmode="fusion", label_dim=5, embed_dim=32,
                     num_heads=(2, 4))
GE._run_task_step("ave", mesh, cfg, B=4)
print("XPROC_TRAIN_OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_full_train_step(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   STGCMA_COORDINATOR=f"127.0.0.1:{port}",
                   STGCMA_NUM_PROCESSES="2",
                   STGCMA_PROCESS_ID=str(pid),
                   STGCMA_PLATFORM="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4 "
                             "--xla_cpu_collective_call_terminate_timeout_"
                             "seconds=7200")
        procs.append(subprocess.Popen([sys.executable, str(script)],
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, env=env,
                                      text=True))
    outs = [p.communicate(timeout=560)[0] for p in procs]
    losses = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "XPROC_TRAIN_OK" in out
        loss_line = next(l for l in out.splitlines()
                         if "dryrun_multichip[ave]" in l)
        losses.append(loss_line.split("loss=")[1].split(" ")[0])
    # the replicated global loss must agree across processes
    assert losses[0] == losses[1], f"losses diverged: {losses}"
