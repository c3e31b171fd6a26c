"""Cold-cache guard for the driver surfaces (VERDICT r4 #8).

The recurring round failure mode was "works warm, times out cold on the
driver budget" (MULTICHIP_r04 rc=124; serving-device/swin-large bench extras
r3+r4). This pins the cold path BEFORE the driver sees it:

  * dryrun_multichip tiny-mode in a subprocess with a FRESH HOME (therefore
    a fresh persistent-cache dir) under a hard wall-clock bound, and
  * one bench extra (the host-decode stage) under its sub-budget alarm.

The full-geometry dry run is budgeted by measurement instead (see
__graft_entry__.dryrun_multichip docstring: execution dominates; XLA:CPU
compile is <10 s warm or cold, so tiny-mode cold-compile coverage is the
meaningful cache-sensitive surface).
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# generous vs the ~40 s observed cold on a contended 1-core host, hard vs
# the minutes-long hang this guards against
TINY_BUDGET_S = 300


def test_dryrun_tiny_cold_cache_fits_budget(tmp_path):
    env = dict(os.environ)
    env["HOME"] = str(tmp_path)          # fresh ~/.cache -> cold compile
    env["STGCMA_DRYRUN_TINY"] = "1"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("STGCMA_DRYRUN_TASKS", None)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py")],
        capture_output=True, text=True, timeout=TINY_BUDGET_S, env=env,
        cwd=REPO)
    dt = time.perf_counter() - t0
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    assert "dryrun_multichip[ave]" in out and "OK" in out, out[-2000:]
    assert "dryrun_multichip[serving]" in out, out[-2000:]
    # the cache dir must actually have been the fresh one (cold evidence)
    cache = tmp_path / ".cache" / "stgcma_jax_cpu"
    assert cache.exists() and any(cache.iterdir()), (
        "tiny dry run did not populate the fresh persistent cache "
        f"(cold-path evidence missing); took {dt:.1f}s")


def test_bench_host_decode_extra_under_alarm():
    import signal

    sys.path.insert(0, REPO)
    import bench

    def _alarm(signum, frame):
        raise TimeoutError("host-decode exceeded its 90s sub-budget")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(90)
    try:
        fps, gbs, ok = bench._bench_host_decode(n_imgs=64)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    assert fps > 0 and ok == 1.0
