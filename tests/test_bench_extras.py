"""Bench extras scheduler invariants (VERDICT r3 #2).

BENCH_r03 shipped with serving-device TimeoutError'd and softmax-fidelity
absent entirely: the old harness handed each extra the WHOLE remaining
budget, so one slow compile starved everything after it. These tests pin the
new contract: every spec yields exactly one entry, a slow extra times out at
its OWN sub-budget, and later extras still run inside their reserve.
"""
import sys
import time

sys.path.insert(0, ".")  # bench.py lives at the repo root

from bench import run_extras


def _spec(label, cap, fn):
    return (label, cap, fn, lambda v: {"metric": label, "value": v})


def test_every_spec_yields_one_entry():
    extras = []
    specs = [_spec(f"e{i}", 60, lambda i=i: i) for i in range(5)]
    run_extras(specs, extras, budget_s=1000.0, t_start=time.perf_counter())
    assert [e["metric"] for e in extras] == [f"e{i}" for i in range(5)]
    assert [e["value"] for e in extras] == list(range(5))


def test_slow_extra_times_out_alone_and_later_extras_run():
    extras = []

    def slow():
        time.sleep(3600)

    specs = [
        _spec("fast1", 60, lambda: 1),
        # cap far above the sleep; the SUB-BUDGET (remaining - reserve) must
        # bound it, not the cap
        _spec("slow", 3600, slow),
        _spec("fast2", 60, lambda: 2),
        _spec("fast3", 60, lambda: 3),
    ]
    t0 = time.perf_counter()
    # scaled-down budget geometry: slow's slot = 8 - 2*2 = 4 s
    run_extras(specs, extras, budget_s=8.0, t_start=t0,
               reserve_s=2.0, min_slot_s=0.5)
    by_label = {e["metric"]: e for e in extras}
    assert by_label["fast1"]["value"] == 1
    assert "error" in by_label["slow"]
    assert "sub-budget" in by_label["slow"]["error"]
    # the extras AFTER the timed-out one still produced values
    assert by_label["fast2"]["value"] == 2
    assert by_label["fast3"]["value"] == 3


def test_exhausted_budget_yields_skip_markers_not_absence():
    extras = []
    specs = [_spec("a", 60, lambda: 1), _spec("b", 60, lambda: 2)]
    run_extras(specs, extras, budget_s=0.0, t_start=time.perf_counter())
    assert len(extras) == 2
    assert all("skipped" in e.get("error", "") for e in extras)


def test_error_in_one_extra_does_not_stop_the_rest():
    extras = []

    def boom():
        raise RuntimeError("kaboom")

    specs = [_spec("ok1", 60, lambda: 1), _spec("bad", 60, boom),
             _spec("ok2", 60, lambda: 2)]
    run_extras(specs, extras, budget_s=1000.0, t_start=time.perf_counter())
    assert extras[0]["value"] == 1
    assert "kaboom" in extras[1]["error"]
    assert extras[2]["value"] == 2
