"""Bench extras scheduler invariants (VERDICT r3 #2).

BENCH_r03 shipped with serving-device TimeoutError'd and softmax-fidelity
absent entirely: the old harness handed each extra the WHOLE remaining
budget, so one slow compile starved everything after it — and even with
sub-budgets, serial cold compiles through the relay cannot fit any sane
budget. These tests pin the current contract: every spec yields exactly one
entry, a slow extra times out at its OWN sub-budget, later extras still run
inside their reserve, and PREPS (param build + AOT compile) run on
background daemon threads ahead of the measure cursor so compiles overlap
measures.
"""
import sys
import threading
import time

sys.path.insert(0, ".")  # bench.py lives at the repo root

from bench import _DaemonPool, run_extras


def _spec(label, cap, fn):
    """No-prep spec: measure() runs inline on the main thread."""
    return (label, cap, None, fn, lambda v: {"metric": label, "value": v})


def _pspec(label, cap, prep, measure):
    return (label, cap, prep, measure,
            lambda v: {"metric": label, "value": v})


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
    # first pass records the sub-budget timeout; the second-chance pass may
    # re-run the inline measure once and re-record it as a retry-slot timeout
    assert ("sub-budget" in by_label["slow"]["error"]
            or "retry slot" in by_label["slow"]["error"])
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


# ---------------------------------------------------------------------------
# prep path: background build/compile overlapping the measure cursor
# ---------------------------------------------------------------------------

def test_preps_run_in_background_and_feed_measures():
    extras = []
    started = []

    def make_prep(i):
        def prep():
            started.append((i, threading.current_thread() is
                            threading.main_thread()))
            time.sleep(0.05)
            return {"v": i * 10}
        return prep

    specs = [_pspec(f"p{i}", 60, make_prep(i), lambda ctx: ctx["v"])
             for i in range(4)]
    run_extras(specs, extras, budget_s=1000.0, t_start=time.perf_counter())
    assert [e["value"] for e in extras] == [0, 10, 20, 30]
    # every prep ran OFF the main thread
    assert started and all(not on_main for _, on_main in started)


def test_preps_overlap_prior_measures():
    """With a prefetch window, spec B's prep must complete DURING spec A's
    (slow) measure — i.e. the total wall time is ~max(measure, prep), not
    the sum."""
    extras = []
    order = []

    def prep_b():
        order.append("prep_b_start")
        time.sleep(0.4)
        order.append("prep_b_done")
        return {}

    def measure_a():
        order.append("measure_a_start")
        time.sleep(0.5)
        order.append("measure_a_done")
        return 1

    specs = [_spec("a", 60, measure_a),
             _pspec("b", 60, prep_b, lambda ctx: 2)]
    t0 = time.perf_counter()
    run_extras(specs, extras, budget_s=1000.0, t_start=t0)
    wall = time.perf_counter() - t0
    assert [e["value"] for e in extras] == [1, 2]
    # b's prep started before a's measure finished and the wall time shows
    # the overlap (serial would be >= 0.9s)
    assert order.index("prep_b_start") < order.index("measure_a_done")
    assert wall < 0.85, f"prep did not overlap measure: {wall:.2f}s {order}"


def test_slow_prep_times_out_alone():
    extras = []

    def slow_prep():
        time.sleep(3600)

    specs = [
        _spec("fast1", 60, lambda: 1),
        _pspec("slowprep", 3600, slow_prep, lambda ctx: 99),
        _spec("fast2", 60, lambda: 2),
    ]
    run_extras(specs, extras, budget_s=8.0, t_start=time.perf_counter(),
               reserve_s=2.0, min_slot_s=0.5)
    by_label = {e["metric"]: e for e in extras}
    assert by_label["fast1"]["value"] == 1
    # first-pass sub-budget timeout, possibly re-recorded by the retry pass
    assert ("sub-budget" in by_label["slowprep"]["error"]
            or "retry slot" in by_label["slowprep"]["error"])
    assert by_label["fast2"]["value"] == 2


def test_prep_exception_is_captured_not_fatal():
    extras = []

    def bad_prep():
        raise RuntimeError("prep kaboom")

    specs = [_pspec("bad", 60, bad_prep, lambda ctx: 1),
             _spec("ok", 60, lambda: 2)]
    run_extras(specs, extras, budget_s=1000.0, t_start=time.perf_counter())
    assert "prep kaboom" in extras[0]["error"]
    assert extras[1]["value"] == 2


def test_daemon_pool_workers_are_daemons():
    """A wedged prep thread must not block interpreter exit (the bench's
    stdout JSON is the artifact)."""
    names = []
    pool = _DaemonPool(1)
    fut = pool.submit(lambda: names.append(
        threading.current_thread().daemon))
    fut.result(timeout=5)
    assert names == [True]


# ---------------------------------------------------------------------------
# second-chance pass: a prep that outlives its slot is re-measured at the end
# ---------------------------------------------------------------------------

def test_second_chance_remeasures_prep_that_finished_late():
    """Spec A's prep (cold compile) outlives its 1s slot; spec B's measure
    gives the daemon time to finish; the trailing pass must REPLACE A's
    timeout entry with a real value."""
    extras = []

    def slow_prep():
        time.sleep(2.5)
        return {"v": 42}

    specs = [
        _pspec("coldcompile", 1, slow_prep, lambda ctx: ctx["v"]),
        _spec("other", 60, lambda: time.sleep(2.0) or 7),
    ]
    run_extras(specs, extras, budget_s=60.0, t_start=time.perf_counter(),
               reserve_s=2.0, min_slot_s=0.5)
    by_label = {e["metric"]: e for e in extras}
    assert by_label["coldcompile"]["value"] == 42, extras
    assert by_label["other"]["value"] == 7


def test_second_chance_keeps_error_when_prep_never_finishes():
    extras = []

    def wedged_prep():
        time.sleep(3600)

    specs = [
        _pspec("wedged", 2, wedged_prep, lambda ctx: 1),
        _spec("other", 60, lambda: 2),
    ]
    run_extras(specs, extras, budget_s=30.0, t_start=time.perf_counter(),
               reserve_s=2.0, min_slot_s=0.5)
    by_label = {e["metric"]: e for e in extras}
    # first pass times out at the sub-budget; the retry pass waits once more
    # under its own alarm and re-records the timeout
    assert ("sub-budget" in by_label["wedged"]["error"]
            or "retry slot" in by_label["wedged"]["error"])
    assert by_label["other"]["value"] == 2


def test_list_render_extends_extras():
    """A spec whose render returns a LIST (the merged fidelity spec) yields
    one extras entry per element, in place."""
    extras = []
    specs = [
        (_l := "fid", 60, None, lambda: (1, 2),
         lambda r: [{"metric": "fid-a", "value": r[0]},
                    {"metric": "fid-b", "value": r[1]}]),
        _spec("after", 60, lambda: 3),
    ]
    run_extras(specs, extras, budget_s=60.0, t_start=time.perf_counter(),
               reserve_s=2.0, min_slot_s=0.5)
    assert [e["metric"] for e in extras] == ["fid-a", "fid-b", "after"]


def test_measure_timeout_with_built_ctx_is_remeasured():
    """Prep succeeds fast, but the first MEASURE overruns its slot (relay
    dispatch-latency spike). The second-chance pass must reuse the built
    ctx and replace the error with a real value (2026-08-21 preprocess
    loss: the fut was already popped, so the old retry pass skipped it)."""
    extras = []
    calls = []

    def measure(ctx):
        calls.append(1)
        if len(calls) == 1:
            time.sleep(10)      # overruns the 1s slot only the first time
        return ctx["v"]

    specs = [
        _pspec("spiky", 1, lambda: {"v": 11}, measure),
        _spec("other", 60, lambda: 2),
    ]
    run_extras(specs, extras, budget_s=60.0, t_start=time.perf_counter(),
               reserve_s=0.5, min_slot_s=0.5)
    by_label = {e["metric"]: e for e in extras}
    assert by_label["spiky"]["value"] == 11, extras
    assert by_label["other"]["value"] == 2
    assert len(calls) == 2


def test_inline_timeout_is_rerun_after_queue_drains():
    """An inline (prep-less) spec starved past its slot re-runs in the
    second-chance pass (2026-08-21 host-decode loss)."""
    extras = []
    calls = []

    def starved():
        calls.append(1)
        if len(calls) == 1:
            time.sleep(10)
        return 7

    specs = [_spec("starved", 1, starved), _spec("other", 60, lambda: 2)]
    run_extras(specs, extras, budget_s=60.0, t_start=time.perf_counter(),
               reserve_s=0.5, min_slot_s=0.5)
    by_label = {e["metric"]: e for e in extras}
    assert by_label["starved"]["value"] == 7, extras
    assert by_label["other"]["value"] == 2


def test_failed_prep_surfaces_real_exception_after_wait_timeout():
    """A prep that RAISES after the spec's slot already expired must show
    the prep's own exception, not the stale waiting-timeout entry."""
    extras = []

    def late_failing_prep():
        time.sleep(2.0)
        raise RuntimeError("relay rejected program")

    specs = [
        _pspec("badprep", 1, late_failing_prep, lambda ctx: 1),
        _spec("other", 60, lambda: time.sleep(2.2) or 2),
    ]
    run_extras(specs, extras, budget_s=60.0, t_start=time.perf_counter(),
               reserve_s=0.5, min_slot_s=0.5)
    by_label = {e["metric"]: e for e in extras}
    assert "relay rejected program" in by_label["badprep"]["error"], extras
    assert by_label["other"]["value"] == 2


def test_retry_list_render_splices_without_shifting_earlier_entries():
    """A list-render spec that lands via the second-chance pass splices its
    entries over the single error slot; other retried entries (recorded at
    smaller indices) must still be replaced correctly."""
    extras = []
    slow_a = threading.Event()

    def prep_a():
        slow_a.wait(timeout=6.0)
        return 10

    def prep_b():
        time.sleep(3.0)
        return (20, 21)

    specs = [
        _pspec("a", 1, prep_a, lambda ctx: ctx),
        ("b", 1, prep_b, lambda ctx: ctx,
         lambda r: [{"metric": "b-1", "value": r[0]},
                    {"metric": "b-2", "value": r[1]}]),
        _spec("tail", 60, lambda: 5),
    ]
    threading.Timer(2.5, slow_a.set).start()
    run_extras(specs, extras, budget_s=60.0, t_start=time.perf_counter(),
               reserve_s=0.5, min_slot_s=0.5)
    by_label = {e["metric"]: e for e in extras}
    assert by_label["a"]["value"] == 10
    assert by_label["b-1"]["value"] == 20 and by_label["b-2"]["value"] == 21
    assert by_label["tail"]["value"] == 5
