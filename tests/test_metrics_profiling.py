"""Metrics + profiling utilities."""
import numpy as np
import jax.numpy as jnp

from stgcma_tpu.metrics.stats import (avqa_type_accuracy, calculate_stats,
                                      d_prime)
from stgcma_tpu.runtime.profiling import StepMeters, cost_analysis


def test_calculate_stats_against_sklearn_semantics():
    rng = np.random.RandomState(0)
    n, c = 60, 4
    target = np.zeros((n, c))
    target[np.arange(n), rng.randint(0, c, n)] = 1
    output = rng.rand(n, c)
    stats = calculate_stats(output, target)
    assert len(stats) == c
    accs = {s["acc"] for s in stats}
    assert len(accs) == 1 and 0 <= stats[0]["acc"] <= 1
    for s in stats:
        assert 0 <= s["AP"] <= 1 and 0 <= s["auc"] <= 1
    # perfect classifier: AP = AUC = 1
    perfect = calculate_stats(target + rng.rand(n, c) * 1e-3, target)
    for s in perfect:
        assert s["AP"] > 0.99 and s["auc"] > 0.99
    assert abs(d_prime(0.5)) < 1e-9


def test_avqa_type_accuracy_buckets():
    preds = [1, 2, 3, 4]
    ans = [1, 0, 3, 0]
    types = [["Audio", "Counting"], ["Audio", "Counting"],
             ["Visual", "Location"], ["Audio-Visual", "Temporal"]]
    rep = avqa_type_accuracy(preds, ans, types)
    assert rep["Audio Counting"] == 50.0
    assert rep["Visual Location"] == 100.0
    assert rep["Audio-Visual Temporal"] == 0.0
    assert rep["Overall"] == 50.0
    assert rep["Audio"] == 50.0


def test_step_meters_and_cost_analysis():
    m = StepMeters(n_print_steps=1000)
    for _ in range(3):
        m.data_loaded(4)
        m.step_done(4, loss=1.0)
    rep = m.report()
    assert rep["loss"] == 1.0 and rep["per_sample_total_s"] >= 0

    ca = cost_analysis(lambda x: x @ x, jnp.ones((64, 64)))
    if ca:  # backend-dependent availability
        assert ca.get("flops", 0) > 0
