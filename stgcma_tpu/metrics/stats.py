"""Evaluation statistics (pure numpy; no sklearn dependency).

Replaces utilities/stats.py:6-68 (per-class AP/AUC + global argmax accuracy,
d_prime) and AVQA's 9-question-type accuracy breakdown
(AVQA/traintest_adapt_avqa.py:289-373).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
from scipy import stats as _sstats


def d_prime(auc: float) -> float:
    return _sstats.norm().ppf(auc) * np.sqrt(2.0)


def _average_precision(target: np.ndarray, score: np.ndarray) -> float:
    """sklearn-equivalent average_precision_score (step interpolation)."""
    order = np.argsort(-score, kind="mergesort")
    t = target[order]
    tp = np.cumsum(t)
    fp = np.cumsum(1 - t)
    n_pos = t.sum()
    if n_pos == 0:
        return float("nan")
    precision = tp / np.maximum(tp + fp, 1e-12)
    recall = tp / n_pos
    # sum over points where recall increases
    prev_recall = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - prev_recall) * precision))


def _roc_auc(target: np.ndarray, score: np.ndarray) -> float:
    """Mann-Whitney U formulation with tie handling."""
    pos = score[target == 1]
    neg = score[target == 0]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    ranks = _sstats.rankdata(np.concatenate([pos, neg]))
    r_pos = ranks[: len(pos)].sum()
    u = r_pos - len(pos) * (len(pos) + 1) / 2.0
    return float(u / (len(pos) * len(neg)))


def calculate_stats(output: np.ndarray, target: np.ndarray) -> List[Dict]:
    """Per-class AP/AUC + global argmax accuracy, same report structure as the
    reference (utilities/stats.py:11-68)."""
    classes_num = target.shape[-1]
    acc = float(np.mean(np.argmax(output, 1) == np.argmax(target, 1)))
    out = []
    for k in range(classes_num):
        ap = _average_precision(target[:, k], output[:, k])
        auc = _roc_auc(target[:, k], output[:, k])
        out.append({"AP": ap, "auc": auc, "acc": acc})
    return out


# ---------------------------------------------------------------------------
# AVQA 9-type accuracy (Audio/Visual/AV x question templates)
# ---------------------------------------------------------------------------

AVQA_TYPE_KEYS = [
    ("Audio", "Counting"), ("Audio", "Comparative"),
    ("Visual", "Counting"), ("Visual", "Location"),
    ("Audio-Visual", "Existential"), ("Audio-Visual", "Counting"),
    ("Audio-Visual", "Location"), ("Audio-Visual", "Comparative"),
    ("Audio-Visual", "Temporal"),
]


def avqa_type_accuracy(predictions: Sequence[int], answers: Sequence[int],
                       types: Sequence[Sequence[str]]) -> Dict[str, float]:
    """Per-question-type accuracies as in AVQA/traintest_adapt_avqa.py:289-373.
    `types[i]` is the parsed json 'type' field, e.g. ['Audio', 'Counting']."""
    buckets: Dict[str, List[int]] = {f"{m} {t}": [] for m, t in AVQA_TYPE_KEYS}
    total = []
    for p, a, ty in zip(predictions, answers, types):
        correct = int(p == a)
        total.append(correct)
        key = f"{ty[0]} {ty[1]}"
        if key in buckets:
            buckets[key].append(correct)
    report = {k: (float(np.mean(v)) * 100 if v else float("nan"))
              for k, v in buckets.items()}
    report["Overall"] = float(np.mean(total)) * 100 if total else float("nan")
    for modality in ("Audio", "Visual", "Audio-Visual"):
        vals = [c for (m, t) in AVQA_TYPE_KEYS if m == modality
                for c in buckets[f"{m} {t}"]]
        report[modality] = float(np.mean(vals)) * 100 if vals else float("nan")
    return report


class AverageMeter:
    """Running average (utilities/util.py AverageMeter equivalent)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self):
        return self.sum / max(self.count, 1)
