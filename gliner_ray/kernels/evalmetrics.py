"""Micro span-P/R/F1 — the reference evaluation protocol.

Mirrors ``gliner/evaluation/evaluator.py:52-121``: predictions and
golds are identity tuples ``(label, (start, end), doc_idx)``; per-type
set intersection gives tp/pred/true counts; micro-average sums the
counts; zero denominators yield 0.0 (``_prf_divide`` with
``zero_division='warn'`` semantics, minus the warning noise).

This is the acceptance metric for the engine: triple/mention P and R
must be ≥ 0.95 vs the reference-semantics oracle (BASELINE.json).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Hashable, Iterable, Sequence


def extract_tp_actual_correct(
    y_true: Iterable[Sequence],
    y_pred: Iterable[Sequence],
) -> tuple[list[int], list[int], list[int], list[str]]:
    """Per-type (pred, tp, true) counts — ``evaluator.py:52-73``.

    Items are ``(type_name, (start, end), idx)`` or any
    ``(type, key..., idx)`` identity tuple.
    """
    entities_true: dict[Hashable, set] = defaultdict(set)
    entities_pred: dict[Hashable, set] = defaultdict(set)
    for item in y_true:
        entities_true[item[0]].add(tuple(item[1:]))
    for item in y_pred:
        entities_pred[item[0]].add(tuple(item[1:]))

    target_names = sorted(set(entities_true) | set(entities_pred))
    pred_sum, tp_sum, true_sum = [], [], []
    for name in target_names:
        t = entities_true.get(name, set())
        p = entities_pred.get(name, set())
        tp_sum.append(len(t & p))
        pred_sum.append(len(p))
        true_sum.append(len(t))
    return pred_sum, tp_sum, true_sum, target_names


def compute_prf(
    y_true: Iterable[Sequence],
    y_pred: Iterable[Sequence],
) -> dict[str, float]:
    """Micro precision/recall/F1 — ``evaluator.py:87-121`` semantics."""
    pred_sum, tp_sum, true_sum, _ = extract_tp_actual_correct(y_true, y_pred)
    tp = float(sum(tp_sum))
    pred = float(sum(pred_sum))
    true = float(sum(true_sum))
    precision = tp / pred if pred else 0.0
    recall = tp / true if true else 0.0
    denom = precision + recall
    f_score = 2 * precision * recall / denom if denom else 0.0
    return {"precision": precision, "recall": recall, "f_score": f_score}


def triple_prf(
    golden: Iterable[tuple[str, str, str]],
    predicted: Iterable[tuple[str, str, str]],
) -> dict[str, float]:
    """Set-based triple P/R/F1 — ``multitask/relation_extraction.py:240-269``
    (tp/fp/fn on ``"s <> p <> o"`` string identity)."""
    g = set(golden)
    p = set(predicted)
    tp = len(g & p)
    precision = tp / len(p) if p else 0.0
    recall = tp / len(g) if g else 0.0
    denom = precision + recall
    return {
        "precision": precision,
        "recall": recall,
        "f_score": 2 * precision * recall / denom if denom else 0.0,
    }
