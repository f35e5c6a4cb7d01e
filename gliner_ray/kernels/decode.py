"""Span decoding: sigmoid-threshold candidate extraction + greedy NMS.

This is the correctness-critical kernel of the engine. Semantics mirror
the reference exactly:

- overlap predicates: ``gliner/decoding/utils.py:1-21`` (equal
  boundaries count as overlap unless ``multi_label``; nested mode allows
  containment).
- greedy NMS: ``gliner/decoding/decoder.py:31-51`` — stable sort by
  descending score (Python ``sorted`` stability preserved), first-fit
  keep, final re-sort by span start.
- dense decode: ``gliner/decoding/decoder.py:54-128`` — candidates are
  ``sigmoid(logits) > threshold`` visited in row-major ``(s, k, c)``
  order (matching ``torch.where``), spans whose end exceeds the sentence
  are skipped, span ``(s, k)`` covers tokens ``s .. s+k`` inclusive.

Span tuples here are ``(start, end_inclusive, label, score)`` in word
(token) indices — the reference's span record minus the generated-label
slot (decoder mode is a separate optional stage).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np


def is_nested(idx1: Sequence[int], idx2: Sequence[int]) -> bool:
    """True if one span contains the other (``decoding/utils.py:1-3``)."""
    return (idx1[0] <= idx2[0] and idx1[1] >= idx2[1]) or (
        idx2[0] <= idx1[0] and idx2[1] >= idx1[1]
    )


def has_overlapping(idx1, idx2, multi_label: bool = False) -> bool:
    """Flat-NER overlap (``decoding/utils.py:5-11``)."""
    if (idx1[0], idx1[1]) == (idx2[0], idx2[1]):
        return not multi_label
    if idx1[0] > idx2[1] or idx2[0] > idx1[1]:
        return False
    return True


def has_overlapping_nested(idx1, idx2, multi_label: bool = False) -> bool:
    """Nested-NER overlap: overlap that is NOT containment (``utils.py:14-20``)."""
    if (idx1[0], idx1[1]) == (idx2[0], idx2[1]):
        return not multi_label
    if (idx1[0] > idx2[1] or idx2[0] > idx1[1]) or is_nested(idx1, idx2):
        return False
    return True


def greedy_nms(
    spans: list[tuple],
    flat_ner: bool = True,
    multi_label: bool = False,
) -> list[tuple]:
    """Greedy non-maximum suppression over candidate spans.

    Mirrors ``decoder.py:31-51``: stable sort by -score, first-fit keep
    against already-kept spans, then re-sort kept spans by start index.
    ``spans`` items are ``(start, end, label, score)``; score is last.
    """
    has_ov = has_overlapping if flat_ner else has_overlapping_nested
    new_list: list[tuple] = []
    # Python sorted() is stable → ties keep candidate-emission order,
    # matching the reference exactly (decoder.py:38).
    span_prob = sorted(spans, key=lambda x: -x[-1])
    for b in span_prob:
        keep = True
        for kept in new_list:
            if has_ov(b, kept, multi_label):
                keep = False
                break
        if keep:
            new_list.append(b)
    new_list.sort(key=lambda x: x[0])
    return new_list


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def decode_logits(
    n_tokens: int,
    id_to_class: dict[int, str],
    logits: np.ndarray,
    flat_ner: bool = True,
    threshold: float = 0.5,
    multi_label: bool = False,
) -> list[tuple]:
    """Dense decode of one example's span logits ``(L, K, C)``.

    Candidate ``(s, k, c)`` → span ``(s, s+k, id_to_class[c+1], prob)``;
    skip when ``s + k + 1 > n_tokens`` (span exceeds sentence,
    ``decoder.py:108-113``); then greedy NMS. Label ids are 1-based
    (0 = pad), matching ``decoder.py:121``.
    """
    probs = _sigmoid(np.asarray(logits, dtype=np.float64))
    s_idx, k_idx, c_idx = np.nonzero(probs > threshold)
    cands: list[tuple] = []
    for s, k, c in zip(s_idx.tolist(), k_idx.tolist(), c_idx.tolist()):
        if s + k + 1 > n_tokens:
            continue
        cands.append((s, s + k, id_to_class[c + 1], float(probs[s, k, c])))
    return greedy_nms(cands, flat_ner=flat_ner, multi_label=multi_label)


def decode_candidates(
    candidates: Iterable[tuple],
    n_tokens: int,
    flat_ner: bool = True,
    threshold: float = 0.5,
    multi_label: bool = False,
) -> list[tuple]:
    """Sparse decode: same semantics as :func:`decode_logits` when the
    scorer already knows which (span, label) pairs exceed ~0 probability.

    ``candidates`` are ``(s, k, label, prob)`` tuples that MUST be
    ordered by ``(s, k, label_id)`` ascending — the row-major visit
    order of the dense path — so NMS tie-breaking is identical. The
    production scorer emits this sparse form to avoid materializing the
    dense ``(L, K, C)`` grid per row (SURVEY.md §7, stage [C]).
    """
    cands: list[tuple] = []
    for s, k, label, prob in candidates:
        if prob <= threshold:
            continue
        if s + k + 1 > n_tokens:
            continue
        cands.append((s, s + k, label, float(prob)))
    return greedy_nms(cands, flat_ner=flat_ner, multi_label=multi_label)
