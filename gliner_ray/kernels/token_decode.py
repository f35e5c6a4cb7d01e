"""Token-mode span decoding (start/end/inside head).

Mirrors the reference ``TokenDecoder.decode``
(``gliner/decoding/decoder.py:130-170``): model output ``(L, C, 3)``
holds start/end/inside logits per token per class; candidate spans
pair every above-threshold start with every above-threshold end of the
same class (``end >= start``), require all inside scores within the
span ≥ threshold, and score the span as the MINIMUM of (inside scores,
start score, end score). Greedy NMS is shared with the span decoder.

Candidate visit order matches the reference exactly: starts and ends
are visited in row-major ``(token, class)`` order from
``torch.where`` → here ``np.nonzero``.
"""

from __future__ import annotations

import numpy as np

from .decode import greedy_nms


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def decode_token_logits(
    n_tokens: int,
    id_to_class: dict[int, str],
    logits: np.ndarray,
    flat_ner: bool = True,
    threshold: float = 0.5,
    multi_label: bool = False,
) -> list[tuple]:
    """Decode one example's token-head logits ``(L, C, 3)``.

    Returns spans ``(start, end_inclusive, label, score)``.
    """
    logits = np.asarray(logits, dtype=np.float64)
    scores_start = _sigmoid(logits[:n_tokens, :, 0])
    scores_end = _sigmoid(logits[:n_tokens, :, 1])
    scores_inside = _sigmoid(logits[:n_tokens, :, 2])

    start_tok, start_cls = np.nonzero(scores_start > threshold)
    end_tok, end_cls = np.nonzero(scores_end > threshold)

    cands: list[tuple] = []
    for st, cls_st in zip(start_tok.tolist(), start_cls.tolist()):
        for ed, cls_ed in zip(end_tok.tolist(), end_cls.tolist()):
            if ed >= st and cls_st == cls_ed:
                ins = scores_inside[st : ed + 1, cls_st]
                if (ins < threshold).any():
                    continue
                span_score = float(
                    min(ins.min(), scores_start[st, cls_st], scores_end[ed, cls_st])
                )
                cands.append((st, ed, id_to_class[cls_st + 1], span_score))
    return greedy_nms(cands, flat_ner=flat_ner, multi_label=multi_label)
