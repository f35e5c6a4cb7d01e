"""Pure (no-Ray) kernels: tokenization, span decode/NMS, eval metrics.

These are the correctness core — the semantic contract mirrored from the
reference (see docstrings for file:line citations). Built and unit-tested
before any distribution, per SURVEY.md §7.1 step 3.
"""

from .tokenize import tokenize_with_offsets, WORD_RE  # noqa: F401
from .decode import (  # noqa: F401
    has_overlapping,
    has_overlapping_nested,
    is_nested,
    greedy_nms,
    decode_logits,
    decode_candidates,
)
from .evalmetrics import compute_prf, extract_tp_actual_correct  # noqa: F401
