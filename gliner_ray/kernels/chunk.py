"""Document chunking (the engine's replacement for reference truncation).

The reference silently truncates inputs at ``max_len`` words
(``gliner/data_processing/processor.py:350-352``). At 100 TB we cannot
drop text: documents are split into windows of ``max_len`` tokens with
``overlap`` tokens of lookback, keyed ``(repo, path, commit,
chunk_id)``; mentions rediscovered in an overlap are removed by the
exact-dedup stage. Pure function shared by the distributed stage and
the single-threaded oracle so both sides chunk identically
(SURVEY.md §7.4 "Chunking vs reference truncation").
"""

from __future__ import annotations


def chunk_token_ranges(n_tokens: int, max_len: int, overlap: int) -> list[tuple[int, int]]:
    """Token-index windows ``[start, end)`` covering ``0..n_tokens``.

    Windows are ``max_len`` long; consecutive windows share ``overlap``
    tokens so any span of width ≤ overlap is fully contained in at
    least one window. ``overlap < max_len`` required for progress.
    """
    if n_tokens <= 0:
        return [(0, 0)]
    if overlap >= max_len:
        raise ValueError(f"overlap {overlap} must be < max_len {max_len}")
    ranges: list[tuple[int, int]] = []
    start = 0
    while True:
        end = min(start + max_len, n_tokens)
        ranges.append((start, end))
        if end >= n_tokens:
            return ranges
        start = end - overlap
