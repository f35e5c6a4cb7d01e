"""Word tokenization with character offsets.

Semantics mirror the reference ``WhitespaceTokenSplitter``
(``gliner/data_processing/tokenizer.py:15-21``): the regex
``\\w+(?:[-_]\\w+)*|\\S`` yields word tokens (letters/digits/underscore
runs, optionally chained by ``-``/``_``) or single non-space symbols,
each with ``(start, end)`` char offsets — the same offsets the reference
uses to map span predictions back to char positions
(``gliner/model.py:164-190``, ``:428-447``).
"""

from __future__ import annotations

import re

import numpy as np

WORD_RE = re.compile(r"\w+(?:[-_]\w+)*|\S")


def tokenize_with_offsets(text: str) -> tuple[list[str], list[int], list[int]]:
    """Return (tokens, char_starts, char_ends) for one text."""
    tokens: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    for m in WORD_RE.finditer(text):
        tokens.append(m.group())
        starts.append(m.start())
        ends.append(m.end())
    return tokens, starts, ends


def tokenize_batch(
    texts: "np.ndarray | list[str]",
) -> tuple[list[list[str]], list[np.ndarray], list[np.ndarray]]:
    """Tokenize a batch of texts; offsets as int32 ndarrays (Arrow-friendly)."""
    all_tokens: list[list[str]] = []
    all_starts: list[np.ndarray] = []
    all_ends: list[np.ndarray] = []
    for t in texts:
        toks, starts, ends = tokenize_with_offsets(t)
        all_tokens.append(toks)
        all_starts.append(np.asarray(starts, dtype=np.int32))
        all_ends.append(np.asarray(ends, dtype=np.int32))
    return all_tokens, all_starts, all_ends


def sanitize_tokens(tokens: list[str]) -> list[str]:
    """Replace empty tokens with [PAD] — reference ``processor.py:84-97``.

    Our regex never yields empty tokens, but the contract is kept for
    records that arrive pre-tokenized (reference-format ``gliner_records``).
    """
    return [t if t else "[PAD]" for t in tokens]
