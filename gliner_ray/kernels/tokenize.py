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


class WordsSplitter:
    """Tokenizer registry — mirrors the reference dispatch
    (``gliner/data_processing/tokenizer.py:269-296``).

    Only ``whitespace`` is self-contained; the language-specific
    splitters (spacy/mecab/janome/jieba/camel/hanlp/stanza,
    ``tokenizer.py:24-266``) require models not present in this
    container and are import-gated: requesting one raises
    ``NotImplementedError`` naming the missing dependency. In the
    engine they would run as per-``lang`` actor pools (stateful model
    load in ``__init__``), routed by partitioning on the ``lang``
    column (SURVEY.md §2.2).
    """

    GATED = {
        "spacy": "spacy",
        "mecab": "mecab-python3",
        "janome": "janome",
        "jieba": "jieba",
        "camel": "camel-tools",
        "hanlp": "hanlp",
        "stanza": "stanza",
        "multilang": "langdetect",
    }

    def __init__(self, splitter_type: str = "whitespace"):
        if splitter_type == "whitespace":
            self._call = tokenize_with_offsets
        elif splitter_type in self.GATED:
            dep = self.GATED[splitter_type]
            try:
                __import__(dep.replace("-", "_"))
            except ImportError as e:
                raise NotImplementedError(
                    f"splitter '{splitter_type}' needs '{dep}', which is "
                    "not available in this environment"
                ) from e
            raise NotImplementedError(
                f"splitter '{splitter_type}' is registered but not wired"
            )
        else:
            raise ValueError(f"unknown splitter_type: {splitter_type!r}")

    def __call__(self, text: str):
        tokens, starts, ends = self._call(text)
        # reference yields (token, start, end) triples
        yield from zip(tokens, starts, ends)


def sanitize_tokens(tokens: list[str]) -> list[str]:
    """Replace empty tokens with [PAD] — reference ``processor.py:84-97``.

    Our regex never yields empty tokens, but the contract is kept for
    records that arrive pre-tokenized (reference-format ``gliner_records``).
    """
    return [t if t else "[PAD]" for t in tokens]
