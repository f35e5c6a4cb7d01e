"""Char-offset → word-index span alignment.

Mirrors the reference ``process`` (``gliner/evaluation/evaluate.py:30-61``):
char-offset entity annotations become word-index, inclusive-end spans
with lowercased type — producing the reference record
``{"tokenized_text": words, "ner": [(start_word, end_word, type)]}``.

Two variants:

- :func:`align_reference` — the exact reference semantics (whitespace
  ``str.split``, offsets must land precisely on word boundaries, else
  the span's word index stays None — reproduced faithfully, including
  the quirk that a span ending mid-word is dropped).
- :func:`align_with_offsets` — the engine's tokenizer-aware version:
  any char span maps to the covering token range using the
  ``tokenize_with_offsets`` offset arrays (used when golden data comes
  from char-level annotations over arbitrary text).
"""

from __future__ import annotations

from bisect import bisect_right

from .tokenize import tokenize_with_offsets


def align_reference(sentence: str, entities: list[dict]) -> dict:
    """Exact ``evaluate.py:30-61`` semantics."""
    words = sentence.split()
    ner = []
    for entity in entities:
        start_char, end_char = entity["pos"]
        start_word = end_word = None
        char_count = 0
        for i, word in enumerate(words):
            if char_count == start_char:
                start_word = i
            if char_count + len(word) == end_char:
                end_word = i
                break
            char_count += len(word) + 1  # + space
        ner.append((start_word, end_word, entity["type"].lower()))
    return {"tokenized_text": words, "ner": ner}


def align_with_offsets(text: str, spans: list[tuple[int, int, str]]) -> dict:
    """Tokenizer-aware alignment: char span → covering token range.

    ``spans`` are ``(start_char, end_char, label)``; output ner spans
    are word-index inclusive-end (reference convention). Spans with no
    covered token are dropped.
    """
    tokens, starts, ends = tokenize_with_offsets(text)
    ner = []
    for cs, ce, label in spans:
        # first token whose end > cs; last token whose start < ce
        i = bisect_right(ends, cs)
        j = bisect_right(starts, ce - 1) - 1 if ce > cs else -1
        if i < len(tokens) and j >= i:
            ner.append((i, j, label.lower()))
    return {"tokenized_text": tokens, "ner": ner}
