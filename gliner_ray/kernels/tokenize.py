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

# CJK ranges: hiragana+katakana, CJK ext A, CJK unified, hangul
_CJK = "぀-ヿ㐀-䶿一-鿿가-힯"
# character-level segmentation for CJK scripts (the jieba/mecab-less
# standard fallback): one token per ideograph/kana/hangul syllable,
# while non-CJK word runs keep whitespace-splitter semantics. The
# word-run branch excludes CJK chars so a Latin run never swallows an
# adjoining ideograph.
CJK_WORD_RE = re.compile(
    rf"[{_CJK}]|(?:(?![{_CJK}])\w)+(?:[-_](?:(?![{_CJK}])\w)+)*|(?![{_CJK}])\S"
)


def tokenize_with_offsets_cjk(text: str) -> tuple[list[str], list[int], list[int]]:
    """CJK-aware splitter (``tokenizer.py:24-266`` analog — the
    jieba/mecab splitters' role, implemented as deterministic
    char-class segmentation): (tokens, char_starts, char_ends)."""
    tokens: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    for m in CJK_WORD_RE.finditer(text):
        tokens.append(m.group())
        starts.append(m.start())
        ends.append(m.end())
    return tokens, starts, ends


#: lang code → splitter type, the per-language dispatch the reference
#: does via its splitter registry (``tokenizer.py:269-296``)
LANG_SPLITTERS = {
    "zh": "cjk",
    "ja": "cjk",
    "ko": "cjk",
}


def route_for_lang(lang: str | None) -> str:
    return LANG_SPLITTERS.get((lang or "").lower()[:2], "whitespace")


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
        elif splitter_type == "cjk":
            self._call = tokenize_with_offsets_cjk
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


class LangRoutedTokenizer:
    """Actor-pool stage: (text, lang) batches → per-row tokens+offsets
    through the lang-routed splitter (``route_for_lang``). Splitters
    are built ONCE per actor in ``__init__`` — the promised
    per-``lang`` actor-pool routing (a real mecab/jieba model would be
    loaded here); ``__call__`` dispatches per row with zero setup cost.

    Usage::

        ds.map_batches(LangRoutedTokenizer, batch_format="pyarrow",
                       concurrency=(1, N))
    """

    def __init__(self, text_col: str = "text", lang_col: str = "lang"):
        self.text_col = text_col
        self.lang_col = lang_col
        self.splitters = {
            name: WordsSplitter(name) for name in ("whitespace", "cjk")
        }

    def __call__(self, batch):
        import pyarrow as pa

        texts = batch[self.text_col].to_pylist()
        langs = (
            batch[self.lang_col].to_pylist()
            if self.lang_col in batch.column_names
            else [None] * len(texts)
        )
        toks, starts, ends, used = [], [], [], []
        for text, lang in zip(texts, langs):
            name = route_for_lang(lang)
            triples = list(self.splitters[name](text))
            toks.append([t for t, _, _ in triples])
            starts.append([s for _, s, _ in triples])
            ends.append([e for _, _, e in triples])
            used.append(name)
        return batch.append_column(
            "tokens", pa.array(toks, pa.list_(pa.string()))
        ).append_column(
            "tok_start", pa.array(starts, pa.list_(pa.int32()))
        ).append_column(
            "tok_end", pa.array(ends, pa.list_(pa.int32()))
        ).append_column("splitter", pa.array(used, pa.string()))


def sanitize_tokens(tokens: list[str]) -> list[str]:
    """Replace empty tokens with [PAD] — reference ``processor.py:84-97``.

    Our regex never yields empty tokens, but the contract is kept for
    records that arrive pre-tokenized (reference-format ``gliner_records``).
    """
    return [t if t else "[PAD]" for t in tokens]
