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


# ---------------------------------------------------------------------
# Deterministic lexicon segmenter (forward maximum matching) — the
# classic dictionary-based CJK word segmentation baseline, and the
# dependency-free analog of the reference's jieba splitter for Chinese
# (``tokenizer.py:24-266``): greedy longest lexicon match at each CJK
# position, single-char fallback, whitespace-splitter semantics for
# everything non-CJK. The lexicon ships as a fixture (common Mandarin
# vocabulary, public knowledge) — a real deployment would load a full
# dictionary the same way, once per actor.
ZH_LEXICON = frozenset({
    "中国", "北京", "上海", "大学", "学生", "老师", "我们", "他们",
    "你们", "今天", "明天", "昨天", "时间", "工作", "学习", "研究",
    "计算机", "数据", "处理", "系统", "模型", "语言", "自然语言",
    "机器学习", "深度学习", "人工智能", "科学", "技术", "发展",
    "经济", "社会", "世界", "问题", "方法", "知识", "图谱",
    "知识图谱", "数据处理", "分布式",
})

_CJK_CHAR_RE = re.compile(rf"[{_CJK}]")


def tokenize_with_offsets_maxmatch(
    text: str,
    lexicon: frozenset[str] = ZH_LEXICON,
    max_word_len: int | None = None,
) -> tuple[list[str], list[int], list[int]]:
    """Forward-maximum-matching segmentation: at each CJK position take
    the LONGEST lexicon word starting there (so 自然语言 beats 语言),
    else a single char; non-CJK spans keep whitespace-splitter
    semantics. Deterministic, offset-exact, O(n · max_word_len)."""
    if max_word_len is None:
        max_word_len = max(map(len, lexicon), default=1)
    tokens: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    i, n = 0, len(text)
    while i < n:
        m = CJK_WORD_RE.match(text, i)
        if m is None:  # whitespace
            i += 1
            continue
        tok = m.group()
        if len(tok) == 1 and _CJK_CHAR_RE.match(tok):
            best = 1
            for length in range(min(max_word_len, n - i), 1, -1):
                if text[i : i + length] in lexicon:
                    best = length
                    break
            tok = text[i : i + best]
            tokens.append(tok)
            starts.append(i)
            ends.append(i + best)
            i += best
        else:
            tokens.append(tok)
            starts.append(m.start())
            ends.append(m.end())
            i = m.end()
    return tokens, starts, ends


#: lang code → splitter type, the per-language dispatch the reference
#: does via its splitter registry (``tokenizer.py:269-296``). Chinese
#: routes through the lexicon maxmatch segmenter (the jieba role);
#: ja/ko keep char-class segmentation (the mecab-less fallback).
LANG_SPLITTERS = {
    "zh": "maxmatch_zh",
    "ja": "cjk",
    "ko": "cjk",
}


def route_for_lang(lang: str | None) -> str:
    return LANG_SPLITTERS.get((lang or "").lower()[:2], "whitespace")


def _tokenize_with_offsets_regex(text: str) -> tuple[list[str], list[int], list[int]]:
    """Reference-semantics regex path (any unicode)."""
    spans = [m.span() for m in WORD_RE.finditer(text)]
    return [text[s:e] for s, e in spans], [s for s, _ in spans], [e for _, e in spans]


# ASCII char-class tables for the vectorized fast path: exact
# equivalents of re's \w / \s on ASCII input
_ASCII_WORD = np.zeros(128, dtype=bool)
for _c in (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
):
    _ASCII_WORD[ord(_c)] = True
_ASCII_WS = np.zeros(128, dtype=bool)
# the exact ASCII subset of unicode \s per `re`: \t\n\v\f\r plus the
# FS/GS/RS/US separators \x1c-\x1f plus space (verified by enumeration)
for _c in "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f ":
    _ASCII_WS[ord(_c)] = True
_HYPHEN = ord("-")


def tokenize_with_offsets(text: str) -> tuple[list[str], list[int], list[int]]:
    """Return (tokens, char_starts, char_ends) for one text.

    Vectorized ASCII fast path (~4× the regex walk — tokenization is
    the measured hot spot of the fused extract stage): the pattern
    ``\\w+(?:[-_]\\w+)*|\\S`` reduces, since ``_`` is itself ``\\w``, to
    "maximal runs of word chars joined by word-adjacent hyphens; every
    other non-space char is a single token" — expressible as numpy
    char-class masks + run-boundary diffs. Non-ASCII input falls back
    to the regex (identical semantics, property-tested)."""
    if not text.isascii():
        return _tokenize_with_offsets_regex(text)
    if not text:
        return [], [], []
    starts_a, ends_a = _ascii_spans(np.frombuffer(text.encode("ascii"), dtype=np.uint8))
    starts = starts_a.tolist()
    ends = ends_a.tolist()
    return [text[s:e] for s, e in zip(starts, ends)], starts, ends


def _ascii_spans(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Token (start, end) arrays over an ASCII uint8 buffer — the
    vectorized core shared by the single-text and mega-batch paths."""
    n = len(arr)
    w = _ASCII_WORD[arr]
    # a hyphen with word chars on BOTH sides continues the token
    joiner = arr == _HYPHEN
    if joiner.any():
        prev_w = np.empty(n, dtype=bool)
        prev_w[0] = False
        prev_w[1:] = w[:-1]
        next_w = np.empty(n, dtype=bool)
        next_w[-1] = False
        next_w[:-1] = w[1:]
        joiner &= prev_w & next_w
        tokchar = w | joiner
    else:
        tokchar = w
    # boundary-mask formulation (all linear ops — no argsort merge):
    # a token STARTS at i iff i is non-ws and (i is the first char, or
    # the previous char is outside this token: ws, or not both chars
    # are word/joiner chars of one run); symmetrically for ENDS.
    nonws = ~_ASCII_WS[arr]
    inrun = np.empty(n, dtype=bool)  # tokchar[i-1] & tokchar[i]
    inrun[0] = False
    np.logical_and(tokchar[:-1], tokchar[1:], out=inrun[1:])
    starts_m = nonws & ~inrun
    ends_m = np.empty(n, dtype=bool)
    ends_m[:-1] = nonws[:-1] & ~inrun[1:]
    ends_m[-1] = nonws[-1]
    return np.flatnonzero(starts_m), np.flatnonzero(ends_m) + 1


def tokenize_batch_safe(texts: list) -> list:
    """Batch tokenization with per-text error capture: each entry is
    (tokens, starts, ends) or the Exception to quarantine.

    Deliberately per-text, not a joined mega-pass: measured on the
    bench corpus, one 1.5 MB buffer makes the boolean-mask working set
    (~12 MB across 8 arrays) fall out of L2 and the "vectorized" pass
    runs 1.8× SLOWER than 4096 cache-resident small calls."""
    out: list = [None] * len(texts)
    for i, t in enumerate(texts):
        if isinstance(t, str):
            try:
                out[i] = tokenize_with_offsets(t)
            except Exception as e:  # noqa: BLE001 — quarantine contract
                out[i] = e
        else:
            out[i] = TypeError(f"content is {type(t).__name__}, not str")
    return out


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
        elif splitter_type == "maxmatch_zh":
            self._call = tokenize_with_offsets_maxmatch
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
            name: WordsSplitter(name)
            for name in ("whitespace", "cjk", "maxmatch_zh")
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
