"""Text-analysis operators over a ``documents(doc_id, text, ...)`` table.

All stages are vectorized ``map_batches`` transforms (compiled regexes
cached per actor/process; no Python row loops beyond the per-doc regex
scan, which IS the work). Integer-count outputs are used for the
DuckDB-oracle queries so float rounding can't break value-hash parity;
composite float scores live in separate rows-only outputs.
"""

from __future__ import annotations

import hashlib
import re
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

from ..kernels.tokenize import WORD_RE

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

# the exact pattern the oracle SQL uses via regexp_extract_all
TOKEN_PATTERN = r"\w+(?:[-_]\w+)*|\S"
_PUNCT_RE = re.compile(r"[^\w\s]")
_WORD_ONLY_RE = re.compile(r"[A-Za-z]+")

# tiny per-language stopword lists for the n-gram/stopword heuristic
# language identifier (public common-word lists; langdetect-style
# routing per reference tokenizer.py:148-187 is a model-based analog)
STOPWORDS: dict[str, frozenset] = {
    "en": frozenset("the of and to in is was for that it with as his on be at by i".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf ist im dem nicht".split()),
    "fr": frozenset("de la le et les des en un du une que est pour qui dans par".split()),
    "es": frozenset("de la que el en y a los del se las por un para con no una".split()),
    "it": frozenset("di e il la che in a per un del con non una dei le si".split()),
}
_EN_STOP = STOPWORDS["en"]


def token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens — whitespace+symbol token count (WORD_RE),
    one vectorized RE2 kernel per batch (``pc.count_substring_regex``,
    parity-pinned vs the Python findall — round-4 verdict item #6)."""
    import pyarrow.compute as pc

    n = pc.count_substring_regex(batch["text"], WORD_RE.pattern)
    return pa.table(
        {"doc_id": batch["doc_id"], "n_tokens": pc.cast(n, pa.int64())}
    )


def text_stats_batch(batch: pa.Table) -> pa.Table:
    """Integer quality-signal counts per doc (oracle-friendly).
    n_chars/n_words/n_punct are vectorized Arrow kernels (RE2 —
    identical to the DuckDB oracle's regexp engine); the stopword
    count keeps the per-doc loop because it needs the extracted word
    SET, which Arrow's count kernel can't express."""
    import pyarrow.compute as pc

    texts = batch["text"].to_pylist()
    n_stop = [
        sum(1 for w in _WORD_ONLY_RE.findall(t) if w.lower() in _EN_STOP)
        for t in texts
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(batch["text"]), pa.int64()),
            "n_words": pc.cast(
                pc.count_substring_regex(batch["text"], _WORD_ONLY_RE.pattern),
                pa.int64(),
            ),
            "n_punct": pc.cast(
                pc.count_substring_regex(batch["text"], _PUNCT_RE.pattern),
                pa.int64(),
            ),
            "n_stopwords": pa.array(n_stop, pa.int64()),
        }
    )


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Composite heuristic quality score in [0,1] (Gopher/C4-style
    length, punctuation-ratio and stopword-ratio signals)."""
    stats = text_stats_batch(batch)
    n_chars = stats["n_chars"].to_numpy().astype(np.float64)
    n_words = stats["n_words"].to_numpy().astype(np.float64)
    n_punct = stats["n_punct"].to_numpy().astype(np.float64)
    n_stop = stats["n_stopwords"].to_numpy().astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_word_len = np.where(n_words > 0, (n_chars - n_punct) / np.maximum(n_words, 1), 0.0)
        punct_ratio = np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0)
        stop_ratio = np.where(n_words > 0, n_stop / np.maximum(n_words, 1), 0.0)
    length_ok = np.clip(n_words / 50.0, 0.0, 1.0)           # reward ≥50 words
    word_len_ok = ((mean_word_len >= 3) & (mean_word_len <= 12)).astype(np.float64)
    punct_ok = np.clip(1.0 - 4.0 * punct_ratio, 0.0, 1.0)   # penalize >25% punct
    stop_ok = np.clip(stop_ratio / 0.06, 0.0, 1.0)          # natural text has stopwords
    score = 0.3 * length_ok + 0.2 * word_len_ok + 0.25 * punct_ok + 0.25 * stop_ok
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "quality_score": pa.array(score, pa.float64()),
            "punct_ratio": pa.array(punct_ratio, pa.float64()),
            "stopword_ratio": pa.array(stop_ratio, pa.float64()),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Stopword-vote language ID (n-gram heuristic; deterministic).

    The distributed analog of the reference's langdetect routing
    (``tokenizer.py:148-187``) without the external model: the language
    whose stopword list hits the most tokens wins; ties and zero hits
    fall back to 'und' (undetermined).
    """
    texts = batch["text"].to_pylist()
    langs = []
    for t in texts:
        words = [w.lower() for w in _WORD_ONLY_RE.findall(t[:4000])]
        best, best_hits = "und", 0
        for lang in sorted(STOPWORDS):
            hits = sum(1 for w in words if w in STOPWORDS[lang])
            if hits > best_hits:
                best, best_hits = lang, hits
        langs.append(best)
    return pa.table({"doc_id": batch["doc_id"], "lang_pred": pa.array(langs, pa.string())})


def sha256_fingerprint_batch(batch: pa.Table) -> pa.Table:
    """doc_id, sha256(text) — the exact content fingerprint (the
    engine's row invariant, BASELINE.json)."""
    shas = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
    return pa.table({"doc_id": batch["doc_id"], "sha256": pa.array(shas, pa.string())})


# Winnowing fingerprint constants: polynomial base, its modular
# inverse mod 2^64 (257 is odd → invertible), shared VERBATIM with the
# DuckDB oracle (corpus_ops.FINGERPRINT_SQL).
FP_BASE = 257
FP_BASE_INV = 18374966859414961921  # pow(257, -1, 2**64)


def rolling_fingerprint_batch(batch: pa.Table, window: int = 32, keep: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: polynomial rolling hash
    over codepoint windows, keep the ``keep`` smallest DISTINCT hashes
    (a robust near-dup sketch; Schleimer et al. winnowing, public
    algorithm).

    O(n) and fully vectorized via the prefix-sum identity
    ``h_i = B^i · (S_i − S_{i−w}) mod 2^64`` with
    ``S_i = Σ_{k≤i} c_k · B^{−k}`` — uint64 wraparound IS the modulus,
    and 257 is odd so ``B^{−1}`` exists (same content-defined-hash
    idiom as ``substring_dups``). Codepoint-based (not UTF-8 bytes) so
    a SQL twin using ``ord(substr(...))`` reproduces every value
    exactly. Docs shorter than the window hash whole
    (``w = min(window, n)``); empty docs emit an empty list."""
    B = np.uint64(FP_BASE)
    texts = batch["text"].to_pylist()
    maxn = max((len(t) for t in texts), default=0)
    # shared power tables: pows[k] = B^k, ipows[k] = B^{-k} (mod 2^64)
    pows = np.ones(maxn + 1, np.uint64)
    ipows = np.ones(maxn + 1, np.uint64)
    if maxn:
        np.cumprod(np.full(maxn, B, np.uint64), out=pows[1:])
        np.cumprod(np.full(maxn, np.uint64(FP_BASE_INV), np.uint64), out=ipows[1:])
    out = []
    for t in texts:
        cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        n = len(cp)
        if n == 0:
            out.append([])
            continue
        w = min(window, n)
        S = np.cumsum(cp * ipows[:n], dtype=np.uint64)
        idx = np.arange(w - 1, n)
        prev = np.where(idx >= w, S[np.maximum(idx - w, 0)], np.uint64(0))
        h = pows[idx] * (S[idx] - prev)
        out.append(np.unique(h)[:keep].tolist())
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(out, pa.list_(pa.uint64()))}
    )


# PII patterns — shared verbatim with the DuckDB oracle (RE2 and
# Python `re` agree on these constructs: classes, \b, {m,n}, leftmost
# non-overlapping sub). Redaction is SEQUENTIAL (email → ip → digits)
# and each stage counts matches on the text as redacted so far, so a
# digit run inside an email local-part is counted once, as <EMAIL>.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_DIGITS = r"\b\d{9,}\b"
_PII_STAGES = (
    (re.compile(PII_EMAIL), "<EMAIL>"),
    (re.compile(PII_IPV4), "<IP>"),
    (re.compile(PII_DIGITS), "<ID>"),
)


def pii_redact_batch(batch: pa.Table) -> pa.Table:
    """doc_id, redacted text + per-category match counts (emails,
    IPv4 addresses, ≥9-digit runs). The scrub every training-data
    pipeline runs before publishing a corpus."""
    texts = batch["text"].to_pylist()
    out, n_email, n_ip, n_digit = [], [], [], []
    for t in texts:
        counts = []
        for rx, repl in _PII_STAGES:
            t, n = rx.subn(repl, t)
            counts.append(n)
        out.append(t)
        n_email.append(counts[0])
        n_ip.append(counts[1])
        n_digit.append(counts[2])
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "redacted": pa.array(out, pa.string()),
            "n_emails": pa.array(n_email, pa.int64()),
            "n_ips": pa.array(n_ip, pa.int64()),
            "n_ids": pa.array(n_digit, pa.int64()),
        }
    )


_LOWER_WORD_RE = re.compile(r"\w+")


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals as exact integer counts:
    duplicate-word and duplicate-word-2-gram counts per doc (the
    "fraction of duplicate n-grams" filters, kept integral so the
    DuckDB oracle hash-compares exactly)."""
    texts = batch["text"].to_pylist()
    n_words, n_dup_words, n_2grams, n_dup_2grams = [], [], [], []
    for t in texts:
        w = _LOWER_WORD_RE.findall(t.lower())
        n_words.append(len(w))
        n_dup_words.append(len(w) - len(set(w)))
        g2 = list(zip(w, w[1:]))
        n_2grams.append(len(g2))
        n_dup_2grams.append(len(g2) - len(set(g2)))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "n_dup_words": pa.array(n_dup_words, pa.int64()),
            "n_2grams": pa.array(n_2grams, pa.int64()),
            "n_dup_2grams": pa.array(n_dup_2grams, pa.int64()),
        }
    )


# ------------------------------------------------- distinctive terms

# ≥2 letters; the exact pattern the oracle SQL uses via regexp_extract_all
_TERM_RE = re.compile(r"[A-Za-z][A-Za-z]+")

# broadcast the (term → document frequency) table only below this many
# distinct terms; above it, attach df via a distributed term-key join
DF_BROADCAST_LIMIT = 1_000_000


def term_tf_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → one row per distinct lowercased term per doc
    with its in-doc frequency."""
    from collections import Counter

    doc_ids: list = []
    terms: list = []
    tfs: list = []
    for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        c = Counter(w.lower() for w in _TERM_RE.findall(t))
        doc_ids.extend([did] * len(c))
        terms.extend(c.keys())
        tfs.extend(c.values())
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        }
    )


def top_terms(
    ds: "ray.data.Dataset",
    k: int = 3,
    num_partitions: int = 16,
    df_broadcast_limit: int = DF_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Per-doc top-``k`` distinctive terms: ranked by (tf desc, df asc,
    term asc) — frequent in the document, rare in the corpus. All-integer
    ranking (no idf float), so the DuckDB oracle hash-compares exactly.

    Two streaming passes over ``ds`` (recomputing tf beats a full
    ``materialize()`` of the corpus-sized (doc, term, tf) table):

    1. document frequency — (doc, term) rows are distinct per doc by
       construction, so each batch pre-aggregates term → n_docs, the
       partials shuffle on a ``crc32(term) % P`` int key, and per-part
       pandas sums produce the vocabulary-sized df table.
    2. attach df + per-doc top-k — df is broadcast (``ray.put``, read
       once per task) under ``df_broadcast_limit`` distinct terms, else
       attached via the generic term-key ``hash_join`` and the top-k
       runs per doc group. Either way each batch emits ≤ k rows/doc.
    """
    import zlib

    import pandas as pd
    import ray

    def df_partial(t: pa.Table) -> pa.Table:
        tb = term_tf_batch(t)
        agg = (
            pd.DataFrame({"term": tb["term"].to_pylist()})
            .groupby("term", as_index=False)
            .size()
            .rename(columns={"size": "df"})
        )
        agg["part"] = [
            zlib.crc32(s.encode("utf-8")) % num_partitions for s in agg["term"]
        ]
        return pa.Table.from_pandas(agg, preserve_index=False)

    def df_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", as_index=False)["df"].sum()
        return out

    df_ds = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(df_final, batch_format="pandas")
    ).materialize()  # vocabulary-sized, reused below

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        # docs hash-partition on doc_id % P (a doc's terms live in one
        # part after the term join is re-keyed by doc) — never a raw
        # doc-cardinality map_groups, which pays a per-group Python
        # call at millions of docs; one vectorized sort + grouped head
        # ranks every doc in the part
        return (
            g.sort_values(
                ["doc_id", "tf", "df", "term"],
                ascending=[True, False, True, True],
            )
            .groupby("doc_id", sort=False)
            .head(k)
        )

    if df_ds.count() <= df_broadcast_limit:
        df_map = {}
        for b in df_ds.iter_batches(batch_format="pyarrow"):
            df_map.update(zip(b["term"].to_pylist(), b["df"].to_pylist()))
        df_ref = ray.put(df_map)

        def topk_batch(t: pa.Table) -> pa.Table:
            lookup = ray.get(df_ref)
            tb = term_tf_batch(t).to_pandas()
            tb["df"] = tb["term"].map(lookup).astype("int64")
            # one vectorized sort + grouped head instead of a per-doc
            # groupby.apply (the apply path was the slowest bench query)
            out = tb.sort_values(
                ["doc_id", "tf", "df", "term"],
                ascending=[True, False, True, True],
            ).groupby("doc_id", sort=False).head(k)
            return pa.Table.from_pandas(out, preserve_index=False)

        return ds.map_batches(topk_batch, batch_format="pyarrow")

    from .joins import hash_join

    tf_ds = ds.map_batches(term_tf_batch, batch_format="pyarrow")
    joined = hash_join(
        tf_ds, df_ds, left_on="term", right_on="term",
        num_partitions=num_partitions,
    )
    # hash_join keeps the key column under the LEFT name; restore order
    def add_docpart(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        return t.append_column(
            "docpart", pa.array(d % num_partitions, pa.int64())
        )

    return (
        joined.map_batches(add_docpart, batch_format="pyarrow")
        .groupby("docpart")
        .map_groups(rank_part, batch_format="pandas")
        .select_columns(["doc_id", "term", "tf", "df"])
    )


def apply(ds: "ray.data.Dataset", fn, **kwargs) -> "ray.data.Dataset":
    return ds.map_batches(fn, batch_format="pyarrow", **kwargs)


def char_bigram_model(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "np.ndarray":
    """Train a character-bigram LM over the corpus in ONE streaming
    pass (the KenLM-style quality-filter model, byte alphabet): every
    batch folds its texts into a single 256×256 int64 count partial
    (512 KiB fixed — metadata-sized regardless of rows), partials sum
    driver-side. Returns the raw count matrix; smoothing happens at
    scoring time so the counts stay mergeable across corpora."""
    import pyarrow as pa_

    def partial(t: pa_.Table) -> pa_.Table:
        counts = np.zeros(256 * 256, dtype=np.int64)
        for txt in t[text_col].to_pylist():
            b = np.frombuffer(txt.encode("utf-8"), np.uint8)
            if len(b) < 2:
                continue
            idx = b[:-1].astype(np.int64) * 256 + b[1:]
            counts += np.bincount(idx, minlength=256 * 256)
        return pa_.table(
            {"counts": pa_.array([counts.tobytes()], pa_.large_binary())}
        )

    total = np.zeros(256 * 256, dtype=np.int64)
    for row in ds.map_batches(partial, batch_format="pyarrow").iter_rows():
        total += np.frombuffer(row["counts"], dtype=np.int64)
    return total.reshape(256, 256)


def perplexity_batch_fn(counts: "np.ndarray"):
    """Scoring closure for ``map_batches``: per-doc byte-bigram
    perplexity under the trained model with add-one smoothing —
    ``logp(b|a) = log((c[a,b]+1) / (c[a,·]+256))``. The 512 KiB logp
    table is closure-captured (``ray.put`` small-side at cluster
    scale); scoring is one vectorized gather + mean per doc."""
    import pyarrow as pa_

    row_tot = counts.sum(axis=1, keepdims=True).astype(np.float64)
    logp = np.log((counts + 1.0) / (row_tot + 256.0))

    def score(t: pa_.Table) -> pa_.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out = np.empty(t.num_rows, dtype=np.float64)
        for i, txt in enumerate(t["text"].to_pylist()):
            b = np.frombuffer(txt.encode("utf-8"), np.uint8)
            if len(b) < 2:
                out[i] = float("nan")
                continue
            lp = logp[b[:-1].astype(np.int64), b[1:].astype(np.int64)]
            out[i] = float(np.exp(-lp.mean()))
        return pa_.table(
            {
                "doc_id": pa_.array(ids, pa_.int64()),
                "perplexity": pa_.array(out, pa_.float64()),
            }
        )

    return score


def lm_perplexity(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """Two-pass corpus perplexity scoring: train
    (:func:`char_bigram_model`, metadata-sized partials) then one
    streaming score pass. Deterministic; high perplexity = unusual
    byte sequences (the classic LM quality-filter signal)."""
    counts = char_bigram_model(ds, text_col)
    return ds.map_batches(perplexity_batch_fn(counts), batch_format="pyarrow")


# ------------------------------------------------- BM25 full-text search


def bm25_topk(
    ds: "ray.data.Dataset",
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """Distributed BM25 top-k full-text search — the retrieval op a
    corpus engine needs next to ANN: two streaming passes, no index
    materialization, no shuffle at all.

    1. corpus statistics: each batch emits ONE fixed-size partial row
       (n_docs, docs-with-terms, total token count, df per query
       term); the driver combines the metadata-sized partials into
       N, avgdl and per-term Robertson idf
       ``ln((N − df + 0.5)/(df + 0.5) + 1)``;
    2. scoring: each batch scores its own docs (tf via the same
       ``_TERM_RE`` tokenization the oracle SQL reproduces with
       ``regexp_extract_all``) and keeps only its LOCAL top-k by the
       final comparator; the driver merges ≤ k·n_batches candidate
       rows.

    Scores round to 5 dp on BOTH engines and the comparator is
    (rounded score DESC, doc_id ASC) end-to-end — per-batch pruning
    under the final comparator is exact, and rounded ties resolve
    identically on both sides. At 100 TB both passes stream with
    fixed-size outputs; the only driver state is ≤ k rows per batch."""
    from collections import Counter

    terms = sorted({t.lower() for t in query_terms})
    Q = len(terms)

    def stats_partial(t: pa.Table) -> pa.Table:
        n = nd = sl = 0
        dfs = [0] * Q
        for txt in t["text"].to_pylist():
            toks = [w.lower() for w in _TERM_RE.findall(txt)]
            n += 1
            if toks:
                nd += 1
                sl += len(toks)
            present = set(toks)
            for i, q in enumerate(terms):
                if q in present:
                    dfs[i] += 1
        cols: dict = {
            "n": pa.array([n], pa.int64()),
            "nd": pa.array([nd], pa.int64()),
            "sl": pa.array([sl], pa.int64()),
        }
        for i in range(Q):
            cols[f"df{i}"] = pa.array([dfs[i]], pa.int64())
        return pa.table(cols)

    parts = ds.map_batches(stats_partial, batch_format="pyarrow").take_all()
    N = sum(r["n"] for r in parts)
    nd = sum(r["nd"] for r in parts)
    sl = sum(r["sl"] for r in parts)
    if N == 0 or nd == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    avgdl = sl / nd
    idf = {
        terms[i]: float(
            np.log(
                (N - sum(r[f"df{i}"] for r in parts) + 0.5)
                / (sum(r[f"df{i}"] for r in parts) + 0.5)
                + 1.0
            )
        )
        for i in range(Q)
    }

    def score_partial(t: pa.Table) -> pa.Table:
        ids, scores = [], []
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = [w.lower() for w in _TERM_RE.findall(txt)]
            if not toks:
                continue
            dl = len(toks)
            c = Counter(toks)
            s = 0.0
            for q in terms:
                tf = c.get(q, 0)
                if tf:
                    s += idf[q] * tf * (k1 + 1.0) / (
                        tf + k1 * (1.0 - b + b * dl / avgdl)
                    )
            if s > 0.0:
                ids.append(did)
                scores.append(round(s, 5))
        top = sorted(zip(ids, scores), key=lambda r: (-r[1], r[0]))[:k]
        return pa.table(
            {
                "doc_id": pa.array([r[0] for r in top], pa.int64()),
                "score": pa.array([r[1] for r in top], pa.float64()),
            }
        )

    cands = ds.map_batches(score_partial, batch_format="pyarrow").take_all()
    final = sorted(cands, key=lambda r: (-r["score"], r["doc_id"]))[:k]
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in final], pa.int64()),
            "score": pa.array([r["score"] for r in final], pa.float64()),
        }
    )


# -------------------------------------------- PMI co-occurrence pairs


def term_pmi_pairs(
    ds: "ray.data.Dataset",
    k: int = 20,
    min_co: int = 50,
    vocab_size: int = 256,
) -> pa.Table:
    """Top-``k`` term pairs by pointwise mutual information
    ``ln(co_df·N / (df_a·df_b))`` over document-level presence — the
    corpus-statistics op behind collocation mining and tokenizer/vocab
    diagnostics.

    Scale shape: per-doc pair generation is quadratic in distinct
    terms, so the pair space is bounded FIRST to the ``vocab_size``
    highest-df terms (vocabulary-sized broadcast set, the documented
    partitioning assumption — exact whenever |vocab| ≤ vocab_size,
    as in the synthetic corpus; beyond it, rare-tail terms are
    excluded by construction). Then:

    1. one pass: per-batch distinct-presence partials → vocab-sized
       df table (driver-combined, broadcast);
    2. one pass: per-batch pair Counters over the bounded vocab →
       ≤ vocab_size²/2-row groupby — never a doc-scale shuffle;
    3. PMI + top-k on the pair-bounded aggregate.
    """
    from collections import Counter
    from itertools import combinations

    from ray.data.aggregate import Sum

    def df_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        n = 0
        for txt in t["text"].to_pylist():
            n += 1
            c.update({w.lower() for w in _TERM_RE.findall(txt)})
        tbl = pa.table(
            {
                "term": pa.array(list(c.keys()) + [""], pa.string()),
                "df": pa.array(list(c.values()) + [n], pa.int64()),
                "is_n": pa.array([False] * len(c) + [True], pa.bool_()),
            }
        )
        return tbl

    agg = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby(["term", "is_n"])
        .aggregate(Sum("df", alias_name="df"))
        .take_all()  # vocabulary-sized (+1 sentinel row)
    )
    N = next(r["df"] for r in agg if r["is_n"])
    df = {r["term"]: r["df"] for r in agg if not r["is_n"]}
    vocab = set(
        sorted(df, key=lambda t: (-df[t], t))[:vocab_size]
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            present = sorted(
                {w.lower() for w in _TERM_RE.findall(txt)} & vocab
            )
            c.update(combinations(present, 2))
        return pa.table(
            {
                "a": pa.array([p[0] for p in c], pa.string()),
                "b": pa.array([p[1] for p in c], pa.string()),
                "co": pa.array(list(c.values()), pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("co", alias_name="co"))
        .take_all()  # ≤ vocab_size²/2 rows — vocab-bounded, not doc-scale
    )
    scored = [
        (
            round(float(np.log(r["co"] * N / (df[r["a"]] * df[r["b"]]))), 5),
            r["a"],
            r["b"],
        )
        for r in pairs
        if r["co"] >= min_co
    ]
    top = sorted(scored, key=lambda x: (-x[0], x[1], x[2]))[:k]
    return pa.table(
        {
            "a": pa.array([t[1] for t in top], pa.string()),
            "b": pa.array([t[2] for t in top], pa.string()),
            "pmi": pa.array([t[0] for t in top], pa.float64()),
        }
    )


def vocab_build(
    ds: "ray.data.Dataset",
    min_count: int = 5,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Corpus vocabulary with a frequency cutoff and dense global IDs —
    the tokenizer-training precursor op: term → (vocab_id, cf, df),
    cf = total corpus frequency, df = document frequency, vocab_id =
    ``ROW_NUMBER() OVER (ORDER BY cf DESC, term ASC)`` (the reference
    builds its label/token vocabularies driver-side when assembling
    datasets; here the build is distributed end-to-end).

    Two shuffles, both bounded by VOCABULARY size (Heaps' law —
    sublinear in corpus rows), never by corpus size:

    1. per-batch (term, cf, df) partials (documents are whole within a
       batch, so the df partial is exact) shuffle on
       ``crc32(term) % num_partitions``; per-part pandas sums produce
       the vocabulary-sized table with the cutoff applied in-part
       (HAVING cf >= min_count prunes the huge hapax tail BEFORE the
       second shuffle).
    2. ID assignment mirrors the dense-rank engine
       (``queries/relational.py: q_order_dense_rank``): shuffle the
       pruned vocabulary on cf; each cf-group sorts terms
       lexicographically and emits its local 0-based index plus the
       group size n (constant per group); a metadata-sized scan
       collects the distinct (cf, n) pairs, the driver prefix-sums
       them cf-descending into per-cf offsets, and a final cheap
       map_batches adds ``offsets[cf] + lrank + 1``.

    Skew note: the hottest cf group is the cutoff bucket (cf ==
    min_count) — bounded by vocabulary size, not corpus rows.
    """
    import zlib

    import pandas as pd
    import ray

    def partial(t: pa.Table) -> pa.Table:
        tb = term_tf_batch(t).to_pandas()
        agg = tb.groupby("term", as_index=False).agg(
            cf=("tf", "sum"), df=("tf", "size")
        )
        agg["part"] = [
            zlib.crc32(s.encode("utf-8")) % num_partitions
            for s in agg["term"]
        ]
        return pa.Table.from_pandas(agg, preserve_index=False)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", as_index=False)[["cf", "df"]].sum()
        return out[out["cf"] >= min_count]

    vocab = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )

    def assign_local(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("term", ignore_index=True)
        g["lrank"] = np.arange(len(g), dtype=np.int64)
        g["n"] = np.int64(len(g))
        return g

    local = (
        vocab.groupby("cf")
        .map_groups(assign_local, batch_format="pandas")
        .materialize()  # vocabulary-sized; reused by the scan below
    )

    _EMPTY_CFN = pa.table(
        {"cf": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )

    def cf_n(t: pa.Table) -> pa.Table:
        # zero-row pandas-shuffle blocks can arrive schema-less
        if t.num_rows == 0 or "cf" not in t.column_names:
            return _EMPTY_CFN
        u = np.unique(
            np.stack(
                [
                    t["cf"].to_numpy(zero_copy_only=False),
                    t["n"].to_numpy(zero_copy_only=False),
                ],
                axis=1,
            ),
            axis=0,
        )
        return pa.table(
            {"cf": pa.array(u[:, 0], pa.int64()),
             "n": pa.array(u[:, 1], pa.int64())}
        )

    pairs: dict[int, int] = {}
    for b in local.map_batches(cf_n, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        pairs.update(zip(b["cf"].to_pylist(), b["n"].to_pylist()))
    offsets: dict[int, int] = {}
    cum = 0
    for cf_val in sorted(pairs, reverse=True):
        offsets[cf_val] = cum
        cum += pairs[cf_val]
    off_ref = ray.put(offsets)  # distinct-cf-sized, read once per task

    _EMPTY_OUT = pa.table(
        {
            "term": pa.array([], pa.string()),
            "vocab_id": pa.array([], pa.int64()),
            "cf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
        }
    )
    if not pairs:  # cutoff killed everything — keep the schema
        import ray.data as rd

        return rd.from_arrow(_EMPTY_OUT)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cf" not in t.column_names:
            return _EMPTY_OUT
        off = ray.get(off_ref)
        base = pd.Series(t["cf"].to_numpy(zero_copy_only=False)).map(off)
        vid = (
            base.to_numpy(np.int64)
            + t["lrank"].to_numpy(zero_copy_only=False)
            + 1
        )
        return pa.table(
            {
                "term": t["term"],
                "vocab_id": pa.array(vid, pa.int64()),
                "cf": pa.array(t["cf"].to_numpy(zero_copy_only=False), pa.int64()),
                "df": pa.array(t["df"].to_numpy(zero_copy_only=False), pa.int64()),
            }
        )

    return local.map_batches(finish, batch_format="pyarrow")
