"""Benchmark decontamination: flag corpus documents that share any
word n-gram with a benchmark/eval set (the standard 8-13-gram overlap
protocol used before training-data release).

Scale shape: the benchmark side is small BY DEFINITION (eval sets are
KBs-to-MBs vs a 100 TB corpus), so its n-gram set is the canonical
broadcast small side — built once with a distributed gram pass, then
``ray.put`` once and read per task; the corpus side streams through one
vectorized ``map_batches``. A guard raises if the benchmark gram set
exceeds ``max_bench_grams`` instead of silently OOMing the driver.

Grams are lowercased ``\\w+`` word n-grams joined by single spaces —
the exact tokenization the DuckDB oracle reproduces.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_WORD_RE = re.compile(r"\w+")


def _doc_grams(text: str, n: int) -> list[str]:
    w = _WORD_RE.findall(text.lower())
    return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]


def benchmark_gram_set(
    bench_ds: "ray.data.Dataset",
    n: int = 8,
    text_col: str = "text",
    max_bench_grams: int = 50_000_000,
) -> set:
    """Distinct benchmark n-grams (distributed extraction + per-batch
    dedup; the global distinct happens in the driver set — bounded by
    the benchmark, not the corpus)."""

    def grams(t: pa.Table) -> pa.Table:
        seen: set[str] = set()
        for text in t[text_col].to_pylist():
            seen.update(_doc_grams(text, n))
        return pa.table({"gram": pa.array(sorted(seen), pa.string())})

    out: set = set()
    for batch in bench_ds.map_batches(grams, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        out.update(batch["gram"].to_pylist())
        if len(out) > max_bench_grams:
            raise ValueError(
                f"benchmark gram set exceeds {max_bench_grams}; "
                "this side must be broadcast-small — shard the benchmark"
            )
    return out


def ngram_contamination(
    docs_ds: "ray.data.Dataset",
    bench_ds: "ray.data.Dataset",
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bench_grams: int = 50_000_000,
) -> "ray.data.Dataset":
    """→ (doc_id, n_hits, n_distinct_hits, contaminated[0/1]).

    ``n_hits`` counts every contaminated gram POSITION (duplicates
    count), ``n_distinct_hits`` the distinct contaminated grams.
    """
    import ray

    bench_ref = ray.put(
        benchmark_gram_set(bench_ds, n=n, text_col=text_col,
                           max_bench_grams=max_bench_grams)
    )

    def flag(t: pa.Table) -> pa.Table:
        bench: set = ray.get(bench_ref)
        hits, dhits, flags = [], [], []
        for text in t[text_col].to_pylist():
            gs = _doc_grams(text, n)
            hit = [g for g in gs if g in bench]
            hits.append(len(hit))
            dhits.append(len(set(hit)))
            flags.append(1 if hit else 0)
        return pa.table(
            {
                id_col: t[id_col],
                "n_hits": pa.array(hits, pa.int64()),
                "n_distinct_hits": pa.array(dhits, pa.int64()),
                "contaminated": pa.array(flags, pa.int64()),
            }
        )

    return docs_ds.map_batches(flag, batch_format="pyarrow")
