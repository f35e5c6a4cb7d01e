"""Sequence packing: assign documents to fixed-token-budget training
sequences (the pre-tokenization packing step of an LLM data pipeline).

Greedy sequential first-fit per partition: docs are hash-partitioned
by id (one int-key shuffle — the only wide op), each partition sorts
its docs by id and fills sequences left-to-right, starting a new
sequence when the budget would overflow. A doc longer than the budget
gets a singleton sequence flagged ``oversize`` (callers chunk or drop).

Deterministic: sequence assignment depends only on (id, n_tokens,
budget, num_partitions) — never on block layout — so a resumed or
re-partitioned run packs identically (asserted in pytest). Per-part
state is one int cursor over a token-count array; the fill loop is
O(rows) over int64s (the text itself never enters the shuffle — only
(id, n_tokens) rows move)."""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels.tokenize import WORD_RE

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def count_tokens_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    n = [len(WORD_RE.findall(t)) for t in batch[text_col].to_pylist()]
    return batch.append_column("n_tokens", pa.array(n, pa.int64()))


def pack_sequences(
    docs_ds: "ray.data.Dataset",
    budget: int = 2048,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """→ (doc_id, n_tokens, seq_id, pos, oversize[0/1]).

    ``seq_id`` is ``"<part>:<k>"``; ``pos`` is the doc's slot within
    its sequence. Every input doc appears exactly once.
    """
    P = num_partitions

    if tokens_col is None:
        counted = docs_ds.map_batches(
            lambda t: count_tokens_batch(t, text_col), batch_format="pyarrow"
        )
        tokens_col = "n_tokens"
    else:
        counted = docs_ds

    def project(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": t[tokens_col].cast(pa.int64()),
                "part": pa.array(ids % P, pa.int64()),
            }
        )

    def pack_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        part = int(df["part"].iloc[0])
        toks = df["n_tokens"].to_numpy()
        seq = np.empty(len(df), np.int64)
        pos = np.empty(len(df), np.int64)
        oversize = np.zeros(len(df), np.int64)
        k, fill, p = 0, 0, 0
        for i, t in enumerate(toks):
            if t > budget:
                if fill > 0:
                    k += 1
                seq[i], pos[i], oversize[i] = k, 0, 1
                k += 1
                fill, p = 0, 0
                continue
            if fill + t > budget:
                k += 1
                fill, p = 0, 0
            seq[i], pos[i] = k, p
            fill += t
            p += 1
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": df["n_tokens"],
                "seq_id": [f"{part}:{s}" for s in seq],
                "pos": pos,
                "oversize": oversize,
            }
        )

    return (
        counted.map_batches(project, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack_part, batch_format="pandas")
    )
