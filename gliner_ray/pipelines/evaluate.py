"""Distributed span-F1 evaluation — the reference eval protocol as a join.

The reference evaluates with set intersection over identity tuples
``(label, (start, end), doc_idx)`` and micro P/R/F1
(``gliner/evaluation/evaluator.py:52-121``). Distributed, that is:

- identity key: ``(doc_sha256, label, tok_start, tok_end)`` —
  key-carrying design replaces the reference's positional zip
  (``model.py:428-431``; SURVEY.md §2.10);
- per-type pred/gold counts: batch-local partial counts → tiny driver
  merge (no shuffle);
- true positives: distinct-key inner join, computed as a
  hash-partitioned anti-duplicate count (same coarse-partition +
  pandas pattern as ``stages/triples.dedup_triples``).

``evaluate_mentions`` returns the reference's metric dict plus the
per-type breakdown; parity with the sequential kernel
(``kernels/evalmetrics.compute_prf``) is unit-tested.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

KEY_COLS = ["doc_sha256", "label", "tok_start", "tok_end"]


def _keyed(ds: "ray.data.Dataset", side: str, num_partitions: int) -> "ray.data.Dataset":
    def prep(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({c: batch[c].to_pandas() for c in KEY_COLS})
        df = df.drop_duplicates()
        df["side"] = side
        h = pd.util.hash_pandas_object(df["doc_sha256"], index=False).to_numpy()
        df["part"] = (h % num_partitions).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    return ds.map_batches(prep, batch_format="pyarrow")


def evaluate_mentions(
    pred_ds: "ray.data.Dataset",
    gold_ds: "ray.data.Dataset",
    num_partitions: int = 16,
) -> dict:
    """Micro + per-type span P/R/F1 of predicted vs golden mentions."""
    union = _keyed(pred_ds, "p", num_partitions).union(
        _keyed(gold_ds, "g", num_partitions)
    )

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        # per (label): distinct pred keys, distinct gold keys, and keys
        # present on both sides (the set intersection of evaluator.py:52-73)
        dedup = g.drop_duplicates(KEY_COLS + ["side"])
        pivot = (
            dedup.assign(one=1)
            .pivot_table(index=KEY_COLS, columns="side", values="one",
                         aggfunc="max", fill_value=0)
            .reset_index()
        )
        if "p" not in pivot:
            pivot["p"] = 0
        if "g" not in pivot:
            pivot["g"] = 0
        pivot["tp"] = ((pivot["p"] == 1) & (pivot["g"] == 1)).astype(int)
        return pivot.groupby("label", as_index=False).agg(
            pred=("p", "sum"), true=("g", "sum"), tp=("tp", "sum")
        )

    parts = (
        union.groupby("part")
        .map_groups(count_part, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return {"precision": 0.0, "recall": 0.0, "f_score": 0.0, "per_type": {}}
    merged = parts.groupby("label", as_index=False).agg(
        pred=("pred", "sum"), true=("true", "sum"), tp=("tp", "sum")
    )
    tp, pred, true = merged["tp"].sum(), merged["pred"].sum(), merged["true"].sum()
    precision = tp / pred if pred else 0.0
    recall = tp / true if true else 0.0
    denom = precision + recall
    per_type = {
        row["label"]: {
            "precision": row["tp"] / row["pred"] if row["pred"] else 0.0,
            "recall": row["tp"] / row["true"] if row["true"] else 0.0,
        }
        for _, row in merged.iterrows()
    }
    return {
        "precision": float(precision),
        "recall": float(recall),
        "f_score": float(2 * precision * recall / denom) if denom else 0.0,
        "per_type": per_type,
    }


# --------------------------- multi-dataset benchmark aggregation


ZERO_SHOT_BENCHMARKS = [
    "mit-movie", "mit-restaurant", "CrossNER_AI", "CrossNER_literature",
    "CrossNER_music", "CrossNER_politics", "CrossNER_science",
]


def _format_table(results: dict[str, float], avg: float) -> str:
    """``{name:20}: {f1:.1%}`` rows + Average — the reference's
    ``tables.txt`` layout (``evaluation/evaluate.py:140-151``)."""
    table = ""
    for k, v in results.items():
        table += f"{k:20}: {v:.1%}\n"
    table += f"{'Average':20}: {avg:.1%}"
    return table


def benchmark_datasets(
    datasets: "dict[str, tuple]",
    zero_shot_benc: list[str] | None = None,
) -> dict:
    """The zero-shot-vs-rest benchmark protocol
    (``gliner/evaluation/evaluate.py:108-162``): evaluate each dataset
    (here a (pred_ds, gold_ds) Dataset pair instead of a data path),
    split the names into the zero-shot benchmark set and the rest,
    average each side, and render the two result tables.

    Distributed per dataset via :func:`evaluate_mentions`; only the
    per-dataset scalar F1s reach the aggregation (driver-trivial at
    any corpus size)."""
    if zero_shot_benc is None:
        zero_shot_benc = ZERO_SHOT_BENCHMARKS
    zero_shot_results: dict[str, float] = {}
    all_results: dict[str, float] = {}
    per_dataset: dict[str, dict] = {}
    for name, (pred_ds, gold_ds) in datasets.items():
        metrics = evaluate_mentions(pred_ds, gold_ds)
        per_dataset[name] = metrics
        if name in zero_shot_benc:
            zero_shot_results[name] = metrics["f_score"]
        else:
            all_results[name] = metrics["f_score"]
    avg_all = sum(all_results.values()) / len(all_results) if all_results else 0.0
    avg_zs = (
        sum(zero_shot_results.values()) / len(zero_shot_results)
        if zero_shot_results
        else 0.0
    )
    return {
        "all_results": all_results,
        "zero_shot_results": zero_shot_results,
        "avg_all": float(avg_all),
        "avg_zero_shot": float(avg_zs),
        "table_all": _format_table(all_results, avg_all),
        "table_zero_shot": _format_table(zero_shot_results, avg_zs),
        "per_dataset": per_dataset,
    }
