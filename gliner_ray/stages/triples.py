"""Stage [E] — triple materialization + exact dedup.

Rule-generated (subj, pred, obj) triples (north star pred set):

- ``(repo, repo-contains-file, repo/path)`` from the files table
- ``(repo/path, file-defines-entity, entity_id)`` from linked mentions
- ``(entity_id, entity-typed-as, label)`` from linked mentions

The triple record is the engine's analog of the reference's relation
output ``{"source", "relation", "target", "score"}``
(``gliner/multitask/relation_extraction.py:88-109``; string identity
``"s <> p <> o"`` at ``:236``).

Exact dedup = batch-local pre-aggregation (drop duplicate keys, keep
max score inside each ``map_batches``) followed by a global
``groupby(subj, pred, obj, repo).max(score)`` over the pre-shrunk
rows — the partial-then-final combine pattern that keeps the shuffle
small at scale.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("repo", pa.string()),
        ("bucket", pa.int32()),
        ("score", pa.float64()),
    ]
)


def files_to_triples(batch: pa.Table) -> pa.Table:
    """files rows → repo-contains-file triples (vectorized, batch-local
    dedup via pandas)."""
    import pandas as pd

    repo = batch["repo"].to_pandas()
    df = pd.DataFrame(
        {
            "subj": repo,
            "pred": "repo-contains-file",
            "obj": repo + "/" + batch["path"].to_pandas(),
            "repo": repo,
            "bucket": batch["bucket"].to_pandas(),
            "score": 1.0,
        }
    ).drop_duplicates(["subj", "pred", "obj", "repo"])
    return pa.Table.from_pandas(df, preserve_index=False).cast(TRIPLE_SCHEMA)


def mentions_to_triples(batch: pa.Table) -> pa.Table:
    """linked mentions → defines/typed-as triples (vectorized,
    batch-local max-score combine)."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "repo": batch["repo"].to_pandas(),
            "path": batch["path"].to_pandas(),
            "bucket": batch["bucket"].to_pandas(),
            "entity_id": batch["entity_id"].to_pandas(),
            "label": batch["label"].to_pandas(),
            "score": batch["score"].to_pandas(),
        }
    )
    df = df[df["entity_id"].notna()]
    file_subj = df["repo"] + "/" + df["path"]
    t1 = pd.DataFrame(
        {
            "subj": file_subj,
            "pred": "file-defines-entity",
            "obj": df["entity_id"],
            "repo": df["repo"],
            "bucket": df["bucket"],
            "score": df["score"],
        }
    )
    t2 = pd.DataFrame(
        {
            "subj": df["entity_id"],
            "pred": "entity-typed-as",
            "obj": df["label"],
            "repo": df["repo"],
            "bucket": df["bucket"],
            "score": df["score"],
        }
    )
    out = (
        pd.concat([t1, t2], ignore_index=True)
        .groupby(["subj", "pred", "obj", "repo"], as_index=False)
        .agg(bucket=("bucket", "max"), score=("score", "max"))
    )
    return pa.Table.from_pandas(out, preserve_index=False).cast(TRIPLE_SCHEMA)


def dedup_and_write_triples(
    triples_ds: "ray.data.Dataset", triples_dir: str, num_partitions: int = 32
) -> dict[int, int]:
    """One shuffle for dedup AND the partitioned write.

    Partition key is ``hash(subj) % P`` (one small int — duplicates
    share subj, so they colocate); a coarse-partition sort shuffle on
    an int key measured ~15× cheaper than string-key grouping, and
    ``P`` (32) gives full write parallelism, unlike grouping by the 16
    coarse buckets. Each group task dedups with one vectorized pandas
    groupby and writes ``part=K/part-0.parquet`` atomically, returning
    row counts for metrics. ``bucket`` (= f(repo)) stays a COLUMN for
    per-repo-range consumers; stage-2 outputs are cheap to rebuild, so
    unlike the stage-1 mention checkpoint they don't need bucket-dir
    resume granularity.
    """
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    def add_part(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch["subj"].to_pandas(), index=False
        ).to_numpy()
        return batch.append_column(
            "part", pa.array((h % num_partitions).astype("int32"), pa.int32())
        )

    def dedup_write_group(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["part"].iloc[0])
        out = g.drop(columns=["part"]).groupby(
            ["subj", "pred", "obj", "repo"], as_index=False
        ).agg(bucket=("bucket", "max"), score=("score", "max"))
        d = os.path.join(triples_dir, f"part={p}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, ".part-0.parquet.tmp")
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(d, "part-0.parquet"))
        return pd.DataFrame({"part": [p], "rows": [len(out)]})

    stats = (
        triples_ds.map_batches(add_part, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(dedup_write_group, batch_format="pandas")
        .to_pandas()
    )
    return {int(r["part"]): int(r["rows"]) for _, r in stats.iterrows()}


def dedup_triples(
    triples_ds: "ray.data.Dataset", num_partitions: int = 32
) -> "ray.data.Dataset":
    """Global exact dedup: explicit hash partitioning + per-partition
    vectorized pandas dedup.

    ~15× faster than a direct 4-string-column
    ``groupby(...).aggregate(Max)`` at 32 CPUs: the shuffle key is one
    small int (``hash(subj) % P`` — subj alone colocates every
    duplicate, since duplicates share the full key), and the per-group
    work is a single vectorized pandas groupby instead of Ray's
    per-key aggregation. Skew note: a mega-repo's ``repo-contains``
    triples share one subj and land in one partition; the partition's
    size is bounded by that repo's file count, and P can be raised
    without rebalancing cost.
    """
    import pandas as pd

    def add_part(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch["subj"].to_pandas(), index=False
        ).to_numpy()
        return batch.append_column(
            "part", pa.array((h % num_partitions).astype("int32"), pa.int32())
        )

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["subj", "pred", "obj", "repo"], as_index=False).agg(
            bucket=("bucket", "max"), score=("score", "max")
        )
        return out

    return (
        # batch_size also coalesces the many small upstream blocks
        # (union of per-block partials) into a few fat ones before the
        # shuffle — block count, not byte count, drives sort cost here
        triples_ds.map_batches(add_part, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(dedup_part, batch_format="pandas")
    )


COOC_SCHEMA = pa.schema(
    [("ent_a", pa.string()), ("ent_b", pa.string()), ("n_files", pa.int64())]
)


def cooccurrence_edges(
    triples_ds: "ray.data.Dataset", num_partitions: int = 16
) -> "ray.data.Dataset":
    """Entity co-occurrence edges from the triple table (the north
    star's "co-occurrence relations"): for every unordered pair of
    canonical entities defined in the SAME file, the number of files
    where they co-occur.

    Shuffle shape: ``file-defines-entity`` triples are filtered and
    projected in-stream, hash-partitioned by file (coarse ``% P`` —
    every file's edges land in ONE part), and each part generates its
    pairs with a single vectorized self-merge per part (no per-file
    Python loop, no file-cardinality map_groups). Pair counts
    pre-combine inside the part, and the cross-part merge runs on a
    bounded ``hash(pair) % P`` part key with a per-part vectorized
    groupby sum — a raw pair-keyed ``.aggregate(Sum)`` pays Ray
    2.49's ~1–2 ms PER GROUP reduce cost at pair cardinality
    (BASELINE.md round-5 cliff note). Per-part memory is
    Σ k_file² / P where k_file = entities per file (bounded by
    max_len · labels); mega files bound k by construction, so no key
    salting is needed."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    P = num_partitions

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["pred"], pa.scalar("file-defines-entity")))
        files = t["subj"].to_numpy(zero_copy_only=False)
        part = (pd.util.hash_array(files.astype(object)) % P).astype(np.int64)
        return pa.table(
            {
                "file": pa.array(files, pa.string()),
                "ent": t["obj"].cast(pa.string()),
                "part": pa.array(part, pa.int64()),
            }
        )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["file", "ent"]].drop_duplicates()
        m = df.merge(df, on="file")
        m = m[m["ent_x"] < m["ent_y"]]
        out = (
            m.groupby(["ent_x", "ent_y"], as_index=False)
            .size()
            .rename(columns={"ent_x": "ent_a", "ent_y": "ent_b", "size": "n_files"})
        )
        out = out.astype({"n_files": "int64"})
        ha = pd.util.hash_array(out["ent_a"].to_numpy(dtype=object))
        hb = pd.util.hash_array(out["ent_b"].to_numpy(dtype=object))
        out["pair_part"] = ((ha * 3 + hb) % P).astype(np.int64)
        return out

    def merge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["ent_a", "ent_b"], sort=False, as_index=False).agg(
            n_files=("n_files", "sum")
        )

    return (
        triples_ds.map_batches(project, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs, batch_format="pandas")
        .groupby("pair_part")
        .map_groups(merge_pairs, batch_format="pandas")
    )
