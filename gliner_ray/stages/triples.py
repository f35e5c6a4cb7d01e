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


def _triple_table(rows: dict[tuple, tuple]) -> pa.Table:
    subj, pred, obj, repo, bucket, score = [], [], [], [], [], []
    for (s, p, o, r), (b, sc) in rows.items():
        subj.append(s); pred.append(p); obj.append(o); repo.append(r)
        bucket.append(b); score.append(sc)
    return pa.table(
        {
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "repo": pa.array(repo, pa.string()),
            "bucket": pa.array(bucket, pa.int32()),
            "score": pa.array(score, pa.float64()),
        }
    )


def files_to_triples(batch: pa.Table) -> pa.Table:
    """files rows → repo-contains-file triples (batch-local dedup)."""
    rows: dict[tuple, tuple] = {}
    for repo, path, bucket in zip(
        batch["repo"].to_pylist(), batch["path"].to_pylist(), batch["bucket"].to_pylist()
    ):
        rows[(repo, "repo-contains-file", f"{repo}/{path}", repo)] = (bucket, 1.0)
    return _triple_table(rows)


def mentions_to_triples(batch: pa.Table) -> pa.Table:
    """linked mentions → defines/typed-as triples, batch-local max-score."""
    rows: dict[tuple, tuple] = {}
    for repo, path, bucket, eid, label, score in zip(
        batch["repo"].to_pylist(),
        batch["path"].to_pylist(),
        batch["bucket"].to_pylist(),
        batch["entity_id"].to_pylist(),
        batch["label"].to_pylist(),
        batch["score"].to_pylist(),
    ):
        if eid is None:
            continue
        for key in (
            (f"{repo}/{path}", "file-defines-entity", eid, repo),
            (eid, "entity-typed-as", label, repo),
        ):
            cur = rows.get(key)
            if cur is None or score > cur[1]:
                rows[key] = (bucket, float(score))
    return _triple_table(rows)


def dedup_triples(triples_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Global exact dedup: groupby full key, keep max score + bucket."""
    from ray.data.aggregate import Max

    return triples_ds.groupby(["subj", "pred", "obj", "repo"], num_partitions=16).aggregate(
        Max("bucket", alias_name="bucket"),
        Max("score", alias_name="score"),
    )
