"""Sampling / splitting utilities — reference §2.7 analogs, seeded and
shuffle-free where possible.

- ``hash_train_test_split``: deterministic 90/10-style split by key
  hash — replaces the reference's in-memory ``random.shuffle`` + slice
  (``train.py:36-40``); hash-based so the split is stable under
  re-partitioning and resume.
- ``hash_kfold``: k-fold assignment by key hash — the distributed
  analog of ``sklearn.KFold(5, shuffle, seed=42)``
  (``create_confidence_splits.py:74-78``).
- ``seeded_sample``: ``ds.random_sample`` with a fixed seed (negative
  sampling analog, ``processor.py:74-82``).
- ``limit_per_group``: cap rows per group — ``sample_train_data``'s
  10k-per-dataset cap (``evaluate.py:165-188``).
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _stable_frac(key: str, salt: str) -> float:
    """Uniform [0,1) fraction from sha256(salt:key).

    Uses the first 15 hex chars (60 bits) so the identical value is
    SQL-expressible in DuckDB for the oracle check:
    ``('0x' || substr(sha256(salt || ':' || key), 1, 15))::BIGINT / 2^60``.
    """
    h = hashlib.sha256(f"{salt}:{key}".encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60)


def add_split_column(
    batch: pa.Table, key_col: str, test_frac: float, salt: str = "split"
) -> pa.Table:
    splits = [
        "test" if _stable_frac(str(k), salt) < test_frac else "train"
        for k in batch[key_col].to_pylist()
    ]
    return batch.append_column("split", pa.array(splits, pa.string()))


def hash_train_test_split(
    ds: "ray.data.Dataset", key_col: str, test_frac: float = 0.1, salt: str = "split"
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Deterministic split: same key → same side, any run, any plan."""
    tagged = ds.map_batches(
        lambda t: add_split_column(t, key_col, test_frac, salt),
        batch_format="pyarrow",
    )
    import pyarrow.compute as pc

    train = tagged.map_batches(
        lambda t: t.filter(pc.equal(t["split"], "train")).drop_columns(["split"]),
        batch_format="pyarrow",
    )
    test = tagged.map_batches(
        lambda t: t.filter(pc.equal(t["split"], "test")).drop_columns(["split"]),
        batch_format="pyarrow",
    )
    return train, test


def hash_kfold(
    ds: "ray.data.Dataset", key_col: str, k: int = 5, salt: str = "kfold"
) -> "ray.data.Dataset":
    """Adds a ``fold`` column in [0, k): hash-mod partitioning."""

    def tag(batch: pa.Table) -> pa.Table:
        folds = [
            int(_stable_frac(str(key), salt) * k)
            for key in batch[key_col].to_pylist()
        ]
        return batch.append_column("fold", pa.array(folds, pa.int32()))

    return ds.map_batches(tag, batch_format="pyarrow")


def seeded_sample(ds: "ray.data.Dataset", frac: float, seed: int = 42):
    return ds.random_sample(frac, seed=seed)


def stratified_sample(
    ds: "ray.data.Dataset",
    stratum_col: str,
    key_col: str,
    n_per_stratum: int,
    salt: str = "strat",
) -> "ray.data.Dataset":
    """Deterministic uniform sample of ``n_per_stratum`` rows per
    stratum: rows are ranked inside their stratum by
    ``md5(salt:key)`` (key as tiebreak) and the k smallest win — a
    seeded uniform draw that is identical across runs, partition
    layouts, and resume, and exactly SQL-expressible
    (``ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY md5(...))``).

    Scale shape: per-batch partial top-k (at most k × strata rows
    leave each batch) → one stratum-keyed groupby → per-group final
    top-k. No stratum is ever materialized whole; the shuffle moves at
    most k × strata × blocks pre-trimmed rows.
    """

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["_rk"] = [
            hashlib.md5(f"{salt}:{k}".encode()).hexdigest() for k in df[key_col]
        ]
        df = (
            df.sort_values(["_rk", key_col])
            .groupby(stratum_col, sort=False)
            .head(n_per_stratum)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["_rk", key_col])
            .head(n_per_stratum)
            .drop(columns=["_rk"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(stratum_col)
        .map_groups(final, batch_format="pandas")
    )


def uniform_sample(
    ds: "ray.data.Dataset", key_col: str, k: int, salt: str = "unif"
) -> "ray.data.Dataset":
    """Uniform k-row sample of the whole dataset without knowing n (the
    distributed reservoir-sampling analog): bottom-k by ``md5(salt:key)``.
    Per-batch partial bottom-k (≤ k rows leave each batch) → one tiny
    final trim; deterministic across runs/layouts/resume and exactly
    SQL-expressible (``ORDER BY md5(...) LIMIT k``)."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["_rk"] = [
            hashlib.md5(f"{salt}:{v}".encode()).hexdigest() for v in df[key_col]
        ]
        return pa.Table.from_pandas(
            df.sort_values(["_rk", key_col]).head(k), preserve_index=False
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["_rk", key_col]).head(k).drop(columns=["_rk"])
        )

    # survivors are ≤ k × blocks rows; repartition(1) makes the final
    # trim a single tiny task rather than a driver collect
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def limit_per_group(
    ds: "ray.data.Dataset", group_col: str, limit: int
) -> "ray.data.Dataset":
    """Keep at most ``limit`` rows per group, deterministically (rows
    sorted by their stable hash inside the group before the cut)."""

    def head(g: pd.DataFrame) -> pd.DataFrame:
        order = pd.util.hash_pandas_object(g.astype(str).sum(axis=1), index=False)
        return g.iloc[order.argsort().to_numpy()[:limit]]

    return ds.groupby(group_col).map_groups(head, batch_format="pandas")


def temperature_mixture_sample(
    ds: "ray.data.Dataset",
    stratum_col: str,
    key_col: str,
    total_k: int,
    tau: float = 0.5,
    salt: str = "temp",
) -> "ray.data.Dataset":
    """Temperature-scaled mixture sampling — the multi-source
    data-mixing op of LLM corpus construction (sample source i with
    probability ∝ n_i^τ; τ<1 up-weights small sources, the standard
    multilingual-mixing trick): per-source targets
    ``k_s = floor(total_k · n_s^τ / Σ n^τ)`` from one metadata-sized
    count pass, then a deterministic md5-ranked bottom-k_s per source
    (same seeded-draw semantics as :func:`stratified_sample`, variable
    k). τ = 0.5 keeps the weights IEEE-exactly SQL-expressible
    (``sqrt`` is correctly rounded in both engines; a general ``pow``
    is not guaranteed to be).

    Scale shape: counts are a tiny groupby; the sample pass ships at
    most ``k_s × blocks`` pre-trimmed rows per source into one
    stratum-keyed groupby.

    Note: targets are floored, so the total drawn is
    ``Σ floor(total_k·w_s/Σw)`` — up to ``len(sources) − 1`` rows
    short of ``total_k``. The floor rule (rather than a
    largest-remainder top-up) is what keeps the per-source target an
    exact closed form both engines compute identically, which is what
    the SQL oracle pins."""
    import math

    from ray.data.aggregate import Count

    counts = {
        r[stratum_col]: r["n"]
        for r in ds.groupby(stratum_col)
        .aggregate(Count(alias_name="n"))
        .take_all()  # sources are dimension-sized
    }
    if tau == 0.5:
        w = {s: math.sqrt(n) for s, n in counts.items()}
    else:
        w = {s: float(n) ** tau for s, n in counts.items()}
    denom = sum(w[s] for s in sorted(w))
    k_map = {s: int(math.floor(total_k * w[s] / denom)) for s in w}

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["_rk"] = [
            hashlib.md5(f"{salt}:{v}".encode()).hexdigest() for v in df[key_col]
        ]
        df = df.sort_values(["_rk", key_col])
        pos = df.groupby(stratum_col, sort=False).cumcount()
        keep = pos.to_numpy() < df[stratum_col].map(k_map).fillna(0).to_numpy()
        return pa.Table.from_pandas(df[keep], preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        k = k_map.get(g[stratum_col].iloc[0], 0)
        return (
            g.sort_values(["_rk", key_col]).head(k).drop(columns=["_rk"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(stratum_col)
        .map_groups(final, batch_format="pandas")
    )


def global_shuffle_positions(
    ds: "ray.data.Dataset",
    key_col: str = "doc_id",
    salt: str = "shuffle",
    n_bins: int = 1024,
) -> "ray.data.Dataset":
    """Deterministic GLOBAL training-data shuffle: every row gets a
    permutation position ``pos`` (1-based) equal to its rank in
    ``ORDER BY md5(salt:key), key`` — the seeded shuffle a 100-TB
    training run needs (stable under re-partitioning and resume,
    unlike ``random_shuffle``), expressed WITHOUT a global sort:

    1. the md5 keyspace is uniform by construction, so fixed-width
       range bins over the first 60 hash bits are balanced — no
       min/max pass and no skew (contrast the value-binned rank
       engine in ``queries/relational``, which histograms first);
    2. one streaming pass counts rows per bin (in-batch combiner →
       metadata-sized groupby) and the driver prefix-sums bin
       OFFSETS;
    3. rows shuffle ONCE on their bin id; each bin sorts locally by
       the FULL hash hex (then key): ``pos = offset + local index``.

    The md5 is per-row Python ``hashlib`` (~1M rows/s/core) inside
    ``map_batches`` — embarrassingly parallel, and the only kernel
    that matches the SQL oracle bit-for-bit. Returns ``(key_col,
    pos)``."""
    import numpy as np
    import ray.data  # noqa: F401  (typing only)
    from ray.data.aggregate import Sum

    width = (1 << 60) // n_bins

    def hashed(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_pylist()
        hx = [hashlib.md5(f"{salt}:{k}".encode()).hexdigest() for k in keys]
        b = np.array([int(h[:15], 16) for h in hx], np.int64) // width
        return pa.table(
            {
                "bin": pa.array(b, pa.int64()),
                "h": pa.array(hx, pa.string()),
                key_col: t[key_col],
            }
        )

    rows = ds.map_batches(hashed, batch_format="pyarrow").materialize()

    def bin_counts(t: pa.Table) -> pa.Table:
        u, c = np.unique(t["bin"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {"bin": pa.array(u, pa.int64()),
             "cnt": pa.array(c.astype(np.int64), pa.int64())}
        )

    counts = {
        r["bin"]: r["cnt"]
        for r in rows.map_batches(bin_counts, batch_format="pyarrow")
        .groupby("bin").aggregate(Sum("cnt", alias_name="cnt")).take_all()
    }  # ≤ n_bins rows — metadata-sized
    offsets: dict[int, int] = {}
    run = 0
    for b in sorted(counts):
        offsets[b] = run
        run += counts[b]

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bin"].iloc[0])
        g = g.sort_values(["h", key_col], kind="stable", ignore_index=True)
        return pd.DataFrame(
            {
                key_col: g[key_col].to_numpy(),
                "pos": offsets[b] + np.arange(1, len(g) + 1),
            }
        )

    return rows.groupby("bin").map_groups(assign, batch_format="pandas")


def priority_sample(
    ds: "ray.data.Dataset",
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "prio",
) -> pa.Table:
    """Weighted sampling WITHOUT replacement, proportional to
    ``weight_col`` (Efraimidis–Spirakis A-ES): each row draws the
    deterministic uniform ``u = md5-frac(salt:key)`` and keeps
    priority ``u^(1/w)``; the global top-``k`` priorities are the
    sample. The training-data op for length/token-weighted corpus
    subsetting — deterministic, layout-invariant, resumable.

    Scale shape: NO shuffle — each batch keeps its local top-k
    (priority DESC, key ASC), the driver merges ≤ k·n_batches
    fixed-size partials. The identical formula is SQL-expressible
    for the oracle: ``POW(u, 1.0/w)`` with the same md5-frac."""
    import numpy as np

    def local_topk(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_pylist()
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = np.array(
            [
                int(hashlib.md5(f"{salt}:{x}".encode()).hexdigest()[:15], 16)
                for x in keys
            ],
            np.float64,
        ) / float(1 << 60)
        prio = u ** (1.0 / np.maximum(w, 1e-12))
        order = np.lexsort((np.asarray(keys), -prio))[:k]
        return pa.table(
            {
                key_col: pa.array([keys[i] for i in order]),
                weight_col: t[weight_col].take(pa.array(order, pa.int64())),
                "prio": pa.array(prio[order], pa.float64()),
            }
        )

    cands = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    top = sorted(cands, key=lambda r: (-r["prio"], r[key_col]))[:k]
    return pa.table(
        {
            key_col: pa.array([r[key_col] for r in top], pa.int64()),
            weight_col: pa.array([r[weight_col] for r in top], pa.int64()),
        }
    )
