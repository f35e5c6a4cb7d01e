"""Generic hash equi-join built on union + int-partition + per-part
pandas merge.

Why not ``Dataset.join``: Ray 2.49's hash-join aggregator builds a
zero-COLUMN table for any partition that received no shards on one
side, and pyarrow's join kernel then fails with "No match ... FieldRef"
— guaranteed to hit whenever one side is small relative to
``num_partitions`` (and nondeterministically otherwise). This join
tolerates empty/zero-column blocks everywhere: map/groupby stages skip
them and every output block is cast to one explicit schema.

Shuffle shape: both sides get ``part = key % P`` (int64 key), are
unioned with a side tag, and merged per part with one vectorized
pandas merge — the same measured-15×-cheaper coarse-partition pattern
as ``stages/triples``. Per-part memory is (left+right)/P, tunable via
``num_partitions``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_on: str,
    right_on: str,
    num_partitions: int = 8,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Equi-join on int64 OR string keys (``how``: "inner", "left",
    "right" or "full" — the outer forms keep unmatched rows with nulls
    on the other side; for "right"/"full" the key column ``left_on``
    is coalesced from the key itself so it is non-null on right-only
    rows). Output columns: all left columns + right columns except
    ``right_on`` (matching pyarrow's coalesce-keys join shape). String
    keys partition via ``pd.util.hash_array`` (deterministic fixed-key
    siphash — safe across worker processes, unlike Python ``hash``)."""
    _PA_JOIN = {
        "inner": "inner",
        "left": "left outer",
        "right": "right outer",
        "full": "full outer",
    }
    if how not in _PA_JOIN:
        raise ValueError(
            f"how must be one of {sorted(_PA_JOIN)}, got {how!r}"
        )
    ls, rs = left.schema(), right.schema()
    key_type = ls.types[ls.names.index(left_on)]
    str_key = pa.types.is_string(key_type) or pa.types.is_large_string(key_type)
    l_fields = [pa.field(n, t) for n, t in zip(ls.names, ls.types)]
    r_fields = [
        pa.field(n, t) for n, t in zip(rs.names, rs.types) if n != right_on
    ]
    dup = {f.name for f in l_fields} & {f.name for f in r_fields}
    if dup:
        raise ValueError(f"overlapping non-key columns: {sorted(dup)}")
    out_schema = pa.schema(l_fields + r_fields)
    union_schema = pa.schema(
        [pa.field("__part", pa.int64()),
         pa.field("__key", pa.string() if str_key else pa.int64()),
         pa.field("__side", pa.int8())]
        + l_fields
        + r_fields
    )
    l_names = [f.name for f in l_fields]
    r_names = [f.name for f in r_fields]
    P = num_partitions

    def tag(side: int, key_col: str, own: list):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or key_col not in t.column_names:
                return union_schema.empty_table()
            if str_key:
                import pandas as pd

                keys = t[key_col].cast(pa.string())
                parts = (
                    pd.util.hash_array(keys.to_numpy(zero_copy_only=False))
                    % P
                ).astype(np.int64)
            else:
                raw = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
                keys = pa.array(raw, pa.int64())
                parts = raw % P
            cols = {
                "__part": pa.array(parts, pa.int64()),
                "__key": keys,
                "__side": pa.array(np.full(t.num_rows, side, np.int8), pa.int8()),
            }
            for f in union_schema:
                if f.name.startswith("__"):
                    continue
                if f.name in t.column_names and f.name in own:
                    cols[f.name] = t[f.name].cast(f.type)
                else:
                    cols[f.name] = pa.nulls(len(keys), f.type)
            return pa.table(cols, schema=union_schema)

        return fn

    def merge(group: pa.Table) -> pa.Table:
        # arrow-native split + join: no pandas round-trip (which would
        # coerce nullable ints to float64 and break the schema cast)
        import pyarrow.compute as pc

        if group.num_rows == 0 or "__side" not in group.column_names:
            return out_schema.empty_table()
        side = group["__side"]
        lt = group.filter(pc.equal(side, 0)).select(["__key"] + l_names)
        rt = group.filter(pc.equal(side, 1)).select(["__key"] + r_names)
        # provably-empty results short-circuit; the outer forms must
        # still emit the non-empty side (pyarrow joins handle an empty
        # other side, but skipping it avoids the kernel dispatch)
        if (lt.num_rows == 0 and how in ("inner", "left")) or (
            rt.num_rows == 0 and how in ("inner", "right")
        ):
            return out_schema.empty_table()
        j = lt.combine_chunks().join(
            rt.combine_chunks(), keys=["__key"], join_type=_PA_JOIN[how]
        )
        if how in ("right", "full"):
            # right-only rows carry nulls in every left column incl.
            # the key under its left name; restore it from the
            # coalesced __key (full/right outer coalesce the join key)
            i = j.column_names.index(left_on)
            j = j.set_column(
                i, left_on,
                pc.coalesce(j[left_on], j["__key"].cast(key_type)),
            )
        return j.select(out_schema.names).cast(out_schema)

    unioned = left.map_batches(
        tag(0, left_on, l_names), batch_format="pyarrow",
        batch_size=131072,
    ).union(
        right.map_batches(
            tag(1, right_on, r_names), batch_format="pyarrow",
            batch_size=131072,
        )
    )
    return unioned.groupby("__part").map_groups(merge, batch_format="pyarrow")


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    by: str,
    direction: str = "backward",
    how: str = "inner",
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Distributed as-of join: for each left row, the nearest right row
    with the same ``by`` key and ``right.on <= left.on`` (backward; or
    ``>=`` forward), exact matches allowed — the DuckDB/`pandas
    merge_asof` contract.

    Ray shape: both sides are tagged and unioned on one coarse
    ``part = by % P`` int key (the measured-cheap single-shuffle
    pattern shared with :func:`hash_join`); each part is split back
    into its two sides ARROW-side (so nullable ints never round-trip
    through float), sorted by ``on``, and merged with one vectorized
    ``pandas.merge_asof(by=...)``. Per-part memory is
    (left+right)/P. The partitioning assumption: a ``by`` key's rows
    all land in one part — guaranteed by the modulus; time-ordering is
    restored per part, never globally.

    ``how="inner"`` drops unmatched left rows (DuckDB ``ASOF JOIN``);
    ``how="left"`` keeps them with nulls (``ASOF LEFT JOIN``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    ls, rs = left.schema(), right.schema()
    l_type = dict(zip(ls.names, ls.types))
    r_type = dict(zip(rs.names, rs.types))
    for k in (on, by):
        if l_type.get(k) != r_type.get(k):
            raise ValueError(f"key column {k!r} missing or type-mismatched")
    l_only = [n for n in ls.names if n not in (on, by)]
    r_only = [n for n in rs.names if n not in (on, by)]
    dup = set(l_only) & set(r_only)
    if dup:
        raise ValueError(f"overlapping non-key columns: {sorted(dup)}")
    out_schema = pa.schema(
        [pa.field(by, l_type[by]), pa.field(on, l_type[on])]
        + [pa.field(n, l_type[n]) for n in l_only]
        + [pa.field(n, r_type[n]) for n in r_only]
    )
    union_schema = pa.schema(
        [pa.field("__part", pa.int64()), pa.field("__side", pa.int8())]
        + list(out_schema)
    )
    P = num_partitions

    def tag(side: int, own: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return union_schema.empty_table()
            keys = t[by].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {
                "__part": pa.array(keys % P, pa.int64()),
                "__side": pa.array(np.full(len(keys), side, np.int8), pa.int8()),
            }
            for f in out_schema:
                if f.name in (on, by) or f.name in own:
                    cols[f.name] = t[f.name].cast(f.type)
                else:
                    cols[f.name] = pa.nulls(len(keys), f.type)
            return pa.table(cols, schema=union_schema)

        return fn

    def merge(group: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        if group.num_rows == 0 or "__side" not in group.column_names:
            return out_schema.empty_table()
        side = group["__side"]
        lt = group.filter(pc.equal(side, 0)).select([by, on] + l_only)
        rt = group.filter(pc.equal(side, 1)).select([by, on] + r_only)
        if lt.num_rows == 0:
            return out_schema.empty_table()
        if rt.num_rows == 0:
            if how == "inner":
                return out_schema.empty_table()
            pad = {n: lt[n] for n in (by, on)} | {n: lt[n] for n in l_only}
            for n in r_only:
                pad[n] = pa.nulls(lt.num_rows, r_type[n])
            return pa.table(pad, schema=out_schema)
        ldf = lt.to_pandas().sort_values(on, kind="mergesort", ignore_index=True)
        rdf = rt.to_pandas().sort_values(on, kind="mergesort", ignore_index=True)
        rdf["__rmatch"] = np.int8(1)
        m = pd.merge_asof(ldf, rdf, on=on, by=by, direction=direction)
        if how == "inner":
            m = m[m["__rmatch"].notna()]
        else:
            # unmatched rows NaN-coerced int right-cols → pandas
            # nullable Int64 so the arrow cast keeps nulls, not NaN
            for n in r_only:
                if pa.types.is_integer(r_type[n]):
                    m[n] = m[n].astype("Int64")
        m = m.drop(columns=["__rmatch"])
        return pa.Table.from_pandas(m, preserve_index=False).select(
            out_schema.names
        ).cast(out_schema)

    unioned = left.map_batches(
        tag(0, l_only), batch_format="pyarrow", batch_size=131072
    ).union(
        right.map_batches(tag(1, r_only), batch_format="pyarrow", batch_size=131072)
    )
    return unioned.groupby("__part").map_groups(merge, batch_format="pyarrow")


class BloomFilter:
    """Fixed-size blocked Bloom filter over int64 keys, built as a
    mergeable aggregate: every block folds its keys into one
    ``nbits``-wide bitmap partial (a few hundred KiB regardless of row
    count), the driver ORs the partials, and the result is broadcast
    (``ray.put`` at cluster scale) to prune a fact table BEFORE its
    shuffle join. Splitmix64-style double hashing, k derived from the
    target false-positive rate. A Bloom pass alone is approximate;
    pair it with an exact verification join (``bloom_semi_join``) for
    exact semantics — the filter only shrinks the join's left input.
    """

    __slots__ = ("nbits", "k", "bits")

    def __init__(self, nbits: int = 1 << 23, k: int = 7,
                 bits: np.ndarray | None = None):
        self.nbits = nbits
        self.k = k
        self.bits = (
            bits if bits is not None
            else np.zeros(nbits // 64, dtype=np.uint64)
        )

    @staticmethod
    def _mix(v: np.ndarray, salt: np.uint64) -> np.ndarray:
        x = (v.astype(np.uint64) + salt) * np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        return x

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = self._mix(keys, np.uint64(0xA076_1D64_78BD_642F))
        h2 = self._mix(keys, np.uint64(0xE703_7ED1_A0B4_28DB)) | np.uint64(1)
        ks = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + ks * h2[None, :]) % np.uint64(self.nbits)

    def add(self, keys: np.ndarray) -> "BloomFilter":
        pos = self._positions(np.asarray(keys, dtype=np.int64))
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).ravel(),
            np.uint64(1) << (pos.ravel() & np.uint64(63)),
        )
        return self

    def contains(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(np.asarray(keys, dtype=np.int64))
        hits = (
            self.bits[(pos >> np.uint64(6))]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return hits.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self.bits |= other.bits
        return self


def build_bloom(
    ds: "ray.data.Dataset", key: str, nbits: int = 1 << 23, k: int = 7
) -> BloomFilter:
    """One streaming pass: each batch emits its bitmap partial as a
    single fixed-size row, an intermediate map_batches OR-combines
    every ~32 partials into one, and the driver ORs only the combined
    remainder — at 2^23 bits a partial is 1 MiB, so the combine level
    caps driver ingress at blocks/32 MiB (a million-block corpus
    streams ~32 GiB of partials worker-side but ships the driver only
    the combined rows)."""

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(nbits, k)
        bf.add(t[key].to_numpy(zero_copy_only=False).astype(np.int64))
        packed = bf.bits.view(np.uint8).tobytes()
        return pa.table({"bits": pa.array([packed], pa.large_binary())})

    def combine(t: pa.Table) -> pa.Table:
        acc = np.zeros(nbits // 64, dtype=np.uint64)
        for buf in t["bits"]:
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
        return pa.table(
            {"bits": pa.array([acc.view(np.uint8).tobytes()], pa.large_binary())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").map_batches(
        combine, batch_format="pyarrow", batch_size=32
    )
    out = BloomFilter(nbits, k)
    for row in partials.iter_rows():
        out.bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    return out


def bloom_semi_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    num_partitions: int = 16,
    nbits: int = 1 << 23,
) -> "ray.data.Dataset":
    """EXACT distributed semi-join ``left WHERE left_key IN right``:
    a broadcast Bloom filter built from the right side prunes the left
    fact table in-stream (no shuffle, ~1 MiB broadcast), then only the
    Bloom survivors — already within a false-positive factor of the
    true output — pay the exact verification join against the distinct
    right keys. The classic big-fact/medium-dim semi-join at 100 TB:
    the all-to-all exchange moves survivors, not the fact table."""
    bloom = build_bloom(right, right_key, nbits=nbits)

    def prune(t: pa.Table) -> pa.Table:
        keys = t[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(bloom.contains(keys)))

    survivors = left.map_batches(prune, batch_format="pyarrow")

    def distinct_keys(t: pa.Table) -> pa.Table:
        k = np.unique(t[right_key].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table(
            {
                "__part": pa.array(k % num_partitions, pa.int64()),
                left_key: pa.array(k, pa.int64()),
            }
        )

    def part_unique(g: "pd.DataFrame") -> "pd.DataFrame":
        return g[[left_key]].drop_duplicates(ignore_index=True)

    # cross-batch distinct on the bounded key % P part (per-part
    # vectorized drop_duplicates) — BOTH a raw-key map_groups AND a
    # raw-key native .aggregate() pay per-GROUP overhead at key
    # cardinality (~1–2 ms/group in Ray 2.49's aggregate reduce; see
    # BASELINE.md round-5 cliff note)
    right_keys = (
        right.map_batches(distinct_keys, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(part_unique, batch_format="pandas")
    )
    return hash_join(
        survivors, right_keys, left_key, left_key,
        num_partitions=num_partitions,
    )
