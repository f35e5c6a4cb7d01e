"""Relational pipelines over the driver test tables + exact SQL oracles.

Design rules (so the driver's order-insensitive value-hash matches):

- every aggregate / computed column carries the SAME name in the Ray
  code and the SQL (``AS ...``);
- money/measure columns are converted to integer units with
  ``floor(x * scale)`` on BOTH sides — identical IEEE doubles in,
  identical integers out; no float columns in oracle-checked outputs;
- LIMIT queries sort on a key made unique by including the id column;
- timestamps are formatted to strings before leaving the query.

Scale notes per query are in the docstrings: small dimension tables
are broadcast (driver-side lookup structures captured in the batch
closure — at cluster scale a ``ray.put`` handle), the two big fact
tables join via Ray's hash ``Dataset.join``, and every groupby is
preceded by an in-batch partial aggregation where the key cardinality
is low.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _floor_units(arr: pa.ChunkedArray | pa.Array, scale: int) -> pa.Array:
    vals = np.floor(arr.to_numpy(zero_copy_only=False) * scale)
    return pa.array(vals.astype(np.int64), pa.int64())


# ------------------------------------------------------------------ q1


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filtered scan → low-cardinality groupby.

    Partial aggregation inside map_batches (pandas groupby per batch,
    ≤ 6 key combinations) shrinks the shuffle to (keys × batches) rows
    before the global groupby — the combiner pattern.
    """
    from ray.data.aggregate import Count, Sum

    cutoff = datetime(1998, 9, 2)
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], pa.scalar(cutoff)))
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pandas(),
                "l_linestatus": batch["l_linestatus"].to_pandas(),
                # sum in float64; the single cast to int happens after the
                # global aggregate (matches SQL CAST(SUM(..) AS BIGINT) even
                # for fractional quantities)
                "sum_qty": batch["l_quantity"].to_numpy().astype(np.float64),
                "sum_base_cents": np.floor(
                    batch["l_extendedprice"].to_numpy() * 100
                ).astype(np.int64),
                "sum_disc_e4": np.floor(
                    batch["l_extendedprice"].to_numpy()
                    * (1.0 - batch["l_discount"].to_numpy())
                    * 10000
                ).astype(np.int64),
                "count_order": np.ones(batch.num_rows, dtype=np.int64),
            }
        )
        agg = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    def cast_qty(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("sum_qty"),
            "sum_qty",
            pc.cast(pc.floor(t["sum_qty"]), pa.int64()),
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_disc_e4", alias_name="sum_disc_e4"),
            Sum("count_order", alias_name="count_order"),
        )
        .map_batches(cast_qty, batch_format="pyarrow")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(FLOOR(SUM(l_quantity)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------------ q3


#: dimension rows above this collect-guard use a shuffle join instead
#: of a driver broadcast (customer is 150k×sf — fine at bench scale,
#: a driver hazard at 100×; round-1 verdict watch item)
DIM_BROADCAST_LIMIT = 5_000_000


def _join_parts(*datasets, rows_per_part: int = 4_000_000, lo: int = 8, hi: int = 512):
    """Data-dependent hash-join partition count: size partitions to
    ~``rows_per_part`` rows of the largest input (so a partition's
    build side stays comfortably in a worker's heap at any corpus
    size), floored at ``lo`` — measured on this node at sf0.1, 8 parts
    beat 16/32 (3.95 vs 4.52 vs 5.72 s min-of-3): below ~4M rows the
    per-partition shuffle overhead dominates. Call on RAW
    ``read_parquet`` datasets only — their count() is parquet-metadata,
    no scan."""
    n = max(ds.count() for ds in datasets)
    return max(lo, min(hi, n // rows_per_part))


def q3_top_orders(sf_dir: str, dim_broadcast_limit: int = DIM_BROADCAST_LIMIT):
    """TPC-H Q3 shape: guarded semi-join (customer segment filter) +
    semi-join lineitem⋉orders + groupby + top-k.

    TWO-LEVEL guarded broadcast: customer's qualifying key set filters
    the orders scan in-batch, and — when the surviving orderkey set is
    itself under the guard — that set filters the lineitem scan
    in-batch too, so the whole query runs with ZERO shuffles (both
    semi-joins are stream filters; only the qualifying-orders
    materialize, dimension-bounded, touches the object store). Either
    level over the guard falls back to the hash-partitioned
    ``Dataset.join``, so nothing dimension-sized reaches the driver at
    corpus scale.
    """
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    building_ds = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(["c_custkey"]),
        batch_format="pyarrow",
    ).materialize()

    cutoff = datetime(1998, 1, 1)
    orders_base = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(cutoff))).select(
            ["o_orderkey", "o_custkey"]
        ),
        batch_format="pyarrow",
    )
    okeys = None
    if building_ds.count() <= dim_broadcast_limit:
        keys = pa.array(building_ds.to_pandas()["c_custkey"].tolist(), pa.int64())
        orders = orders_base.map_batches(
            lambda t: t.filter(pc.is_in(t["o_custkey"], value_set=keys)).select(
                ["o_orderkey"]
            ),
            batch_format="pyarrow",
        ).materialize()
        if orders.count() <= dim_broadcast_limit:
            # second broadcast level: the qualifying orderkeys are
            # dimension-bounded too → lineitem is stream-filtered
            # below instead of hash-joined
            okeys = pa.array(
                orders.to_pandas()["o_orderkey"].tolist(), pa.int64()
            )
    else:  # scale path: hash semi-join against the qualifying customers
        orders = orders_base.join(
            building_ds, join_type="inner",
            num_partitions=_join_parts(_read(sf_dir, "orders", ["o_orderkey"])),
            on=("o_custkey",), right_on=("c_custkey",),
        ).map_batches(
            lambda t: t.select(["o_orderkey"])
            if t.num_rows and "o_orderkey" in t.column_names
            else pa.schema([("o_orderkey", pa.int64())]).empty_table(),
            batch_format="pyarrow",
        )
    line_raw = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    )
    line = line_raw.map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev_e4": pa.array(
                    np.floor(
                        t["l_extendedprice"].to_numpy()
                        * (1.0 - t["l_discount"].to_numpy())
                        * 10000
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    if okeys is not None:
        joined = line.map_batches(
            lambda t: t.filter(pc.is_in(t["l_orderkey"], value_set=okeys)),
            batch_format="pyarrow",
        )
    else:
        joined = line.join(
            orders, join_type="inner", num_partitions=_join_parts(line_raw),
            on=("l_orderkey",), right_on=("o_orderkey",),
        )
    # orderkey-cardinality merge via the part idiom: in-batch partial
    # sums + per-part vectorized groupby (a raw orderkey-keyed
    # .aggregate pays Ray 2.49's ~1–2 ms/group reduce cost spread
    # over only the join's output partitions — BASELINE.md round-5
    # cliff note)
    P = 32

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("l_orderkey", sort=False, as_index=False)["rev_e4"].sum()
        out["part"] = out["l_orderkey"].to_numpy().astype(np.int64) % P
        return out

    def rev_merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("l_orderkey", sort=False, as_index=False)["rev_e4"].sum()
        return out.rename(columns={"rev_e4": "revenue_e4"})

    agg = (
        joined.map_batches(rev_partial, batch_format="pandas", batch_size=131072)
        .groupby("part")
        .map_groups(rev_merge, batch_format="pandas")
    )
    top = agg.sort(["revenue_e4", "l_orderkey"], descending=[True, False]).limit(10)
    return top


Q3_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY l_orderkey
ORDER BY revenue_e4 DESC, l_orderkey
LIMIT 10
"""


# ------------------------------------------------------------------ q5


def q5_region_revenue(sf_dir: str, dim_broadcast_limit: int = DIM_BROADCAST_LIMIT):
    """TPC-H Q5 shape: guarded dimension lookups + 1 big hash join.

    region→nation are always tiny (25/5 rows) and stay driver-built
    dicts. customer/supplier are broadcast dicts ONLY under the count
    guard; above it they become two extra hash ``Dataset.join`` hops
    (lineitem⋈orders⋈supplier⋈customer), so nothing dimension-sized
    reaches the driver. Same-nation (customer nation == supplier
    nation) enforced in the final vectorized filter either way.
    """
    from ray.data.aggregate import Sum

    region = _read(sf_dir, "region").to_pandas()
    nation = _read(sf_dir, "nation").to_pandas()
    asia_key = int(region[region.r_name == "ASIA"].r_regionkey.iloc[0])
    asia_nations = nation[nation.n_regionkey == asia_key]
    nation_name = dict(zip(asia_nations.n_nationkey, asia_nations.n_name))
    nation_keys = pa.array(list(nation_name), pa.int64())

    lo = datetime(1996, 1, 1)
    hi = datetime(1998, 1, 1)
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t["c_nationkey"], value_set=nation_keys)),
        batch_format="pyarrow",
    )
    supp_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t["s_nationkey"], value_set=nation_keys)),
        batch_format="pyarrow",
    )
    line = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    nation_name_s = pd.Series(nation_name)

    def date_filter(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ).select(["o_orderkey", "o_custkey"])

    orders_base = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(date_filter, batch_format="pyarrow")

    small_dims = cust_ds.count() + supp_ds.count() <= dim_broadcast_limit
    if small_dims:
        cust = cust_ds.to_pandas()
        cust_nation = dict(zip(cust.c_custkey, cust.c_nationkey))
        supp = supp_ds.to_pandas()
        supp_nation = dict(zip(supp.s_suppkey, supp.s_nationkey))
        cust_keys = pa.array(list(cust_nation), pa.int64())
        orders = orders_base.map_batches(
            lambda t: t.filter(pc.is_in(t["o_custkey"], value_set=cust_keys)),
            batch_format="pyarrow",
        )
        joined = line.join(
            orders, join_type="inner", num_partitions=_join_parts(line),
            on=("l_orderkey",), right_on=("o_orderkey",),
        )
        supp_nation_s = pd.Series(supp_nation)
        cust_nation_s = pd.Series(cust_nation)

        def per_nation(batch: pa.Table) -> pa.Table:
            supp_n = (
                pd.Series(batch["l_suppkey"].to_numpy(zero_copy_only=False))
                .map(supp_nation_s).fillna(-1).to_numpy()
            )
            cust_n = (
                pd.Series(batch["o_custkey"].to_numpy(zero_copy_only=False))
                .map(cust_nation_s).fillna(-2).to_numpy()
            )
            mask = supp_n == cust_n
            rev = np.floor(
                batch["l_extendedprice"].to_numpy()
                * (1.0 - batch["l_discount"].to_numpy())
                * 10000
            ).astype(np.int64)[mask]
            names = pd.Series(supp_n[mask]).map(nation_name_s).to_numpy()
            df = pd.DataFrame({"n_name": names, "revenue_e4": rev})
            agg = df.groupby("n_name", as_index=False).sum()
            return pa.Table.from_pandas(agg, preserve_index=False)

        per_nation_src = joined.map_batches(per_nation, batch_format="pyarrow")
    else:
        # scale path: dimension joins instead of driver dicts — the
        # robust union-partition hash_join (Ray 2.49's Dataset.join
        # crashes on partitions a small side leaves empty)
        from ..functions.joins import hash_join

        joined = line.join(
            orders_base, join_type="inner", num_partitions=_join_parts(line),
            on=("l_orderkey",), right_on=("o_orderkey",),
        )
        joined = hash_join(joined, supp_ds, "l_suppkey", "s_suppkey")
        joined = hash_join(joined, cust_ds, "o_custkey", "c_custkey")

        def per_nation_joined(batch: pa.Table) -> pa.Table:
            empty = pa.schema(
                [("n_name", pa.string()), ("revenue_e4", pa.int64())]
            ).empty_table()
            if batch.num_rows == 0 or "s_nationkey" not in batch.column_names:
                return empty
            supp_n = batch["s_nationkey"].to_numpy(zero_copy_only=False)
            cust_n = batch["c_nationkey"].to_numpy(zero_copy_only=False)
            mask = supp_n == cust_n
            if not mask.any():
                return empty
            rev = np.floor(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False)
                * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False))
                * 10000
            ).astype(np.int64)[mask]
            names = pd.Series(supp_n[mask]).map(nation_name_s).to_numpy()
            df = pd.DataFrame({"n_name": names, "revenue_e4": rev})
            agg = df.groupby("n_name", as_index=False).sum()
            return pa.Table.from_pandas(agg, preserve_index=False).cast(empty.schema)

        per_nation_src = joined.map_batches(
            per_nation_joined, batch_format="pyarrow"
        )

    return per_nation_src.groupby("n_name").aggregate(
        Sum("revenue_e4", alias_name="revenue_e4")
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


# ------------------------------------------------------------------ q6


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: pure vectorized filter + global aggregate
    (no shuffle at all — each batch emits one partial row). The
    selective shipdate range is PUSHED INTO the parquet scan
    (``read_parquet(filter=...)`` → row groups outside the range are
    skipped via footer statistics and never leave storage); the
    remaining predicates stay as the in-batch mask (their columns are
    unsorted, so row-group stats cannot prune on them)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    lo = datetime(1996, 1, 1)
    hi = datetime(1997, 1, 1)
    import pyarrow.dataset as pads

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def partial(batch: pa.Table) -> pa.Table:
        date = batch["l_shipdate"]
        disc = batch["l_discount"].to_numpy()
        mask = (
            pc.and_(
                pc.greater_equal(date, pa.scalar(lo)), pc.less(date, pa.scalar(hi))
            ).to_numpy(zero_copy_only=False)
            & (disc >= 0.05) & (disc <= 0.07)
            & (batch["l_quantity"].to_numpy() < 24)
        )
        rev = np.floor(
            batch["l_extendedprice"].to_numpy()[mask] * disc[mask] * 10000
        ).astype(np.int64)
        return pa.table(
            {
                "revenue_e4": pa.array([int(rev.sum())], pa.int64()),
                "n_items": pa.array([int(mask.sum())], pa.int64()),
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("revenue_e4", alias_name="revenue_e4"),
        Sum("n_items", alias_name="n_items"),
    )
    return pa.table(
        {
            "revenue_e4": pa.array([agg["revenue_e4"]], pa.int64()),
            "n_items": pa.array([agg["n_items"]], pa.int64()),
        }
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# ------------------------------------------------------- sort / limit


def q_top_orders_by_price(sf_dir: str):
    """Global sort + limit (distributed sort, tie-broken by key)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "total_cents": _floor_units(t["o_totalprice"], 100),
            }
        ),
        batch_format="pyarrow",
    )
    return ds.sort(["total_cents", "o_orderkey"], descending=[True, False]).limit(100)


TOP_ORDERS_SQL = """
SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders ORDER BY total_cents DESC, o_orderkey LIMIT 100
"""


# ----------------------------------------------------------- distinct


def q_distinct_segments(sf_dir: str):
    """Distinct values of one column (shuffle-dedup)."""
    vals = sorted(_read(sf_dir, "customer", ["c_mktsegment"]).unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(vals, pa.string())})


DISTINCT_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


# ----------------------------------------------- broadcast join + agg


def q_segment_revenue(sf_dir: str, dim_broadcast_limit: int = DIM_BROADCAST_LIMIT):
    """orders ⋈ customer, grouped aggregate. Customer is broadcast as
    a lookup Series under ``dim_broadcast_limit`` rows; above it the
    segment is attached via the generic hash join (guarded like q3/q5
    — the dimension grows with the corpus at 100×)."""
    from ray.data.aggregate import Count, Sum

    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    if cust_ds.count() <= dim_broadcast_limit:
        cust = cust_ds.to_pandas()
        seg_of = pd.Series(cust.c_mktsegment.to_numpy(), index=cust.c_custkey.to_numpy())

        def lookup(batch: pa.Table) -> pa.Table:
            segs = (
                pd.Series(batch["o_custkey"].to_numpy(zero_copy_only=False))
                .map(seg_of).to_numpy()
            )
            return pa.table(
                {
                    "c_mktsegment": pa.array(segs, pa.string()),
                    "total_cents": _floor_units(batch["o_totalprice"], 100),
                }
            )

        tagged = orders.map_batches(lookup, batch_format="pyarrow")
    else:
        from ..functions.joins import hash_join

        pre = orders.map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": t["o_custkey"],
                    "total_cents": _floor_units(t["o_totalprice"], 100),
                }
            ),
            batch_format="pyarrow",
        )
        tagged = hash_join(
            pre, cust_ds, left_on="o_custkey", right_on="c_custkey",
            num_partitions=16,
        ).select_columns(["c_mktsegment", "total_cents"])

    return (
        tagged.groupby("c_mktsegment")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("total_cents", alias_name="revenue_cents"),
        )
    )


SEGMENT_REVENUE_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ------------------------------------------------------ events hourly


def q_events_hourly(sf_dir: str):
    """Time-bucketed aggregate: hour truncation done vectorized with
    pyarrow.compute, keys formatted to strings for type-stable output."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        hours = pc.strftime(
            pc.floor_temporal(batch["ts"], unit="hour"), format="%Y-%m-%d %H:00:00"
        )
        return pa.table(
            {
                "hour": hours,
                "event_type": batch["event_type"],
                "value_cents": _floor_units(batch["value"], 100),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2
"""


# ------------------------------------------------- sessionize (window)


def q_user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Session windowing: count gap-delimited sessions per user.

    Users hash-partition on ``user_id % P`` (the
    ``q_user_cumulative_spend`` idiom — a raw user-cardinality
    ``groupby(user_id).map_groups`` degenerates Ray's aggregate at
    millions of distinct users); each part sorts only its own rows by
    (user_id, ts) and counts session starts with one vectorized pass:
    a row starts a session iff it is its user's first row OR its gap
    to the previous row exceeds the threshold. No global sort, one
    shuffle on the bounded part key.
    """
    P = 16

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(u % P, pa.int64()))

    gap_ns = np.int64(gap_minutes) * 60 * 1_000_000_000

    def sessions_part(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["user_id", "ts"], ignore_index=True)
        uid = s["user_id"].to_numpy().astype(np.int64)
        ts = s["ts"].to_numpy("datetime64[ns]").view(np.int64)
        n = len(uid)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "n_sessions": pd.Series([], dtype=np.int64)}
            )
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        starts = first.copy()
        starts[1:] |= (ts[1:] - ts[:-1]) > gap_ns
        bounds = np.flatnonzero(first)
        return pd.DataFrame(
            {
                "user_id": uid[bounds],
                "n_sessions": np.add.reduceat(starts.astype(np.int64), bounds),
            }
        )

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(add_part, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(sessions_part, batch_format="pandas")
    )


USER_SESSIONS_SQL = """
SELECT user_id,
       CAST(1 + SUM(CASE WHEN gap > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sessions
FROM (
    SELECT user_id, ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS gap
    FROM events
)
GROUP BY user_id
"""


# ------------------------------------------------------- part stats


def q_brand_stats(sf_dir: str):
    """min/max/count per group over the part table."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"]).map_batches(
        lambda t: pa.table(
            {
                "p_brand": t["p_brand"],
                "price_cents": _floor_units(t["p_retailprice"], 100),
                "p_size": pc.cast(t["p_size"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return ds.groupby("p_brand").aggregate(
        Count(alias_name="n_parts"),
        Min("price_cents", alias_name="min_price_cents"),
        Max("price_cents", alias_name="max_price_cents"),
        Sum("p_size", alias_name="sum_size"),
    )


BRAND_STATS_SQL = """
SELECT p_brand, COUNT(*) AS n_parts,
       MIN(CAST(FLOOR(p_retailprice * 100) AS BIGINT)) AS min_price_cents,
       MAX(CAST(FLOOR(p_retailprice * 100) AS BIGINT)) AS max_price_cents,
       CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS sum_size
FROM part GROUP BY p_brand
"""


# ------------------------------------------------- semi / anti joins


def q_priority_with_late_items(sf_dir: str):
    """TPC-H Q4 shape: EXISTS semi-join — count orders per priority
    having at least one lineitem shipped after the order date.

    The per-order predicate needs both sides' columns, so lineitem
    hash-joins orders (big-big) with the priority carried through.
    Qualifying (orderkey, priority) pairs are distinct-ed in two hops
    — batch-local partial distinct, then a hash-partitioned global
    distinct (int-key ``groupby("part").map_groups``, which measured
    ~15× faster than a string-key groupby) — so nothing
    fact-table-sized ever lands on the driver. Each partition emits
    per-priority partial counts; the final shuffle is
    (priorities × partitions) rows.
    """
    from ray.data.aggregate import Sum

    n_parts = 32
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    joined = line.join(
        orders, join_type="inner", num_partitions=_join_parts(line),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def qualifying_pairs(batch: pa.Table) -> pa.Table:
        mask = pc.greater(batch["l_shipdate"], batch["o_orderdate"])
        hit = batch.filter(mask)
        df = pd.DataFrame(
            {
                "o_orderkey": hit["l_orderkey"].to_numpy(zero_copy_only=False),
                "o_orderpriority": hit["o_orderpriority"].to_pandas(),
            }
        ).drop_duplicates("o_orderkey")
        df["part"] = (df["o_orderkey"].to_numpy() % n_parts).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        counts = (
            g.drop_duplicates("o_orderkey")["o_orderpriority"]
            .value_counts()
        )
        return pd.DataFrame(
            {"o_orderpriority": counts.index, "n_orders": counts.to_numpy().astype(np.int64)}
        )

    return (
        joined.map_batches(qualifying_pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(count_distinct, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )


PRIORITY_LATE_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
"""


def q_customers_without_big_orders(sf_dir: str):
    """Anti join: customers who never placed an order above 400k —
    broadcast the (distinct) qualifying custkey set, anti-filter with a
    vectorized NOT IN per batch (Bloom-filter slot at cluster scale)."""
    big = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 400_000.0)).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    big_set = pa.array(sorted(set(big.unique("o_custkey"))), pa.int64())
    return _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: t.filter(
            pc.invert(pc.is_in(t["c_custkey"], value_set=big_set))
        ),
        batch_format="pyarrow",
    )


CUSTOMERS_NO_BIG_ORDERS_SQL = """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
"""


def q_customers_no_urgent_orders(sf_dir: str, num_partitions: int = 8):
    """DISTRIBUTED anti join — the shape for when NEITHER side fits a
    broadcast (unlike :func:`q_customers_without_big_orders`'s
    broadcast NOT IN): customers LEFT hash-join the distinct keys of
    the urgent-order side (per-batch filter + ``pc.unique`` combiner
    shrinks the shuffle), keep rows with a null right side. Both sides
    move exactly once, partitioned on the key. The cross-batch dedup
    runs on the bounded ``key % P`` part (per-part vectorized
    drop_duplicates) — a raw custkey-cardinality ``.aggregate()``
    pays Ray 2.49's ~1–2 ms/group reduce cost (BASELINE.md round-5
    cliff note)."""
    from ..functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def batch_unique(t: pa.Table) -> pa.Table:
        keys = pc.unique(
            t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))["o_custkey"]
        )
        part = keys.to_numpy(zero_copy_only=False).astype(np.int64) % num_partitions
        return pa.table({"part": pa.array(part, pa.int64()), "o_custkey": keys})

    def dedup_part(df: pd.DataFrame) -> pd.DataFrame:
        u = df["o_custkey"].drop_duplicates()
        return pd.DataFrame(
            {"o_custkey": u.to_numpy(), "n": np.ones(len(u), dtype=np.int64)}
        )

    urgent = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
        .map_batches(batch_unique, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pandas")
    )
    joined = hash_join(
        cust, urgent, "c_custkey", "o_custkey",
        num_partitions=num_partitions, how="left",
    )
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t["n"])).select(["c_custkey"]),
        batch_format="pyarrow",
    )


CUSTOMERS_NO_URGENT_SQL = """
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


def q_rich_idle_customers_by_nation(
    sf_dir: str,
    num_partitions: int = 8,
    dim_broadcast_limit: int = DIM_BROADCAST_LIMIT,
):
    """TPC-H q22 shape — global scalar subquery + anti join + group
    aggregate composed: per nation, count and total balance of
    customers whose balance beats the positive-balance average AND who
    have no URGENT orders. Three scale-shaped stages sharing the plan:

    1. global average: one fixed-size (sum_cents, n) partial pass over
       customers; the comparison stays integer
       (``cents·n > sum_cents`` — no float division on either engine);
    2. eligible customers drop those WITH urgent orders. The urgent
       custkey set is dimension-bounded (≤ |customer|, known from
       footer metadata), so under the guard it is collected once
       (per-batch ``pc.unique`` partials, driver set-union) and the
       anti join becomes an in-stream filter — zero shuffle. Over the
       guard, the distributed anti join (both sides key-partitioned
       once, same engine as :func:`q_customers_no_urgent_orders`);
    3. the survivors pre-aggregate per nation in-batch before a
       dimension-sized groupby."""
    from ray.data.aggregate import Count, Sum

    from ..functions.joins import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = _floor_units(t["c_acctbal"], 100).to_numpy()
        pos = cents[cents > 0]
        return pa.table(
            {"sc": pa.array([int(pos.sum())], pa.int64()),
             "n": pa.array([len(pos)], pa.int64())}
        )

    parts = cust.map_batches(bal_partial, batch_format="pyarrow").take_all()
    sc = sum(r["sc"] for r in parts)
    n = sum(r["n"] for r in parts)

    def eligible(t: pa.Table) -> pa.Table:
        cents = _floor_units(t["c_acctbal"], 100)
        keep = pc.greater(pc.multiply(cents, pa.scalar(n, pa.int64())),
                          pa.scalar(sc, pa.int64()))
        f = t.filter(keep)
        return pa.table(
            {
                "c_custkey": f["c_custkey"],
                "c_nationkey": f["c_nationkey"].cast(pa.int64()),
                "cents": _floor_units(f["c_acctbal"], 100),
            }
        )

    rich = cust.map_batches(eligible, batch_format="pyarrow")
    urgent_partials = _read(
        sf_dir, "orders", ["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda t: pa.table(
            {"o_custkey": pc.unique(
                t.filter(
                    pc.equal(t["o_orderpriority"], "1-URGENT")
                )["o_custkey"]
            )}
        ),
        batch_format="pyarrow",
    )
    # guard on BOTH footer row counts (no scan): the broadcast set is
    # bounded by the distinct custkeys (≤ |customer|) and the driver
    # collect of per-batch unique partials is bounded by |orders|
    # (cross-batch duplicates survive until the driver set-union)
    if (
        _read(sf_dir, "customer", ["c_custkey"]).count()
        <= dim_broadcast_limit
        and _read(sf_dir, "orders", ["o_custkey"]).count()
        <= 4 * dim_broadcast_limit
    ):
        urgent_keys = pa.array(
            sorted(
                set(
                    urgent_partials.to_pandas()["o_custkey"].tolist()
                )
            ),
            pa.int64(),
        )
        joined = rich.map_batches(
            lambda t: t.append_column(
                "n_o",
                pc.if_else(
                    pc.is_in(t["c_custkey"], value_set=urgent_keys),
                    pa.scalar(1, pa.int64()),
                    pa.scalar(None, pa.int64()),
                ),
            ),
            batch_format="pyarrow",
        )
    else:
        has_orders = urgent_partials.groupby("o_custkey").aggregate(
            Count(alias_name="n_o")
        )
        joined = hash_join(
            rich, has_orders, "c_custkey", "o_custkey",
            num_partitions=num_partitions, how="left",
        )

    def nation_partial(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_null(t["n_o"]))
        df = pd.DataFrame(
            {"c_nationkey": f["c_nationkey"].to_numpy(zero_copy_only=False),
             "cents": f["cents"].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby("c_nationkey", as_index=False).agg(
            n_cust=("cents", "size"), bal_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        joined.map_batches(nation_partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(
            Sum("n_cust", alias_name="n_cust"),
            Sum("bal_cents", alias_name="bal_cents"),
        )
    )


RICH_IDLE_BY_NATION_SQL = """
WITH s AS (
  SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sc,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer WHERE CAST(FLOOR(c_acctbal * 100) AS BIGINT) > 0
), eligible AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer, s
  WHERE CAST(FLOOR(c_acctbal * 100) AS BIGINT) * s.n > s.sc
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(cents) AS BIGINT) AS bal_cents
FROM eligible e
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = e.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY c_nationkey
"""


# ------------------------------------------------------- as-of join


def _fmt_ts_us(series: pd.Series) -> pd.Series:
    """Microsecond timestamp → canonical string (matches DuckDB
    strftime '%Y-%m-%d %H:%M:%S.%f'; arrow's strftime lacks %f)."""
    return series.dt.strftime("%Y-%m-%d %H:%M:%S.%f")


def q_asof_purchase_click(sf_dir: str):
    """As-of join: each purchase event matched to the same user's most
    recent prior-or-simultaneous click (``functions/joins.asof_join``,
    the merge-as-of operator Ray Data lacks natively). The right side
    is pre-aggregated to unique (user_id, ts) keys — max cents — so
    tie-breaking is deterministic on both engines; (user, ts) pairs
    are near-unique per click, so that dedup runs as an in-batch
    partial max + a ``user_id % P`` part merge, never a
    pair-cardinality ``.aggregate()`` (the BASELINE.md round-5 cliff:
    ~1–2 ms per group in Ray's reduce). One coarse ``user_id % P``
    shuffle; time order restored per part, never globally.
    """
    from ..functions.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def split(kind: str, keep_id: bool):
        def fn(t: pa.Table) -> pa.Table:
            f = t.filter(pc.equal(t["event_type"], kind))
            cols = {
                "user_id": f["user_id"],
                "ts": f["ts"],
                ("purchase_cents" if keep_id else "cents"): _floor_units(
                    f["value"], 100
                ),
            }
            if keep_id:
                cols = {"event_id": f["event_id"], **cols}
            return pa.table(cols)

        return fn

    purchases = ev.map_batches(split("purchase", True), batch_format="pyarrow")

    P = 16

    def click_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["user_id", "ts"], sort=False, as_index=False).agg(
            click_cents=("cents", "max")
        )
        out["part"] = out["user_id"].to_numpy().astype(np.int64) % P
        return out

    def click_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["user_id", "ts"], sort=False, as_index=False).agg(
            click_cents=("click_cents", "max")
        )

    clicks = (
        ev.map_batches(split("click", False), batch_format="pyarrow")
        .map_batches(click_partial, batch_format="pandas", batch_size=65536)
        .groupby("part")
        .map_groups(click_merge, batch_format="pandas")
    )
    joined = asof_join(purchases, clicks, on="ts", by="user_id", direction="backward")

    def fmt(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "user_id": df["user_id"],
                "ts": _fmt_ts_us(df["ts"]),
                "purchase_cents": df["purchase_cents"],
                "click_cents": df["click_cents"],
            }
        )

    return joined.map_batches(fmt, batch_format="pandas")


ASOF_PURCHASE_CLICK_SQL = """
WITH p AS (
    SELECT event_id, user_id, ts, CAST(FLOOR(value * 100) AS BIGINT) AS purchase_cents
    FROM events WHERE event_type = 'purchase'
), c AS (
    SELECT user_id, ts, MAX(CAST(FLOOR(value * 100) AS BIGINT)) AS click_cents
    FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       p.purchase_cents, c.click_cents
FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# ------------------------------------------- sliding-window aggregate


def q_user_rolling_1h(sf_dir: str):
    """Sliding event-time window: per user, the sum of event cents over
    the trailing hour [t-1h, t] at every event time — the RANGE-frame
    windowed aggregate. Rows are first collapsed to unique
    (user_id, ts) keys (sum) so window peers are unambiguous on both
    engines, then hash-partitioned on ``user_id % P`` and windowed per
    part with one vectorized pandas groupby-rolling (closed='both'
    matches SQL RANGE's inclusive frame edges). No global sort.
    """
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": _floor_units(t["value"], 100),
            }
        ),
        batch_format="pyarrow",
    )
    P = 16

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(u % P, pa.int64()))

    def window(df: pd.DataFrame) -> pd.DataFrame:
        u = (
            df.groupby(["user_id", "ts"], sort=False, as_index=False)["cents"].sum()
            .sort_values(["user_id", "ts"], ignore_index=True)
        )
        roll = (
            u.groupby("user_id", sort=False)
            .rolling("3600s", on="ts", closed="both")["cents"]
            .sum()
            .to_numpy()
            .astype(np.int64)
        )
        return pd.DataFrame(
            {
                "user_id": u["user_id"],
                "ts": _fmt_ts_us(u["ts"]),
                "cents": u["cents"],
                "roll_cents": roll,
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(window, batch_format="pandas")
    )


USER_ROLLING_SQL = """
WITH u AS (
    SELECT user_id, ts,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY user_id, ts
)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, cents,
       CAST(SUM(cents) OVER (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS roll_cents
FROM u
"""


# ------------------------------------------------------- range join


_VALUE_BANDS = [("low", 0.0, 50.0), ("mid", 50.0, 150.0),
                ("high", 150.0, 300.0), ("top", 300.0, 1e18)]


def q_value_bands(sf_dir: str):
    """Range (interval) join: events joined to a small band table on
    ``lo <= value < hi``, then aggregated per (band, event_type).

    The band table is the broadcast small side — an interval lookup via
    ``np.searchsorted`` against the shared edge array inside
    ``map_batches`` (at cluster scale the edges ship once per task via
    closure capture; a shuffle join over intervals never happens).
    Half-open [lo, hi) semantics match the SQL BETWEEN-style predicate
    exactly at the boundaries.
    """
    from ray.data.aggregate import Count, Sum

    labels = np.array([b[0] for b in _VALUE_BANDS])
    edges = np.array([b[1] for b in _VALUE_BANDS[1:]])  # inner edges

    def band(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(edges, v, side="right")
        return pa.table(
            {
                "band": pa.array(labels[idx], pa.string()),
                "event_type": t["event_type"],
                "cents": _floor_units(t["value"], 100),
            }
        )

    return (
        _read(sf_dir, "events", ["event_type", "value"])
        .map_batches(band, batch_format="pyarrow")
        .groupby(["band", "event_type"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("cents", alias_name="sum_cents"),
        )
    )


VALUE_BANDS_SQL = """
WITH bands(band, lo, hi) AS (
    VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0),
           ('high', 150.0, 300.0), ('top', 300.0, 1e18)
)
SELECT band, event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band, event_type
"""


# ------------------------------------------------ exact count-distinct


def q_daily_active_users(sf_dir: str):
    """Exact COUNT(DISTINCT) as a two-level shuffle: batches are first
    collapsed to unique (day, event_type, user_id) triples inside
    ``map_batches`` (the combiner — shuffle bytes shrink to the
    per-batch distinct set), the global groupby on the triple dedups
    across batches, and a second small groupby counts users per
    (day, event_type). No driver-side set, no count-distinct operator
    needed.
    """
    from ray.data.aggregate import Sum

    P = 16

    def day_triples(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "part": df["user_id"].to_numpy() % P,
                "day": df["ts"].dt.strftime("%Y-%m-%d"),
                "event_type": df["event_type"],
                "user_id": df["user_id"],
            }
        )
        return out.drop_duplicates(ignore_index=True)

    def part_counts(g: pd.DataFrame) -> pd.DataFrame:
        # a (day, type, user) triple lands in exactly ONE part
        # (part = f(user)), so per-part distinct counts sum exactly
        u = g.drop_duplicates(["day", "event_type", "user_id"])
        out = (
            u.groupby(["day", "event_type"], sort=False)
            .size()
            .reset_index(name="n_users")
        )
        return out

    return (
        _read(sf_dir, "events", ["ts", "event_type", "user_id"])
        .map_batches(day_triples, batch_format="pandas", batch_size=65536)
        .groupby("part")
        .map_groups(part_counts, batch_format="pandas")
        .groupby(["day", "event_type"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


DAILY_ACTIVE_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1, 2
"""


# ------------------------------------------------- top-k per group


def q_top_orders_per_segment(
    sf_dir: str, k: int = 3, dim_broadcast_limit: int = DIM_BROADCAST_LIMIT
):
    """Top-k rows per group without a global sort: the customer
    segment is broadcast onto orders (small dimension), each batch
    keeps only its own per-segment top-k (combiner — at most
    k × n_segments rows leave any batch), and the final per-segment
    ``map_groups`` re-ranks the survivors. Ties broken by orderkey so
    the result is deterministic on both engines.
    """
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["total_cents", "o_orderkey"], ascending=[False, True]
        ).head(k).reset_index(drop=True)
        g["rn"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    if cust_ds.count() <= dim_broadcast_limit:
        cust = cust_ds.to_pandas()
        seg_of = pd.Series(cust.c_mktsegment.to_numpy(), index=cust.c_custkey.to_numpy())

        def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "c_mktsegment": df["o_custkey"].map(seg_of),
                    "o_orderkey": df["o_orderkey"],
                    "total_cents": np.floor(df["o_totalprice"].to_numpy() * 100).astype(
                        np.int64
                    ),
                }
            )
            out = out.sort_values(
                ["total_cents", "o_orderkey"], ascending=[False, True]
            )
            return out.groupby("c_mktsegment", sort=False).head(k).reset_index(drop=True)

        survivors = orders.map_batches(
            partial_topk, batch_format="pandas", batch_size=65536
        )
    else:
        # guarded fallback: attach the segment via the generic hash
        # join, then run the same per-batch combiner on the joined rows
        from ..functions.joins import hash_join

        pre = orders.map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": t["o_custkey"],
                    "o_orderkey": t["o_orderkey"],
                    "total_cents": _floor_units(t["o_totalprice"], 100),
                }
            ),
            batch_format="pyarrow",
        )

        def partial_topk_joined(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["c_mktsegment", "o_orderkey", "total_cents"]].sort_values(
                ["total_cents", "o_orderkey"], ascending=[False, True]
            )
            return out.groupby("c_mktsegment", sort=False).head(k).reset_index(drop=True)

        survivors = hash_join(
            pre, cust_ds, left_on="o_custkey", right_on="c_custkey",
            num_partitions=16,
        ).map_batches(partial_topk_joined, batch_format="pandas", batch_size=65536)

    return (
        survivors.groupby("c_mktsegment")
        .map_groups(final_topk, batch_format="pandas")
    )


TOP_PER_SEGMENT_SQL = """
SELECT c_mktsegment, o_orderkey, total_cents, rn FROM (
    SELECT c_mktsegment, o_orderkey,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_cents,
           ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY CAST(FLOOR(o_totalprice * 100) AS BIGINT) DESC, o_orderkey
           ) AS rn
    FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3
"""


# --------------------------------------------- approx count-distinct


def q_approx_users_hll(sf_dir: str):
    """Approximate distinct users per event_type via the mergeable
    HyperLogLog aggregate (``functions/sketch.py``) — the sketch path
    for cardinalities where the exact two-level groupby
    (:func:`q_daily_active_users`) would itself be a heavy shuffle.

    The sketch is DETERMINISTIC (splitmix64 of the int64 key, max
    per register, closed-form estimator), so it has an EXACT DuckDB
    oracle despite being approximate (round-4 verdict item #4):
    :data:`APPROX_USERS_HLL_SQL` recomputes the identical hash with
    wrapping-u64 HUGEINT arithmetic, rebuilds the 2^12 registers with
    GROUP BY + MAX, and applies the same estimator (raw HLL with the
    2.5m linear-counting fallback, half-up rounding on both sides).
    The independent tolerance pin vs exact COUNT(DISTINCT) stays in
    ``tests/test_queries.py::test_approx_users_hll_tolerance``."""
    from ..functions.sketch import approx_distinct

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return approx_distinct(ds, "user_id", group_col="event_type", p=12)


def _approx_users_hll_sql(p: int = 12) -> str:
    """Exact SQL twin of the HLL sketch. splitmix64's wrapping-u64
    multiply is emulated in HUGEINT: for a constant C = CH·2^32 + CL
    and value y = yh·2^32 + yl,
    ``y·C mod 2^64 = ((yh·CL + yl·CH) mod 2^32)·2^32 + yl·CL (mod
    2^64)`` — every intermediate fits in 128 bits."""
    M64 = 1 << 64
    m = 1 << p
    low_mask = (1 << (64 - p)) - 1
    max_rank = 64 - p + 1

    def mulmod(y: str, c: int) -> str:
        ch, cl = c >> 32, c & 0xFFFFFFFF
        return (
            f"((((({y}) // 4294967296) * {cl} + (({y}) % 4294967296) * {ch})"
            f" % 4294967296) * 4294967296 + (({y}) % 4294967296) * {cl}) % {M64}"
        )

    def xorshift(z: str, s: int) -> str:
        # z is a HUGEINT expression < 2^64; xor needs UBIGINT
        return (
            f"CAST(xor(CAST(({z}) AS UBIGINT), "
            f"CAST(({z}) AS UBIGINT) >> {s}) AS HUGEINT)"
        )

    z0 = f"(CAST(user_id AS HUGEINT) + 11400714819323198485) % {M64}"
    z1 = mulmod(xorshift("z0", 30), 0xBF58476D1CE4E5B9)
    z2 = mulmod(xorshift("z1", 27), 0x94D049BB133111EB)
    h = f"xor(CAST(z2 AS UBIGINT), CAST(z2 AS UBIGINT) >> 31)"
    return f"""
WITH s0 AS (SELECT event_type, {z0} AS z0 FROM events),
s1 AS (SELECT event_type, {z1} AS z1 FROM s0),
s2 AS (SELECT event_type, {z2} AS z2 FROM s1),
hv AS (SELECT event_type, {h} AS h FROM s2),
rk AS (
  SELECT event_type,
         h >> {64 - p} AS idx,
         CASE WHEN (h & {low_mask}) = 0 THEN {max_rank}
              ELSE {max_rank} - length(bin(h & {low_mask}))
         END AS rank
  FROM hv
),
regs AS (
  SELECT event_type, idx, MAX(rank) AS r FROM rk GROUP BY event_type, idx
),
agg AS (
  SELECT event_type,
         COUNT(*) AS present,
         SUM(1.0 / CAST(CAST(1 AS UBIGINT) << r AS DOUBLE)) AS s
  FROM regs GROUP BY event_type
),
est AS (
  SELECT event_type,
         0.7213 / (1.0 + 1.079 / {m}.0) * {m}.0 * {m}.0
             / (({m} - present) + s) AS raw,
         {m} - present AS zeros
  FROM agg
)
SELECT event_type,
       CAST(floor(CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                       THEN {m}.0 * ln({m}.0 / zeros)
                       ELSE raw END + 0.5) AS BIGINT) AS approx_distinct
FROM est
"""


APPROX_USERS_HLL_SQL = _approx_users_hll_sql()


# ------------------------------------------------- exact quantiles


_QUANTILES = (0.25, 0.5, 0.75, 0.95)


def _exact_int_quantiles(
    cents_ds, quantiles, stats: tuple[int, int, int] | None = None
) -> list[int] | None:
    """EXACT distributed quantiles of an integer ``cents`` column by
    iterative bin narrowing — no global sort, no shuffle, and nothing
    row-sized or distinct-value-sized ever reaches the driver.

    Pass 0 aggregates (min, max, count). Each subsequent pass bins
    every quantile's current [lo, hi] range into ``NB`` fixed-width
    integer bins; a batch emits ONE row of bin counts (metadata-sized
    regardless of row count), the driver sums them, locates the bin
    holding each quantile's rank, and narrows. Integer domains
    converge to width-1 bins in ``log_NB(range)`` passes (two for
    cent prices), at which point the bin IS the exact value — so a
    heavy-duplicate value can never blow up a collection step, because
    there is none. Each pass is one column-pruned streaming scan.

    Quantile semantics match DuckDB ``quantile_disc``: the element at
    0-based index ``ceil(q·n) - 1`` of the sorted values. Returns one
    exact value per requested quantile, or None on an empty input.
    """
    return _exact_int_order_stats(
        cents_ds,
        lambda n: [max(int(np.ceil(q * n)), 1) - 1 for q in quantiles],
        stats=stats,
    )


def _footer_int_stats(
    sf_dir: str, table: str, col: str, scale: int
) -> tuple[int, int, int] | None:
    """(lo, hi, n) of ``floor(col·scale)`` from parquet FOOTER
    statistics only — no scan. ``floor(x·scale)`` is monotone in x, so
    the exact integer min/max follow from the column's double min/max;
    n is the footer row count. Returns None (→ caller falls back to an
    aggregate pass) unless every row group carries min/max stats and
    records null_count == 0 — the stats of a column WITH nulls exclude
    them from min/max but the rank math needs the exact non-null n."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(os.path.join(sf_dir, f"{table}.parquet")).metadata
    except OSError:
        return None
    lo = hi = None
    n = 0
    idx = None
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        if idx is None:
            idx = next(
                (
                    i
                    for i in range(g.num_columns)
                    if g.column(i).path_in_schema == col
                ),
                None,
            )
            if idx is None:
                return None
        c = g.column(idx)
        s = c.statistics
        if (
            s is None
            or not s.has_min_max
            or s.null_count is None
            or s.null_count != 0
        ):
            return None
        lo = s.min if lo is None else min(lo, s.min)
        hi = s.max if hi is None else max(hi, s.max)
        n += g.num_rows
    if lo is None or n == 0:
        return None
    return (
        int(np.floor(float(lo) * scale)),
        int(np.floor(float(hi) * scale)),
        n,
    )


def _exact_int_order_stats(
    cents_ds, make_ranks, stats: tuple[int, int, int] | None = None
) -> list[int] | None:
    """Core bin-narrowing engine: exact values at arbitrary 0-based
    sorted ranks of an integer ``cents`` column. ``make_ranks(n)``
    returns the target rank list once the count is known (lets callers
    express quantile_disc ranks, quantile_cont's floor/ceil rank pairs,
    or top-k thresholds uniformly). See :func:`_exact_int_quantiles`
    for the pass structure and scale argument.

    ``stats=(lo, hi, n)`` skips pass 0 entirely — callers whose cents
    column is a monotone map of a raw parquet column get these for
    free from footer statistics (:func:`_footer_int_stats`), cutting
    the engine from 3 streaming scans to 2."""
    from ray.data.aggregate import Count, Max, Min

    NB = 4096

    if stats is None:
        agg = cents_ds.aggregate(
            Min("cents", alias_name="lo"),
            Max("cents", alias_name="hi"),
            Count(alias_name="n"),
        )
        stats = (
            int(agg["lo"]) if agg["n"] else 0,
            int(agg["hi"]) if agg["n"] else 0,
            int(agg["n"]),
        )
    glo, ghi, n = stats
    if n == 0:
        return None
    # per rank: current range, ranks below lo
    state = [
        {"rank": int(r), "lo": int(glo), "hi": int(ghi), "below": 0}
        for r in make_ranks(n)
    ]
    while any(s["hi"] > s["lo"] for s in state):
        ranges = [
            (s["lo"], max(1, (s["hi"] - s["lo"] + NB) // NB)) for s in state
        ]

        his = [s["hi"] for s in state]

        def bin_counts(t: pa.Table, ranges=ranges, his=his) -> pa.Table:
            v = t["cents"].to_numpy(zero_copy_only=False)
            rows = []
            for (lo, width), hi in zip(ranges, his):
                # out-of-range values are EXCLUDED: below-lo ranks are
                # already in `below`, clipping would double-count them
                m = v[(v >= lo) & (v <= hi)]
                idx = np.minimum((m - lo) // width, NB - 1)
                rows.append(np.bincount(idx, minlength=NB))
            return pa.table(
                {"counts": pa.array([np.concatenate(rows).tolist()],
                                    pa.list_(pa.int64()))}
            )

        parts = cents_ds.map_batches(bin_counts, batch_format="pyarrow").take_all()
        total = np.sum(
            [np.asarray(r["counts"], dtype=np.int64) for r in parts], axis=0
        ).reshape(len(state), NB)
        for i, s in enumerate(state):
            if s["hi"] <= s["lo"]:
                continue
            lo, width = ranges[i]
            cum = np.cumsum(total[i])
            b = int(np.searchsorted(cum, s["rank"] - s["below"] + 1, side="left"))
            s["below"] += int(cum[b - 1]) if b else 0
            s["lo"] = lo + b * width
            s["hi"] = min(s["hi"], lo + (b + 1) * width - 1)
    return [int(s["lo"]) for s in state]


def q_price_quantiles(sf_dir: str):
    """Exact lineitem price quantiles (see :func:`_exact_int_quantiles`)."""
    cents_ds = _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        lambda t: pa.table({"cents": _floor_units(t["l_extendedprice"], 100)}),
        batch_format="pyarrow",
    )
    vals = _exact_int_quantiles(
        cents_ds,
        _QUANTILES,
        stats=_footer_int_stats(sf_dir, "lineitem", "l_extendedprice", 100),
    )
    if vals is None:
        return pd.DataFrame({"q": [], "cents": pd.array([], dtype="int64")})
    return pd.DataFrame(
        {"q": list(_QUANTILES), "cents": pd.array(vals, dtype="int64")}
    )


def q_order_quartiles(sf_dir: str):
    """Global quartile assignment WITHOUT a global sort or NTILE: the
    exact q1/q2/q3 boundaries come from the bin-narrowing quantile
    passes (metadata-sized partials only), then ONE more streaming
    pass buckets every order by ``searchsorted`` against the three
    boundaries with an in-batch partial aggregate (≤ 4 keys/batch).
    Boundary semantics are explicit (``cents <= qK``) rather than
    NTILE's row-count split, so ties are deterministic on both
    engines."""
    from ray.data.aggregate import Count, Sum

    cents_ds = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        lambda t: pa.table({"cents": _floor_units(t["o_totalprice"], 100)}),
        batch_format="pyarrow",
    )
    bounds = _exact_int_quantiles(
        cents_ds,
        (0.25, 0.5, 0.75),
        stats=_footer_int_stats(sf_dir, "orders", "o_totalprice", 100),
    )
    if bounds is None:
        return pd.DataFrame(
            {"quartile": pd.array([], dtype="int64"),
             "n_orders": pd.array([], dtype="int64"),
             "sum_cents": pd.array([], dtype="int64")}
        )
    b = np.asarray(bounds, dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        v = t["cents"].to_numpy(zero_copy_only=False)
        quart = np.searchsorted(b, v, side="left") + 1
        df = pd.DataFrame({"quartile": quart.astype(np.int64), "cents": v})
        agg = df.groupby("quartile", as_index=False).agg(
            n_orders=("cents", "size"), sum_cents=("cents", "sum")
        )
        agg["n_orders"] = agg["n_orders"].astype("int64")
        return pa.Table.from_pandas(agg, preserve_index=False)

    return (
        cents_ds.map_batches(assign, batch_format="pyarrow")
        .groupby("quartile")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("sum_cents", alias_name="sum_cents"),
        )
    )


def _grouped_int_order_stats(ds, make_ranks):
    """GROUPED order statistics without a sort — the grouped
    generalization of :func:`_exact_int_order_stats`. ``ds`` has
    columns (flag, cents); ``make_ranks(n)`` gives the target 0-based
    ranks for a group of ``n`` rows (same rank set shape per group).
    Pass 0 is one small groupby (per-group min/max/count); each
    narrowing pass emits ONE (groups × ranks × NB)-count row per
    batch, so the driver state stays groups-sized while the fact table
    is only ever scanned. Returns (flags, n_per_group, values[group][rank])
    or None on empty input."""
    from ray.data.aggregate import Count, Max, Min

    NB = 4096

    stats = (
        ds.groupby("flag")
        .aggregate(
            Min("cents", alias_name="lo"),
            Max("cents", alias_name="hi"),
            Count(alias_name="n"),
        )
        .to_pandas()  # groups-sized
        .sort_values("flag")
        .reset_index(drop=True)
    )
    if len(stats) == 0:
        return None
    flags = list(stats["flag"])
    ns = [int(r.n) for r in stats.itertuples()]
    state = []   # one entry per (group, rank), group-major
    gidx = []    # state index → group index
    for gi, r in enumerate(stats.itertuples()):
        for rk in make_ranks(int(r.n)):
            state.append(
                {"rank": int(rk), "lo": int(r.lo), "hi": int(r.hi), "below": 0}
            )
            gidx.append(gi)
    while any(s["hi"] > s["lo"] for s in state):
        ranges = [
            (s["lo"], max(1, (s["hi"] - s["lo"] + NB) // NB)) for s in state
        ]
        his = [s["hi"] for s in state]
        state_flags = [flags[g] for g in gidx]

        def bin_counts(t: pa.Table, ranges=ranges, his=his,
                       state_flags=state_flags) -> pa.Table:
            flag_arr = t["flag"].to_numpy(zero_copy_only=False)
            v = t["cents"].to_numpy(zero_copy_only=False)
            rows = []
            for g, ((lo, width), hi) in zip(state_flags, zip(ranges, his)):
                m = v[(flag_arr == g) & (v >= lo) & (v <= hi)]
                idx = np.minimum((m - lo) // width, NB - 1)
                rows.append(np.bincount(idx, minlength=NB))
            return pa.table(
                {"counts": pa.array([np.concatenate(rows).tolist()],
                                    pa.list_(pa.int64()))}
            )

        parts = ds.map_batches(bin_counts, batch_format="pyarrow").take_all()
        total = np.sum(
            [np.asarray(r["counts"], dtype=np.int64) for r in parts], axis=0
        ).reshape(len(state), NB)
        for i, s in enumerate(state):
            if s["hi"] <= s["lo"]:
                continue
            lo, width = ranges[i]
            cum = np.cumsum(total[i])
            b = int(np.searchsorted(cum, s["rank"] - s["below"] + 1, side="left"))
            s["below"] += int(cum[b - 1]) if b else 0
            s["lo"] = lo + b * width
            s["hi"] = min(s["hi"], lo + (b + 1) * width - 1)
    per_group: list[list[int]] = [[] for _ in flags]
    for s, g in zip(state, gidx):
        per_group[g].append(int(s["lo"]))
    return flags, ns, per_group


def _flag_cents_ds(sf_dir: str):
    return _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"]).map_batches(
        lambda t: pa.table(
            {
                "flag": t["l_returnflag"],
                "cents": _floor_units(t["l_extendedprice"], 100),
            }
        ),
        batch_format="pyarrow",
    )


def q_flag_median_price(sf_dir: str):
    """GROUPED exact quantile (quantile_disc) — see
    :func:`_grouped_int_order_stats`."""
    res = _grouped_int_order_stats(
        _flag_cents_ds(sf_dir),
        lambda n: [max(int(np.ceil(0.5 * n)), 1) - 1],
    )
    if res is None:
        return pd.DataFrame(
            {"l_returnflag": pd.array([], dtype="str"),
             "median_cents": pd.array([], dtype="int64")}
        )
    flags, _, vals = res
    return pd.DataFrame(
        {"l_returnflag": flags,
         "median_cents": pd.array([v[0] for v in vals], dtype="int64")}
    )


def q_flag_median_cont(sf_dir: str):
    """GROUPED interpolated median (quantile_cont semantics): each
    group fetches its floor/ceil order-statistic pair in the SAME
    shared narrowing passes, the driver interpolates two ints per
    group. ``×2`` keeps the oracle column integral (an even-n median
    is the average of two ints)."""
    res = _grouped_int_order_stats(
        _flag_cents_ds(sf_dir),
        lambda n: [int(np.floor(0.5 * (n - 1))), int(np.ceil(0.5 * (n - 1)))],
    )
    if res is None:
        return pd.DataFrame(
            {"l_returnflag": pd.array([], dtype="str"),
             "median_cents_x2": pd.array([], dtype="int64")}
        )
    flags, _, vals = res
    return pd.DataFrame(
        {"l_returnflag": flags,
         "median_cents_x2": pd.array(
             [v[0] + v[1] for v in vals], dtype="int64"
         )}
    )


FLAG_MEDIAN_CONT_SQL = """
SELECT l_returnflag,
       CAST(ROUND(quantile_cont(CAST(FLOOR(l_extendedprice * 100) AS BIGINT),
                                0.5) * 2) AS BIGINT) AS median_cents_x2
FROM lineitem
GROUP BY l_returnflag
"""


def q_events_pivot(sf_dir: str):
    """PIVOT / crosstab: per user, one count column per event type.
    The column set is discovered first from the (tiny) distinct
    event-type list, then ONE streaming pass pivots in-batch (pandas
    crosstab per batch — at most users-in-batch × types cells leave a
    batch) and the partials merge on the bounded ``user_id % P`` part
    key with a per-part vectorized sum (a raw user-cardinality
    ``.aggregate()`` pays Ray 2.49's ~1–2 ms/group reduce cost —
    BASELINE.md round-5 cliff note). No generic wide shuffle: the
    pivot is a combiner."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    # in-batch distinct combiner first: the unique() shuffle only sees
    # (types × blocks) rows, never the fact table
    types = sorted(
        ds.map_batches(
            lambda t: pa.table(
                {"event_type": pc.unique(t["event_type"])}
            ),
            batch_format="pyarrow",
        ).unique("event_type")
    )
    cols = [f"n_{t}" for t in types]

    def pivot(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "event_type": t["event_type"].to_pylist(),
            }
        )
        ct = pd.crosstab(df["user_id"], df["event_type"])
        ct = ct.reindex(columns=types, fill_value=0).astype("int64")
        ct.columns = cols
        out = ct.reset_index()
        out.insert(0, "part", out["user_id"].to_numpy().astype(np.int64) % 16)
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", sort=False, as_index=False)[cols].sum()

    return (
        ds.map_batches(pivot, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge_part, batch_format="pandas")
    )


def q_lineitem_unpivot(sf_dir: str):
    """UNPIVOT / melt (the pivot's inverse): each lineitem row becomes
    one (key, measure, value) row per integer-scaled measure — pure
    in-batch column restacking (zero shuffle, streaming-friendly at
    any scale)."""
    measures = [
        ("qty", "l_quantity", 1),
        ("price_cents", "l_extendedprice", 100),
        ("tax_e4", "l_tax", 10000),
    ]

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        ln = t["l_linenumber"].to_numpy(zero_copy_only=False)
        keys_ok, keys_ln, names, vals = [], [], [], []
        for name, col, scale in measures:
            keys_ok.append(ok)
            keys_ln.append(ln)
            names.extend([name] * n)
            vals.append(
                np.floor(t[col].to_numpy(zero_copy_only=False) * scale).astype(np.int64)
            )
        return pa.table(
            {
                "l_orderkey": pa.array(np.concatenate(keys_ok), pa.int64()),
                "l_linenumber": pa.array(np.concatenate(keys_ln), pa.int64()),
                "measure": pa.array(names, pa.string()),
                "value": pa.array(np.concatenate(vals), pa.int64()),
            }
        )

    return _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_tax"],
    ).map_batches(melt, batch_format="pyarrow")


LINEITEM_UNPIVOT_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       'qty' AS measure, CAST(FLOOR(l_quantity) AS BIGINT) AS value FROM lineitem
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
       'price_cents', CAST(FLOOR(l_extendedprice * 100) AS BIGINT) FROM lineitem
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
       'tax_e4', CAST(FLOOR(l_tax * 10000) AS BIGINT) FROM lineitem
"""


EVENTS_PIVOT_SQL = """
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
FROM events
GROUP BY user_id
"""


FLAG_MEDIAN_SQL = """
SELECT l_returnflag,
       quantile_disc(CAST(FLOOR(l_extendedprice * 100) AS BIGINT), 0.5)
           AS median_cents
FROM lineitem
GROUP BY l_returnflag
"""


ORDER_QUARTILES_SQL = """
WITH v AS (SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
b AS (
  SELECT quantile_disc(cents, 0.25) AS q1,
         quantile_disc(cents, 0.50) AS q2,
         quantile_disc(cents, 0.75) AS q3
  FROM v
)
SELECT CASE WHEN cents <= q1 THEN 1
            WHEN cents <= q2 THEN 2
            WHEN cents <= q3 THEN 3
            ELSE 4 END AS quartile,
       COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM v, b
GROUP BY 1
"""


PRICE_QUANTILES_SQL = """
WITH v AS (SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem)
SELECT 0.25 AS q, quantile_disc(cents, 0.25) AS cents FROM v
UNION ALL SELECT 0.50, quantile_disc(cents, 0.50) FROM v
UNION ALL SELECT 0.75, quantile_disc(cents, 0.75) FROM v
UNION ALL SELECT 0.95, quantile_disc(cents, 0.95) FROM v
"""


# ------------------------------------------------------ rollup


def q_qty_rollup(sf_dir: str):
    """ROLLUP (hierarchical subtotal) aggregate: sum of quantities by
    (returnflag, linestatus), by returnflag, and the grand total, in
    one pass. Only the FINEST level touches the fact table; the
    coarser levels re-aggregate the group-sized result driver-side
    (≤ flags × statuses rows), so no second scan and no extra shuffle.
    NULL grouping keys are COALESCEd to 'ALL' on both engines.
    """
    from ray.data.aggregate import Sum

    def qty(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": _floor_units(t["l_quantity"], 1),
            }
        )

    fine = (
        _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
        .map_batches(qty, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty", alias_name="sum_qty"))
        .to_pandas()  # group-sized: |flags| x |statuses| rows
    )
    lvl1 = (
        fine.groupby("l_returnflag", as_index=False)["sum_qty"].sum()
        .assign(l_linestatus="ALL")
    )
    total = pd.DataFrame(
        {"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
         "sum_qty": [fine["sum_qty"].sum()]}
    )
    out = pd.concat([fine, lvl1, total], ignore_index=True)
    out["sum_qty"] = out["sum_qty"].astype("int64")
    return out[["l_returnflag", "l_linestatus", "sum_qty"]]


def q_qty_grouping_sets(sf_dir: str):
    """GROUPING SETS with ARBITRARY (non-hierarchical) sets —
    ((returnflag, linestatus), (ship_month)) — the construct ROLLUP/CUBE
    can't express: one fact-table pass groups by the UNION of all set
    columns (flags × statuses × months — still group-sized), then each
    requested set re-aggregates that tiny result driver-side. NULL
    keys COALESCEd to 'ALL' on both engines."""
    from ray.data.aggregate import Sum

    def qty(t: pa.Table) -> pa.Table:
        months = pc.strftime(t["l_shipdate"], format="%Y-%m")
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "ship_month": months,
                "qty": _floor_units(t["l_quantity"], 1),
            }
        )

    fine = (
        _read(
            sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_shipdate", "l_quantity"],
        )
        .map_batches(qty, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus", "ship_month"])
        .aggregate(Sum("qty", alias_name="sum_qty"))
        .to_pandas()  # group-sized: flags x statuses x months rows
    )
    set1 = (
        fine.groupby(["l_returnflag", "l_linestatus"], as_index=False)["sum_qty"]
        .sum()
        .assign(ship_month="ALL")
    )
    set2 = (
        fine.groupby("ship_month", as_index=False)["sum_qty"]
        .sum()
        .assign(l_returnflag="ALL", l_linestatus="ALL")
    )
    out = pd.concat([set1, set2], ignore_index=True)
    out["sum_qty"] = out["sum_qty"].astype("int64")
    return out[["l_returnflag", "l_linestatus", "ship_month", "sum_qty"]]


QTY_GROUPING_SETS_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       COALESCE(strftime(l_shipdate, '%Y-%m'), 'ALL') AS ship_month,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (strftime(l_shipdate, '%Y-%m')))
"""


QTY_ROLLUP_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def q_qty_cube(sf_dir: str):
    """CUBE (all grouping sets over two dims) in ONE fact-table pass:
    like the ROLLUP, only the finest (flag, status) level scans the
    data; the three coarser sets — (flag), (status), () — re-aggregate
    the group-sized finest result driver-side."""
    from ray.data.aggregate import Sum

    def qty(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": _floor_units(t["l_quantity"], 1),
            }
        )

    fine = (
        _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
        .map_batches(qty, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty", alias_name="sum_qty"))
        .to_pandas()  # group-sized: |flags| x |statuses| rows
    )
    by_flag = (
        fine.groupby("l_returnflag", as_index=False)["sum_qty"].sum()
        .assign(l_linestatus="ALL")
    )
    by_status = (
        fine.groupby("l_linestatus", as_index=False)["sum_qty"].sum()
        .assign(l_returnflag="ALL")
    )
    total = pd.DataFrame(
        {"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
         "sum_qty": [fine["sum_qty"].sum()]}
    )
    out = pd.concat([fine, by_flag, by_status, total], ignore_index=True)
    out["sum_qty"] = out["sum_qty"].astype("int64")
    return out[["l_returnflag", "l_linestatus", "sum_qty"]]


QTY_CUBE_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


# ------------------------------------------------- lag window (gaps)


def q_user_event_gaps(sf_dir: str):
    """LAG window: per user, the count and total of microsecond gaps
    between consecutive events (time ordered). Users hash-partition on
    ``user_id % P`` (a user's events land in exactly one part), each
    part sorts only its own rows and takes vectorized diffs — no
    global sort. Integer outputs (count + sum of gaps) keep the oracle
    hash exact; equal-timestamp ties don't matter because consecutive
    diffs of a sorted multiset are permutation-invariant.
    """
    P = 16

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(u % P, pa.int64()))

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["user_id", "ts"], ignore_index=True)
        gap = s.groupby("user_id", sort=False)["ts"].diff()
        keep = gap.notna()
        g = pd.DataFrame(
            {
                "user_id": s.loc[keep, "user_id"],
                "gap_us": (gap[keep].dt.total_seconds() * 1e6).round().astype(np.int64),
            }
        )
        out = g.groupby("user_id", as_index=False).agg(
            n_gaps=("gap_us", "size"), sum_gap_us=("gap_us", "sum")
        )
        out["n_gaps"] = out["n_gaps"].astype("int64")
        return out

    return (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(add_part, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(gaps, batch_format="pandas")
    )


def q_user_cumulative_spend(sf_dir: str):
    """Running-total window (cumulative frame — the third window shape
    next to the LAG diff and the trailing-RANGE sum): per customer, the
    cumulative order spend in date order. Customers hash-partition on
    ``o_custkey % P`` (a customer's orders land in exactly one part);
    each part sorts only its own rows and takes a vectorized groupby
    cumsum — no global sort. Integer cents keep the oracle hash exact;
    (date, orderkey) ordering makes ties deterministic on both engines.
    """
    P = 16

    def add_part(t: pa.Table) -> pa.Table:
        u = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": t["o_orderdate"],
                "cents": _floor_units(t["o_totalprice"], 100),
                "part": pa.array(u % P, pa.int64()),
            }
        )

    def running(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], ignore_index=True
        )
        s["cum_spend_cents"] = s.groupby("o_custkey", sort=False)["cents"].cumsum()
        return s[["o_custkey", "o_orderkey", "cum_spend_cents"]]

    return (
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
        .map_batches(add_part, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(running, batch_format="pandas")
    )


USER_CUMULATIVE_SPEND_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS cum_spend_cents
FROM orders
"""


USER_EVENT_GAPS_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
FROM (
    SELECT user_id,
           date_diff('microsecond',
                     LAG(ts) OVER (PARTITION BY user_id ORDER BY ts),
                     ts) AS gap_us
    FROM events
)
WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


# --------------------------------------------- interpolated percentiles


def q_price_percentile_cont(sf_dir: str):
    """EXACT interpolated percentiles (``quantile_cont`` semantics) via
    the same bin-narrowing engine — no global sort. For percentile p the
    continuous rank is ``h = p·(n-1)``; the engine fetches the exact
    order statistics at ``floor(h)`` and ``ceil(h)`` (one shared set of
    streaming passes for all percentiles), and the interpolation
    ``x0 + (h - floor(h))·(x1 - x0)`` happens driver-side on two ints.
    With quarter percentiles every interpolated value × 4 is integral,
    so the oracle-checked column is ``cents_x4 = round(value·4)`` — an
    exact integer on both engines (DuckDB quantile_cont uses the same
    linear h = p·(n-1) rule)."""
    PS = (0.25, 0.5, 0.75)
    cents_ds = _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        lambda t: pa.table({"cents": _floor_units(t["l_extendedprice"], 100)}),
        batch_format="pyarrow",
    )

    holder: dict[str, int] = {}

    def ranks(n: int) -> list[int]:
        holder["n"] = n
        out = []
        for p in PS:
            h = p * (n - 1)
            out.extend([int(np.floor(h)), int(np.ceil(h))])
        return out

    vals = _exact_int_order_stats(
        cents_ds,
        ranks,
        stats=_footer_int_stats(sf_dir, "lineitem", "l_extendedprice", 100),
    )
    if vals is None:
        return pd.DataFrame(
            {"p_x100": pd.array([], dtype="int64"),
             "cents_x4": pd.array([], dtype="int64")}
        )
    n = holder["n"]
    out = []
    for i, p in enumerate(PS):
        h = p * (n - 1)
        x0, x1 = vals[2 * i], vals[2 * i + 1]
        frac = h - np.floor(h)  # exact binary fraction for quarter p
        out.append(int(round((x0 + frac * (x1 - x0)) * 4)))
    return pd.DataFrame(
        {"p_x100": pd.array([int(p * 100) for p in PS], dtype="int64"),
         "cents_x4": pd.array(out, dtype="int64")}
    )


PRICE_PERCENTILE_CONT_SQL = """
WITH t AS (SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem)
SELECT CAST(25 AS BIGINT) AS p_x100,
       CAST(ROUND(quantile_cont(cents, 0.25) * 4) AS BIGINT) AS cents_x4 FROM t
UNION ALL
SELECT CAST(50 AS BIGINT),
       CAST(ROUND(quantile_cont(cents, 0.50) * 4) AS BIGINT) FROM t
UNION ALL
SELECT CAST(75 AS BIGINT),
       CAST(ROUND(quantile_cont(cents, 0.75) * 4) AS BIGINT) FROM t
"""


# --------------------------------------------------- argmin per group


def q_cheapest_supplier_per_part(sf_dir: str):
    """Argmin-per-group (TPC-H Q2's min-cost-supplier shape): for every
    part, the supplier row with the lowest price, deterministic ties by
    suppkey. The lexicographic pair (cents, suppkey) is ENCODED into
    one int64 (``cents·2^20 + suppkey``, valid while suppkey < 2^20 —
    TPC-H suppliers reach 2^20 only past sf100; assert-guarded), so
    both levels are a native ``Min``: an in-batch partial argmin (ONE
    row per part leaves a batch — vectorized sort+dedup, no per-group
    loop) and an arrow-level ``groupby.aggregate(Min)`` — NOT
    ``map_groups``, which pays per-group pandas overhead at part
    cardinality (measured 11 s → this shape ~2 s at sf0.1)."""
    from ray.data.aggregate import Min

    SHIFT = 1 << 20

    def partial(t: pa.Table) -> pa.Table:
        part = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        supp = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if supp.max(initial=0) >= SHIFT:  # not assert: survives python -O
            raise ValueError("suppkey exceeds int64-encode width 2^20")
        cents = _floor_units(t["l_extendedprice"], 100).to_numpy()
        enc = cents * SHIFT + supp
        # vectorized per-part min: sort by (part, enc), keep group heads
        order = np.lexsort((enc, part))
        part, enc = part[order], enc[order]
        heads = np.flatnonzero(np.r_[True, part[1:] != part[:-1]])
        return pa.table(
            {
                "l_partkey": pa.array(part[heads], pa.int64()),
                "enc": pa.array(enc[heads], pa.int64()),
            }
        )

    def decode(t: pa.Table) -> pa.Table:
        enc = t["enc"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "cheapest_suppkey": pa.array(enc % SHIFT, pa.int64()),
                "min_price_cents": pa.array(enc // SHIFT, pa.int64()),
            }
        )

    return (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("l_partkey")
        .aggregate(Min("enc", alias_name="enc"))
        .map_batches(decode, batch_format="pyarrow")
    )


CHEAPEST_SUPPLIER_SQL = """
SELECT l_partkey, cheapest_suppkey, min_price_cents
FROM (
    SELECT l_partkey, l_suppkey AS cheapest_suppkey,
           CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS min_price_cents,
           ROW_NUMBER() OVER (
               PARTITION BY l_partkey
               ORDER BY FLOOR(l_extendedprice * 100), l_suppkey
           ) AS rn
    FROM lineitem
)
WHERE rn = 1
"""


# ------------------------------------------------------ mode per group


def q_priority_mode_by_status(sf_dir: str):
    """MODE per group (most frequent o_orderpriority per orderstatus,
    lexicographically-smallest tie rule, made explicit so both engines
    agree). Two-level counting: in-batch (status, priority) partial
    counts (≤ 3×5 keys/batch) → global groupby sum → per-status argmax
    on a groups-sized table. The fact table is scanned once; nothing
    value-sized shuffles."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderstatus": t["o_orderstatus"].to_pandas(),
                "mode_priority": t["o_orderpriority"].to_pandas(),
            }
        )
        agg = df.groupby(
            ["o_orderstatus", "mode_priority"], as_index=False
        ).size()
        return pa.Table.from_pandas(
            agg.rename(columns={"size": "cnt"}), preserve_index=False
        )

    counts = (
        _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
        .map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby(["o_orderstatus", "mode_priority"])
        .aggregate(Sum("cnt", alias_name="n_orders"))
        .to_pandas()  # groups-sized: |status| × |priority| ≤ 15 rows
    )
    counts = counts.sort_values(
        ["o_orderstatus", "n_orders", "mode_priority"],
        ascending=[True, False, True],
        ignore_index=True,
    )
    return counts.drop_duplicates("o_orderstatus", keep="first")[
        ["o_orderstatus", "mode_priority", "n_orders"]
    ]


PRIORITY_MODE_SQL = """
SELECT o_orderstatus, mode_priority, n_orders
FROM (
    SELECT o_orderstatus, o_orderpriority AS mode_priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY COUNT(*) DESC, o_orderpriority
           ) AS rn
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
)
WHERE rn = 1
"""


# ------------------------------------------- ROWS-frame moving window


def q_user_moving_sum3(sf_dir: str):
    """ROWS-frame moving window (3rd frame type next to the trailing
    RANGE sum and the cumulative frame): per user, the sum of the
    current + two previous event values in time order. Same partition
    discipline as the other windows: ``user_id % P`` hash parts, each
    part sorts only its own rows, vectorized per-user rolling sum. Ties
    broken by event_id on both engines; integer value-cents keep the
    hash exact."""
    P = 16

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": t["ts"],
                "cents": _floor_units(t["value"], 100),
                "part": pa.array(u % P, pa.int64()),
            }
        )

    def rolling(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        s["moving_cents"] = (
            s.groupby("user_id", sort=False)["cents"]
            .rolling(3, min_periods=1)
            .sum()
            .reset_index(drop=True)
            .astype(np.int64)
        )
        return s[["user_id", "event_id", "moving_cents"]]

    return (
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
        .map_batches(add_part, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(rolling, batch_format="pandas")
    )


USER_MOVING_SUM3_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS moving_cents
FROM events
"""


# --------------------------------------------------- salted groupby


def q_events_by_type_salted(sf_dir: str):
    """Hot-key aggregation with EXPLICIT salting: event_type has ~5
    values over the whole corpus — a plain groupby hashes everything to
    5 reducers no matter the cluster size. Stage 1 groups by
    (event_type, salt) with salt = event_id % S, spreading each hot key
    over S reducers; stage 2 re-aggregates the S×5-row result. The
    in-batch partial combiner still applies before stage 1, so what
    shuffles is ≤ keys×S×batches rows. Result == plain GROUP BY."""
    from ray.data.aggregate import Sum

    S = 32

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "salt": t["event_id"].to_numpy(zero_copy_only=False) % S,
                "cents": _floor_units(t["value"], 100),
                "n": np.ones(t.num_rows, dtype=np.int64),
            }
        )
        agg = df.groupby(["event_type", "salt"], as_index=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    salted = (
        _read(sf_dir, "events", ["event_type", "event_id", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby(["event_type", "salt"])
        .aggregate(Sum("cents", alias_name="c"), Sum("n", alias_name="k"))
    )
    return (
        salted.groupby("event_type")
        .aggregate(Sum("c", alias_name="sum_cents"), Sum("k", alias_name="n_events"))
    )


EVENTS_BY_TYPE_SALTED_SQL = """
SELECT event_type,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
"""


# ------------------------------------------------- distributed set ops


def _hour_type_masks(sf_dir: str, types: tuple[str, str]):
    """One streaming pass for INTERSECT/EXCEPT over event-hour sets:
    each batch emits per-hour 0/1 presence columns (one per event
    type) — vectorized per-key OR via sort + ``bitwise_or.reduceat``,
    no Python per-group loop — and a single groupby merges each
    presence column with Max (Max over {0,1} IS boolean OR; a packed
    bitmask under Max would be wrong: Max(1, 2)=2 != OR(1, 2)=3, so an
    hour whose two types never co-occur in one batch would lose a
    bit). The set algebra runs on the merged presence columns, so BOTH
    set operations cost ONE key-shuffle of pre-combined rows instead
    of two distinct passes plus a join."""
    from ray.data.aggregate import Max

    bit = {t: 1 << i for i, t in enumerate(types)}

    def partial(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        hr = ts_us // 3_600_000_000
        m = (
            t["event_type"].to_pandas().map(bit).fillna(0).astype(np.int64).to_numpy()
        )
        keep = m > 0
        u, m = hr[keep], m[keep]
        if len(u) == 0:
            return pa.table(
                {"hr": pa.array([], pa.int64()),
                 "b0": pa.array([], pa.int64()),
                 "b1": pa.array([], pa.int64())}
            )
        order = np.argsort(u, kind="stable")
        u, m = u[order], m[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        masks = np.bitwise_or.reduceat(m, starts)
        return pa.table(
            {"hr": pa.array(u[starts], pa.int64()),
             "b0": pa.array(masks & 1, pa.int64()),
             "b1": pa.array((masks >> 1) & 1, pa.int64())}
        )

    return (
        _read(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("hr")
        .aggregate(Max("b0", alias_name="b0"), Max("b1", alias_name="b1"))
    )


def q_hours_intersect(sf_dir: str):
    """INTERSECT: epoch-hours with BOTH a purchase and an error event
    (see :func:`_hour_type_masks` for the single-shuffle presence-bit
    design)."""
    masks = _hour_type_masks(sf_dir, ("purchase", "error"))
    return masks.filter(expr="b0 == 1 and b1 == 1").select_columns(["hr"])


HOURS_INTERSECT_SQL = """
SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr FROM events
WHERE event_type = 'purchase'
INTERSECT
SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr FROM events
WHERE event_type = 'error'
"""


def q_hours_except(sf_dir: str):
    """EXCEPT: epoch-hours with a purchase event but NO error event —
    same single presence-bit pass, different final filter."""
    masks = _hour_type_masks(sf_dir, ("purchase", "error"))
    return masks.filter(expr="b0 == 1 and b1 == 0").select_columns(["hr"])


HOURS_EXCEPT_SQL = """
SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr FROM events
WHERE event_type = 'purchase'
EXCEPT
SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hr FROM events
WHERE event_type = 'error'
"""


# ------------------------------------------------- RANK() with ties


def q_top_orders_rank_ties(sf_dir: str):
    """Per-group top-N by RANK() WITH TIES (unlike the ROW_NUMBER cap
    of ``q_top_orders_per_segment``, ties at the boundary all survive).
    Pass 1: per-batch partial top-3 rows per priority (≤ 15 rows leave
    any batch) → per-priority merge gives the 3rd-highest row value v3
    (rows with rank ≤ 3 are EXACTLY those ≥ v3: at most 2 rows sit
    strictly above v3, and anything below has the top-3 above it).
    Pass 2: streaming filter ``cents >= v3[priority]`` (broadcast
    5-entry threshold map), then rank assignment inside a per-priority
    ``map_groups`` over the output-sized survivor set."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderpriority": t["o_orderpriority"].to_pandas(),
                "o_orderkey": t["o_orderkey"].to_numpy(zero_copy_only=False),
                "cents": _floor_units(t["o_totalprice"], 100),
            }
        )
        df = df.sort_values(
            ["o_orderpriority", "cents"], ascending=[True, False],
            ignore_index=True,
        )
        return pa.Table.from_pandas(
            df.groupby("o_orderpriority", sort=False).head(3),
            preserve_index=False,
        )

    orders = _read(
        sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"]
    )
    top3 = (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("o_orderpriority")
        .map_groups(
            lambda df: df.sort_values("cents", ascending=False).head(3),
            batch_format="pandas",
        )
        .to_pandas()  # ≤ 3 × |priorities| rows
    )
    thresholds = top3.groupby("o_orderpriority")["cents"].min().to_dict()

    def survives(t: pa.Table) -> pa.Table:
        pr = t["o_orderpriority"].to_pandas()
        cents = _floor_units(t["o_totalprice"], 100).to_numpy()
        thr = pr.map(thresholds).fillna(np.iinfo(np.int64).max).to_numpy()
        keep = cents >= thr
        return pa.table(
            {
                # explicit string type: an all-filtered batch must not
                # degrade to a null-typed column (block schema drift)
                "o_orderpriority": pa.array(pr[keep], pa.string()),
                "o_orderkey": pa.array(
                    t["o_orderkey"].to_numpy(zero_copy_only=False)[keep]
                ),
                "cents": pa.array(cents[keep], pa.int64()),
            }
        )

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["cents", "o_orderkey"], ascending=[False, True],
            ignore_index=True,
        )
        greater = np.searchsorted(-df["cents"].to_numpy(), -df["cents"].to_numpy(), side="left")
        df["rnk"] = greater + 1
        return df[df["rnk"] <= 3]

    return (
        orders.map_batches(survives, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .map_groups(rank, batch_format="pandas")
    )


TOP_ORDERS_RANK_TIES_SQL = """
SELECT o_orderpriority, o_orderkey, cents, CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT o_orderpriority, o_orderkey,
           CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
           RANK() OVER (
               PARTITION BY o_orderpriority
               ORDER BY FLOOR(o_totalprice * 100) DESC
           ) AS rnk
    FROM orders
)
WHERE rnk <= 3
"""


# -------------------------------------------------- Bloom semi-join


def q_orders_of_rich_customers(sf_dir: str):
    """EXACT semi-join via broadcast Bloom pruning
    (``functions/joins.bloom_semi_join``): orders whose customer holds
    a high account balance. The ~1 MiB Bloom bitmap (OR-merged from
    per-block partials) filters the orders fact table in-stream, so
    the exact verification join shuffles only Bloom survivors — the
    semi-join never moves the full fact table."""
    from ..functions.joins import bloom_semi_join

    rich = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).filter(
        expr="c_acctbal > 9000.0"
    )

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "cents": _floor_units(t["o_totalprice"], 100),
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"]
    ).map_batches(keyed, batch_format="pyarrow")
    rich_keys = rich.map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"]}),
        batch_format="pyarrow",
    )
    return bloom_semi_join(orders, rich_keys, "o_custkey", "o_custkey")


ORDERS_RICH_CUSTOMERS_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
"""


# ---------------------------------------------------- LEFT OUTER join


def q_customer_order_counts(
    sf_dir: str, dim_broadcast_limit: int = DIM_BROADCAST_LIMIT
):
    """LEFT OUTER join (``functions/joins.hash_join(how="left")``):
    every customer with their order count + spend, zeros for customers
    with NO orders. The scale-correct shape: orders pre-aggregate to
    one row per custkey FIRST (combiner + key groupby), so the outer
    join is customer ⟕ customer-sized — the fact table never joins
    row-level. Unmatched rows surface as nulls and are coalesced to 0
    in-stream. Under ``dim_broadcast_limit`` the aggregate side
    broadcasts as a lookup (one map pass, no join shuffle) — the
    COUNT-GUARDED dimension pattern of q3/q5; above it the distributed
    left hash_join runs."""
    from ray.data.aggregate import Sum

    from ..functions.joins import hash_join

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                "n_orders": np.ones(t.num_rows, dtype=np.int64),
                "spend_cents": _floor_units(t["o_totalprice"], 100),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("o_custkey", as_index=False).sum(), preserve_index=False
        )

    partials = _read(
        sf_dir, "orders", ["o_custkey", "o_totalprice"]
    ).map_batches(partial, batch_format="pyarrow", batch_size=131072)
    cust = _read(sf_dir, "customer", ["c_custkey"])
    # the partials are already in-batch combined to ≤ customers rows
    # per batch; under the guard the FINAL combine happens driver-side
    # (one pandas groupby on a dimension-sized table — Ray's
    # groupby().aggregate() costs ~4 s of fixed shuffle latency that
    # only pays off above the guard)
    pmat = partials.materialize()
    if pmat.count() <= dim_broadcast_limit:
        pdf = (
            pmat.to_pandas()
            .groupby("o_custkey", as_index=False)
            .sum()
        )
        lut_n = dict(zip(pdf["o_custkey"], pdf["n_orders"].astype(np.int64)))
        lut_c = dict(zip(pdf["o_custkey"], pdf["spend_cents"].astype(np.int64)))

        def attach(t: pa.Table) -> pa.Table:
            keys = pd.Series(t["c_custkey"].to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "c_custkey": t["c_custkey"],
                    "n_orders": pa.array(
                        keys.map(lut_n).fillna(0).astype(np.int64)
                    ),
                    "spend_cents": pa.array(
                        keys.map(lut_c).fillna(0).astype(np.int64)
                    ),
                }
            )

        return cust.map_batches(attach, batch_format="pyarrow")

    per_cust = (
        pmat.groupby("o_custkey")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("spend_cents", alias_name="spend_cents"),
        )
        .map_batches(
            lambda t: t.rename_columns(["c_custkey", "n_orders", "spend_cents"]),
            batch_format="pyarrow",
        )
    )
    joined = hash_join(cust, per_cust, "c_custkey", "c_custkey", how="left")

    def coalesce(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "n_orders": pc.fill_null(t["n_orders"], 0),
                "spend_cents": pc.fill_null(t["spend_cents"], 0),
            }
        )

    return joined.map_batches(coalesce, batch_format="pyarrow")


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c_custkey,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(spend_cents, 0) AS BIGINT) AS spend_cents
FROM customer
LEFT JOIN (
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS spend_cents
    FROM orders GROUP BY o_custkey
) ON c_custkey = o_custkey
"""


def q_hourly_click_purchase_full(sf_dir: str):
    """Per-hour click counts ⟗ per-hour purchase counts with FULL
    OUTER semantics — hours with only one event type survive with a
    null on the other side. Logically a full-outer join of two
    aggregates (the SQL twin says exactly that; the generic
    union-partition ``hash_join(how="full")`` lives in
    ``functions/joins`` under its own parity tests), but EXECUTED as
    one pass: a per-batch dual-count partial with presence flags →
    ONE hour-keyed groupby → zeros with an absent presence flag
    become nulls. Half the reads and shuffles of the join plan at
    any scale (r4: 3.7 s → ~1.3 s at sf0.1)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "click") | (et == "purchase")
        f = t.filter(pa.array(keep))
        hours = pc.strftime(
            pc.floor_temporal(f["ts"], unit="hour"),
            format="%Y-%m-%d %H:00:00",
        ).to_numpy(zero_copy_only=False)
        is_click = f["event_type"].to_numpy(zero_copy_only=False) == "click"
        u, inv = np.unique(hours, return_inverse=True)
        clicks = np.bincount(inv, weights=is_click).astype(np.int64)
        purchases = np.bincount(inv, weights=~is_click).astype(np.int64)
        return pa.table(
            {
                "hour": pa.array(u, pa.string()),
                "clicks": pa.array(clicks, pa.int64()),
                "purchases": pa.array(purchases, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(
            Sum("clicks", alias_name="clicks"),
            Sum("purchases", alias_name="purchases"),
        )
    )

    def nullify(t: pa.Table) -> pa.Table:
        c = t["clicks"].to_numpy(zero_copy_only=False)
        p = t["purchases"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "hour": t["hour"],
                "clicks": pa.array(
                    np.where(c > 0, c, 0), pa.int64(), mask=(c == 0)
                ),
                "purchases": pa.array(
                    np.where(p > 0, p, 0), pa.int64(), mask=(p == 0)
                ),
            }
        )

    return agg.map_batches(nullify, batch_format="pyarrow")


HOURLY_CLICK_PURCHASE_FULL_SQL = """
WITH c AS (
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
           CAST(COUNT(*) AS BIGINT) AS clicks
    FROM events WHERE event_type = 'click' GROUP BY 1
), p AS (
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
           CAST(COUNT(*) AS BIGINT) AS purchases
    FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT COALESCE(c.hour, p.hour) AS hour, c.clicks, p.purchases
FROM c FULL OUTER JOIN p ON c.hour = p.hour
"""


# ------------------------------------------------- JSON extraction


def q_props_k_sum(sf_dir: str):
    """Semi-structured column processing: extract the integer ``k``
    field from the JSON ``props`` string, then the usual partial-agg →
    tiny groupby. The JSON parse never leaves the batch; only
    (type, sum, count) partials shuffle.

    Extraction is two-tier for exact ``json_extract '$.k'`` semantics:
    rows that are provably FLAT objects with no escapes
    (``^\\{[^{\\[\\\\]*\\}$`` — no nested ``{``/``[``, no backslash,
    so any ``"k":`` token can only be a top-level key) take the
    VECTORIZED Arrow regex kernel (``pc.extract_regex``, handles
    negative ints); anything else (nested objects, escaped strings
    that could embed a fake ``"k":``) falls back to a real
    ``json.loads`` on just those rows — rare by corpus shape, exact
    always."""
    from ray.data.aggregate import Sum

    _FLAT = r'^\{[^{\[\\]*\}$'
    _KNUM = r'"k"\s*:\s*(?P<k>-?\d+)'

    def partial(t: pa.Table) -> pa.Table:
        import json

        s = t["props"]
        m = pc.extract_regex(s, _KNUM)
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        vals = pc.fill_null(k, 0).to_numpy(zero_copy_only=False).copy()
        has = pc.is_valid(k).to_numpy(zero_copy_only=False).copy()
        safe = pc.fill_null(pc.match_substring_regex(s, _FLAT), False)
        unsafe = np.flatnonzero(
            np.logical_not(safe.to_numpy(zero_copy_only=False))
        )
        if len(unsafe):
            raw = s.take(pa.array(unsafe)).to_pylist()
            for i, txt in zip(unsafe, raw):
                kk = None
                if txt is not None:
                    try:
                        obj = json.loads(txt)
                        if isinstance(obj, dict):
                            kk = obj.get("k")
                    except (ValueError, TypeError):
                        kk = None
                has[i] = kk is not None
                vals[i] = int(kk) if kk is not None else 0
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pandas(),
                "sum_k": vals,
                "n_with_k": has.astype(np.int64),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False).sum(), preserve_index=False
        )

    return (
        _read(sf_dir, "events", ["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("event_type")
        .aggregate(
            Sum("sum_k", alias_name="sum_k"),
            Sum("n_with_k", alias_name="n_with_k"),
        )
    )


PROPS_K_SUM_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
       CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k
FROM events
GROUP BY event_type
"""


# ------------------------------------------------------ UNION distinct


def q_active_keys_union(sf_dir: str):
    """UNION (distinct) of two key streams — customers having orders ∪
    customers having high balance. ``Dataset.union`` concatenates the
    two pre-projected streams (no barrier), then ONE key-shuffle
    dedups: distinct = groupby-count with the count dropped. The
    projections shrink each side to its key column before anything
    moves."""
    from ray.data.aggregate import Count

    orders_keys = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda t: pa.table({"custkey": t["o_custkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    rich_keys = (
        _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
        .filter(expr="c_acctbal > 5000.0")
        .map_batches(
            lambda t: pa.table({"custkey": t["c_custkey"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
    )
    return (
        orders_keys.union(rich_keys)
        .groupby("custkey")
        .aggregate(Count(alias_name="__n"))
        .select_columns(["custkey"])
    )


ACTIVE_KEYS_UNION_SQL = """
SELECT o_custkey AS custkey FROM orders
UNION
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
"""


# ---------------------------------------- median absolute deviation


def q_price_mad(sf_dir: str):
    """Median absolute deviation — a COMPOSED exact-order-statistic
    pipeline: pass set 1 narrows to the exact median of price cents;
    pass set 2 runs the same engine over |cents − median| (computed
    in-stream, never materialized). Every pass ships one fixed-width
    bin-count row per block; robust-statistics at 100 TB without a
    sort. DuckDB twin: nested quantile_disc."""
    cents_ds = _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        lambda t: pa.table({"cents": _floor_units(t["l_extendedprice"], 100)}),
        batch_format="pyarrow",
    )
    med = _exact_int_quantiles(
        cents_ds,
        (0.5,),
        stats=_footer_int_stats(sf_dir, "lineitem", "l_extendedprice", 100),
    )
    if med is None:
        return pd.DataFrame(
            {"median_cents": pd.array([], dtype="int64"),
             "mad_cents": pd.array([], dtype="int64")}
        )
    m = med[0]
    dev_ds = cents_ds.map_batches(
        lambda t: pa.table(
            {"cents": pc.cast(
                pc.abs(pc.subtract(t["cents"], pa.scalar(m, pa.int64()))),
                pa.int64(),
            )}
        ),
        batch_format="pyarrow",
    )
    mad = _exact_int_quantiles(dev_ds, (0.5,))
    return pd.DataFrame(
        {"median_cents": pd.array([m], dtype="int64"),
         "mad_cents": pd.array([mad[0]], dtype="int64")}
    )


PRICE_MAD_SQL = """
WITH t AS (SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem),
m AS (SELECT quantile_disc(cents, 0.5) AS med FROM t)
SELECT CAST(m.med AS BIGINT) AS median_cents,
       CAST(quantile_disc(abs(t.cents - m.med), 0.5) AS BIGINT) AS mad_cents
FROM t, m
GROUP BY m.med
"""


# ------------------------------------------- one-pass quantile sketch


def q_price_quantile_sketch(sf_dir: str, k: int = 4096):
    """ONE-PASS approximate quantiles (the sketch-family member next to
    HLL-distinct and CMS-frequency): a deterministic uniform row sample
    — bottom-k by ``md5(rowkey)``, the same mergeable bottom-k
    machinery as ``uniform_sample`` (≤ k rows leave any block) — then
    ``quantile_disc`` over the k-row sample. DKW bound: rank error
    ≤ √(ln(2/δ)/2k) ≈ 3% at k=4096, δ=1e-3 (pytest-pinned vs the
    exact engine). Unlike the exact bin-narrowing passes this needs
    ONE scan; and because the sample is hash-deterministic the whole
    ESTIMATOR is exactly SQL-reproducible — an exact oracle for an
    approximate operator."""
    from ..functions.sampling import uniform_sample

    def keyed(t: pa.Table) -> pa.Table:
        key = (
            t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64) * 10
            + t["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "rowkey": pa.array(key, pa.int64()),
                "cents": _floor_units(t["l_extendedprice"], 100),
            }
        )

    ds = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"]
    ).map_batches(keyed, batch_format="pyarrow")
    sample = uniform_sample(ds, "rowkey", k, salt="qsk").to_pandas()
    if len(sample) == 0:
        return pd.DataFrame(
            {"p_x100": pd.array([], dtype="int64"),
             "cents_est": pd.array([], dtype="int64")}
        )
    vals = np.sort(sample["cents"].to_numpy())
    n = len(vals)
    out = [
        (int(q * 100), int(vals[max(int(np.ceil(q * n)), 1) - 1]))
        for q in (0.25, 0.5, 0.75, 0.95)
    ]
    return pd.DataFrame(
        {"p_x100": pd.array([p for p, _ in out], dtype="int64"),
         "cents_est": pd.array([v for _, v in out], dtype="int64")}
    )


PRICE_QUANTILE_SKETCH_SQL = """
WITH s AS (
  SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
  FROM (
    SELECT * FROM lineitem
    ORDER BY md5('qsk:' || CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)),
             l_orderkey * 10 + l_linenumber
    LIMIT 4096
  )
)
SELECT CAST(25 AS BIGINT) AS p_x100,
       CAST(quantile_disc(cents, 0.25) AS BIGINT) AS cents_est FROM s
UNION ALL SELECT 50, CAST(quantile_disc(cents, 0.50) AS BIGINT) FROM s
UNION ALL SELECT 75, CAST(quantile_disc(cents, 0.75) AS BIGINT) FROM s
UNION ALL SELECT 95, CAST(quantile_disc(cents, 0.95) AS BIGINT) FROM s
"""


# --------------------------------------- FIRST_VALUE / LAST_VALUE


def q_user_first_last_event(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE window (the boundary-row window shape
    next to LAG, cumulative, ROWS and RANGE frames): each user's first
    and last event value in time order. Same ``user_id % P`` partition
    discipline; per part one vectorized sort + groupby first/last.
    Ties broken by event_id on both engines."""
    P = 16

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": t["ts"],
                "cents": _floor_units(t["value"], 100),
                "part": pa.array(u % P, pa.int64()),
            }
        )

    def first_last(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        g = s.groupby("user_id", sort=False)["cents"]
        out = pd.DataFrame(
            {
                "user_id": g.first().index,
                "first_cents": g.first().to_numpy(),
                "last_cents": g.last().to_numpy(),
            }
        )
        return out.astype(
            {"user_id": "int64", "first_cents": "int64", "last_cents": "int64"}
        )

    return (
        _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
        .map_batches(add_part, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(first_last, batch_format="pandas")
    )


USER_FIRST_LAST_SQL = """
SELECT DISTINCT user_id,
       CAST(FIRST_VALUE(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS BIGINT)
           AS first_cents,
       CAST(LAST_VALUE(CAST(FLOOR(value * 100) AS BIGINT)) OVER w AS BIGINT)
           AS last_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_user_funnel(sf_dir: str):
    """Ordered-sequence funnel (view → click → purchase): per user,
    stage 1 = any view, stage 2 = a click STRICTLY AFTER the first
    view, stage 3 = a purchase strictly after that click — the
    event-sequence-matching window op behind conversion analytics.
    Same ``user_id % P`` partition discipline as the other user
    windows; inside a part the three stage anchors are three
    vectorized groupby-mins + merges (no per-user Python loop), each
    conditioned on the previous anchor."""
    P = 16

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_type": t["event_type"],
                "part": pa.array(u % P, pa.int64()),
            }
        )

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        t1 = (
            df[df["event_type"] == "view"].groupby("user_id")["ts"].min()
        ).rename("t1")
        d = df.merge(t1, left_on="user_id", right_index=True, how="left")
        t2 = (
            d[(d["event_type"] == "click") & (d["ts"] > d["t1"])]
            .groupby("user_id")["ts"].min()
        ).rename("t2")
        d = d.merge(t2, left_on="user_id", right_index=True, how="left")
        t3 = (
            d[(d["event_type"] == "purchase") & (d["ts"] > d["t2"])]
            .groupby("user_id")["ts"].min()
        )
        users = np.sort(df["user_id"].unique())
        stage = (
            pd.Series(users).isin(t1.index).to_numpy(np.int64)
            + pd.Series(users).isin(t2.index).to_numpy(np.int64)
            + pd.Series(users).isin(t3.index).to_numpy(np.int64)
        )
        return pd.DataFrame({"user_id": users, "stage": stage})

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(add_part, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(funnel, batch_format="pandas")
    )


USER_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id
)
SELECT u.user_id,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 WHEN v.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
"""


# ------------------------------------- correlated scalar subquery


def q_orders_above_cust_avg(
    sf_dir: str, dim_broadcast_limit: int = DIM_BROADCAST_LIMIT
):
    """Correlated scalar subquery shape (``o_totalprice > AVG(...) of
    the SAME customer``): pass 1 pre-combines per-customer (sum, n)
    in-batch and finishes the dimension-sized aggregate under the
    guarded driver combine; pass 2 streams orders again, comparing each
    row against its customer's mean via the broadcast lookup — the
    correlated subquery decorrelates into aggregate + re-join, the
    standard engine rewrite. Integer comparison on BOTH engines:
    ``cents·n > sum_cents`` avoids float division entirely."""
    partials = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
                    "sum_cents": _floor_units(t["o_totalprice"], 100).to_numpy(),
                    "n": np.ones(t.num_rows, dtype=np.int64),
                }
            ).groupby("o_custkey", as_index=False).sum(),
            preserve_index=False,
        ),
        batch_format="pyarrow",
        batch_size=131072,
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    pmat = partials.materialize()
    if pmat.count() <= dim_broadcast_limit:
        # guarded broadcast (customer-dimension-sized): one more map
        # pass over orders, zero additional shuffles
        pdf = pmat.to_pandas().groupby("o_custkey", as_index=False).sum()
        lut_sum = dict(zip(pdf["o_custkey"], pdf["sum_cents"].astype(np.int64)))
        lut_n = dict(zip(pdf["o_custkey"], pdf["n"].astype(np.int64)))

        def above_avg(t: pa.Table) -> pa.Table:
            keys = pd.Series(t["o_custkey"].to_numpy(zero_copy_only=False))
            cents = _floor_units(t["o_totalprice"], 100).to_numpy()
            s = keys.map(lut_sum).to_numpy(dtype=np.int64)
            n = keys.map(lut_n).to_numpy(dtype=np.int64)
            keep = cents * n > s
            return pa.table(
                {
                    "o_orderkey": pa.array(
                        t["o_orderkey"].to_numpy(zero_copy_only=False)[keep]
                    ),
                    "o_custkey": pa.array(keys.to_numpy()[keep]),
                    "cents": pa.array(cents[keep], pa.int64()),
                }
            )

        return orders.map_batches(above_avg, batch_format="pyarrow")

    # distributed decorrelation: finish the aggregate with a key
    # groupby, hash-join it back onto orders, filter in-stream
    from ray.data.aggregate import Sum

    from ..functions.joins import hash_join

    agg = pmat.groupby("o_custkey").aggregate(
        Sum("sum_cents", alias_name="sum_cents"), Sum("n", alias_name="n")
    )

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "cents": _floor_units(t["o_totalprice"], 100),
            }
        )

    joined = hash_join(
        orders.map_batches(keyed, batch_format="pyarrow"), agg,
        "o_custkey", "o_custkey",
    )

    def flt(t: pa.Table) -> pa.Table:
        keep = (
            t["cents"].to_numpy(zero_copy_only=False)
            * t["n"].to_numpy(zero_copy_only=False)
            > t["sum_cents"].to_numpy(zero_copy_only=False)
        )
        return t.select(["o_orderkey", "o_custkey", "cents"]).filter(
            pa.array(keep)
        )

    return joined.map_batches(flt, batch_format="pyarrow")


ORDERS_ABOVE_CUST_AVG_SQL = """
WITH agg AS (
    SELECT o_custkey,
           SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS sum_cents,
           COUNT(*) AS n
    FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey, o.o_custkey,
       CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
FROM orders o JOIN agg USING (o_custkey)
WHERE CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) * agg.n > agg.sum_cents
"""


# --------------------------------------- distributed window rank (NTILE)


def _order_global_rank(sf_dir: str, n_bins: int = 1024):
    """The shared range-partitioned two-level rank engine: exact 0-based
    per-row rank within each o_orderpriority partition ordered by the
    UNIQUE int64 key ``cents·2^26 + orderkey`` — NO global sort:

    1. one streaming pass computes per-priority (min, max, n) of the
       key — metadata-sized partials;
    2. a second pass histograms keys into ``n_bins`` fixed ranges per
       priority; the (priorities × n_bins) count table prefix-sums on
       the driver into per-bin global rank OFFSETS (metadata-sized);
    3. rows shuffle ONCE on their (priority, bin) id; each group sorts
       locally: rank = offset + local position.

    Per-group memory is ~n/(priorities·n_bins) rows; a hot price range
    still splits across bins, so skew is histogram-bounded. NTILE /
    PERCENT_RANK / CUME_DIST are emission functions over (rank, n).

    Returns ``(rows, offsets, n_per_prio, SHIFT, n_bins)`` where
    ``rows`` is the (pb, enc) Dataset and ``n_per_prio`` maps
    priority-index → partition row count."""
    from ray.data.aggregate import Count, Max, Min, Sum

    SHIFT = np.int64(1) << np.int64(26)

    ds = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        key = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if key.max(initial=0) >= SHIFT:  # not assert: survives python -O
            raise ValueError("orderkey exceeds 2^26 encode width")
        cents = _floor_units(t["o_totalprice"], 100).to_numpy()
        return pa.table(
            {
                "prio": t["o_orderpriority"],
                "enc": pa.array(cents * SHIFT + key, pa.int64()),
            }
        )

    enc_ds = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    stats = enc_ds.groupby("prio").aggregate(
        Min("enc", alias_name="lo"),
        Max("enc", alias_name="hi"),
        Count(alias_name="n"),
    ).take_all()  # priorities are dimension-sized
    prios = sorted(r["prio"] for r in stats)
    prio_id = {p: i for i, p in enumerate(prios)}
    lo = {r["prio"]: r["lo"] for r in stats}
    width = {
        r["prio"]: max((r["hi"] - r["lo"]) // n_bins + 1, 1) for r in stats
    }

    def binned(t: pa.Table) -> pa.Table:
        # vectorized per-row bin assignment: dict maps via pd.Series.map
        # (C level), integer arithmetic in numpy — no Python row loop
        p = pd.Series(t["prio"].to_pylist())
        e = t["enc"].to_numpy(zero_copy_only=False)
        pid = p.map(prio_id).to_numpy(np.int64)
        b = (e - p.map(lo).to_numpy(np.int64)) // p.map(width).to_numpy(np.int64)
        return pa.table(
            {"pb": pa.array(pid * n_bins + b, pa.int64()), "enc": t["enc"]}
        )

    rows = enc_ds.map_batches(binned, batch_format="pyarrow")

    # per-(priority, bin) counts: combined in-batch, tiny groupby
    def bin_counts(t: pa.Table) -> pa.Table:
        pb = t["pb"].to_numpy(zero_copy_only=False)
        u, c = np.unique(pb, return_counts=True)
        return pa.table(
            {"pb": pa.array(u, pa.int64()),
             "cnt": pa.array(c.astype(np.int64), pa.int64())}
        )

    counts = {
        r["pb"]: r["cnt"]
        for r in rows.map_batches(bin_counts, batch_format="pyarrow")
        .groupby("pb").aggregate(Sum("cnt", alias_name="cnt")).take_all()
    }  # ≤ priorities × n_bins rows — metadata-sized
    offsets: dict[int, int] = {}
    n_per_prio: dict[int, int] = {}
    for p, i in prio_id.items():
        run = 0
        for b in range(n_bins):
            pb = i * n_bins + b
            if pb in counts:
                offsets[pb] = run
                run += counts[pb]
        n_per_prio[i] = run
    return rows, offsets, n_per_prio, SHIFT, n_bins


def _ranked(sf_dir: str, emit, n_bins: int = 1024):
    """Run the rank engine and apply ``emit(rank_array, n_partition)``
    → one output column named by ``emit.col``."""
    rows, offsets, n_per_prio, SHIFT, nb = _order_global_rank(sf_dir, n_bins)

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        pb = int(g["pb"].iloc[0])
        order = np.argsort(g["enc"].to_numpy(), kind="stable")
        rank = np.empty(len(g), np.int64)
        rank[order] = offsets[pb] + np.arange(len(g))
        val = emit(rank, n_per_prio[pb // nb])
        return pd.DataFrame(
            {
                "o_orderkey": (g["enc"].to_numpy() % int(SHIFT)).astype(np.int64),
                emit.col: val,
            }
        )

    return rows.groupby("pb").map_groups(assign, batch_format="pandas")


def q_order_ntile4(sf_dir: str, n_bins: int = 1024):
    """NTILE(4) OVER (PARTITION BY o_orderpriority ORDER BY price_cents,
    o_orderkey) — exact quartile bucket per order through the
    range-partitioned two-level rank (:func:`_order_global_rank`)."""

    def emit(rank: np.ndarray, n: int) -> np.ndarray:
        base, rem = divmod(n, 4)
        cuts = np.cumsum([base + (1 if k < rem else 0) for k in range(4)])
        return np.searchsorted(cuts, rank, side="right") + 1

    emit.col = "bucket"
    return _ranked(sf_dir, emit, n_bins)


def q_order_percent_rank(sf_dir: str, n_bins: int = 1024):
    """PERCENT_RANK() over the same window — (rank−1)/(n−1) with the
    unique sort key, so the float division is bit-identical to the
    oracle's. Same single-shuffle rank engine, different emission."""

    def emit(rank: np.ndarray, n: int) -> np.ndarray:
        return rank / (n - 1) if n > 1 else np.zeros(len(rank))

    emit.col = "pct_rank"
    return _ranked(sf_dir, emit, n_bins)


def q_order_cume_dist(sf_dir: str, n_bins: int = 1024):
    """CUME_DIST() over the same window — rank_inclusive/n with the
    unique sort key. Same engine, different emission."""

    def emit(rank: np.ndarray, n: int) -> np.ndarray:
        return (rank + 1) / n

    emit.col = "cume"
    return _ranked(sf_dir, emit, n_bins)


ORDER_NTILE4_SQL = """
SELECT o_orderkey,
       CAST(NTILE(4) OVER (
            PARTITION BY o_orderpriority
            ORDER BY CAST(FLOOR(o_totalprice * 100) AS BIGINT), o_orderkey
       ) AS BIGINT) AS bucket
FROM orders
"""


ORDER_PERCENT_RANK_SQL = """
SELECT o_orderkey,
       PERCENT_RANK() OVER (
            PARTITION BY o_orderpriority
            ORDER BY CAST(FLOOR(o_totalprice * 100) AS BIGINT), o_orderkey
       ) AS pct_rank
FROM orders
"""


ORDER_CUME_DIST_SQL = """
SELECT o_orderkey,
       CUME_DIST() OVER (
            PARTITION BY o_orderpriority
            ORDER BY CAST(FLOOR(o_totalprice * 100) AS BIGINT), o_orderkey
       ) AS cume
FROM orders
"""


def q_order_dense_rank(sf_dir: str, n_bins: int = 1024):
    """DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY
    price_cents) — ranks over a NON-unique key, so ties share a rank
    and the next distinct value increments by exactly 1. The two-level
    rank engine generalizes because range bins partition VALUE space:
    a distinct value lives in exactly one bin, so per-bin distinct
    counts are compositional and prefix-sum into per-bin DENSE
    offsets (metadata-sized, like the row offsets in
    :func:`_order_global_rank`):

    1. one pass: per-priority (min, max) of cents — partial-sized;
    2. rows shuffle ONCE on (priority, bin); each group sorts by
       cents locally and emits its LOCAL 0-based dense index plus the
       group's distinct count ``nd`` (constant per group) — the
       shuffled result is materialized;
    3. a streaming metadata-sized scan collects the unique (pb, nd)
       pairs, the driver prefix-sums them into per-bin dense offsets,
       and a final cheap map_batches adds ``offsets[pb] + 1``.

    One sort-shuffle total (the r3 version paid a second full
    groupby().map_groups shuffle just to count distincts; folding the
    count into the assignment group halves the wall time).

    Skew note: all rows of ONE cents value land in one bin by
    construction — inherent to dense ranking (the value is the group),
    bounded by the hottest single price's multiplicity, not by a
    range's width."""
    from ray.data.aggregate import Max, Min

    ds = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "prio": t["o_orderpriority"],
                "cents": _floor_units(t["o_totalprice"], 100),
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            }
        )

    enc_ds = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    stats = enc_ds.groupby("prio").aggregate(
        Min("cents", alias_name="lo"), Max("cents", alias_name="hi")
    ).take_all()  # priorities are dimension-sized
    prio_id = {r["prio"]: i for i, r in enumerate(sorted(stats, key=lambda r: r["prio"]))}
    lo = {r["prio"]: r["lo"] for r in stats}
    width = {r["prio"]: max((r["hi"] - r["lo"]) // n_bins + 1, 1) for r in stats}

    def binned(t: pa.Table) -> pa.Table:
        p = pd.Series(t["prio"].to_pylist())
        c = t["cents"].to_numpy(zero_copy_only=False)
        pid = p.map(prio_id).to_numpy(np.int64)
        b = (c - p.map(lo).to_numpy(np.int64)) // p.map(width).to_numpy(np.int64)
        return pa.table(
            {
                "pb": pa.array(pid * n_bins + b, pa.int64()),
                "cents": t["cents"],
                "o_orderkey": t["o_orderkey"],
            }
        )

    rows = enc_ds.map_batches(binned, batch_format="pyarrow")

    # THE one shuffle: local dense index + per-group distinct count
    def assign_local(g: pd.DataFrame) -> pd.DataFrame:
        c = g["cents"].to_numpy()
        order = np.argsort(c, kind="stable")
        dense = np.empty(len(g), np.int64)
        sc = c[order]
        steps = (sc[1:] != sc[:-1]).astype(np.int64)
        dense[order] = np.cumsum(np.r_[0, steps])
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(),
                "pb": g["pb"].to_numpy(),
                "ldense": dense,
                "nd": np.int64(1) + steps.sum(),  # constant per group
            }
        )

    local = (
        rows.groupby("pb")
        .map_groups(assign_local, batch_format="pandas")
        .materialize()  # reused twice below; spillable shuffle output
    )

    # metadata-sized scan: one (pb, nd) pair per group → driver
    # prefix-sum into per-bin dense offsets (nd is constant per pb)
    def pb_nd(t: pa.Table) -> pa.Table:
        u = np.unique(
            np.stack(
                [
                    t["pb"].to_numpy(zero_copy_only=False),
                    t["nd"].to_numpy(zero_copy_only=False),
                ],
                axis=1,
            ),
            axis=0,
        )
        return pa.table(
            {"pb": pa.array(u[:, 0], pa.int64()),
             "nd": pa.array(u[:, 1], pa.int64())}
        )

    nd = {
        r["pb"]: r["nd"]
        for r in local.map_batches(pb_nd, batch_format="pyarrow").take_all()
    }  # ≤ priorities × n_bins rows
    offsets: dict[int, int] = {}
    for i in prio_id.values():
        run = 0
        for b in range(n_bins):
            pb = i * n_bins + b
            if pb in nd:
                offsets[pb] = run
                run += nd[pb]

    def add_offset(t: pa.Table) -> pa.Table:
        pb = t["pb"].to_numpy(zero_copy_only=False)
        off = pd.Series(pb).map(offsets).to_numpy(np.int64)
        drank = off + t["ldense"].to_numpy(zero_copy_only=False) + 1
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "drank": pa.array(drank, pa.int64())}
        )

    return local.map_batches(add_offset, batch_format="pyarrow")


ORDER_DENSE_RANK_SQL = """
SELECT o_orderkey,
       CAST(DENSE_RANK() OVER (
            PARTITION BY o_orderpriority
            ORDER BY CAST(FLOOR(o_totalprice * 100) AS BIGINT)
       ) AS BIGINT) AS drank
FROM orders
"""


# ------------------------------------------------- correlation aggregate


def q_flag_price_corr(sf_dir: str):
    """CORR(l_extendedprice, l_quantity) per returnflag — the two-pass
    moment formula as a single streaming pass of fixed-size partials
    (n, Σx', Σy', Σx'², Σy'², Σx'y' per flag per batch) and one tiny
    groupby, where x' = x − px, y' = y − py for a constant pivot
    sampled from the first parquet row group. CORR is invariant to
    per-column constant shifts, and a pivot within a few std of the
    mean keeps the moment differences O(σ²·n) instead of O(μ²·n) —
    the naive unshifted form cancels catastrophically once μ/σ is
    large (ADVICE r3), e.g. prices ~1e4 at big scale factors.
    Rounded to 5 dp on BOTH sides: the sums are float64 and the
    combine order differs between engines, so agreement holds far
    inside 5 dp for a value bounded by 1."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    # Constant pivots from the first row group only — metadata-scale
    # read, identical for every batch so the shifted sums stay
    # Sum-combinable. Any constant is exact; nearby-mean is stable.
    pf = pq.ParquetFile(f"{sf_dir}/lineitem.parquet")
    head = pf.read_row_group(0, columns=["l_extendedprice", "l_quantity"])
    px = float(np.mean(head["l_extendedprice"].to_numpy(zero_copy_only=False)))
    py = float(np.mean(head["l_quantity"].to_numpy(zero_copy_only=False)))

    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "f": t["l_returnflag"].to_pylist(),
                "x": t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64) - px,
                "y": t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64) - py,
            }
        )
        df["xx"] = df["x"] * df["x"]
        df["yy"] = df["y"] * df["y"]
        df["xy"] = df["x"] * df["y"]
        df["n"] = 1
        g = df.groupby("f", sort=False, as_index=False)[
            ["n", "x", "y", "xx", "yy", "xy"]
        ].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("f")
        .aggregate(
            Sum("n", alias_name="n"), Sum("x", alias_name="sx"),
            Sum("y", alias_name="sy"), Sum("xx", alias_name="sxx"),
            Sum("yy", alias_name="syy"), Sum("xy", alias_name="sxy"),
        )
        .take_all()  # one row per returnflag — dimension-sized
    )
    rows = sorted(agg, key=lambda r: r["f"])
    out_f, out_c = [], []
    for r in rows:
        n = float(r["n"])
        cov = n * r["sxy"] - r["sx"] * r["sy"]
        vx = n * r["sxx"] - r["sx"] * r["sx"]
        vy = n * r["syy"] - r["sy"] * r["sy"]
        corr = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else None
        out_f.append(r["f"])
        out_c.append(None if corr is None else round(float(corr), 5))
    return pa.table(
        {
            "l_returnflag": pa.array(out_f, pa.string()),
            "corr_pq": pa.array(out_c, pa.float64()),
        }
    )


FLAG_PRICE_CORR_SQL = """
SELECT l_returnflag, ROUND(CORR(l_extendedprice, l_quantity), 5) AS corr_pq
FROM lineitem GROUP BY l_returnflag
"""


def q_flag_price_regr(sf_dir: str):
    """Simple linear regression y = a·x + b of l_extendedprice on
    l_quantity per returnflag — the REGR_SLOPE / REGR_INTERCEPT
    aggregate family, as ONE streaming pass of the same pivot-shifted
    fixed-size moment partials as :func:`q_flag_price_corr` (slope and
    covariance are shift-invariant; the intercept un-shifts through
    the means). Slope is O(σy/σx) and the intercept O(μy), so 4 dp
    rounding sits ~6 orders of magnitude above the float64 combine
    noise on both engines."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    pf = pq.ParquetFile(f"{sf_dir}/lineitem.parquet")
    head = pf.read_row_group(0, columns=["l_extendedprice", "l_quantity"])
    py_ = float(np.mean(head["l_extendedprice"].to_numpy(zero_copy_only=False)))
    px = float(np.mean(head["l_quantity"].to_numpy(zero_copy_only=False)))

    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "f": t["l_returnflag"].to_pylist(),
                "x": t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64) - px,
                "y": t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64) - py_,
            }
        )
        df["xx"] = df["x"] * df["x"]
        df["xy"] = df["x"] * df["y"]
        df["n"] = 1
        g = df.groupby("f", sort=False, as_index=False)[
            ["n", "x", "y", "xx", "xy"]
        ].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("f")
        .aggregate(
            Sum("n", alias_name="n"), Sum("x", alias_name="sx"),
            Sum("y", alias_name="sy"), Sum("xx", alias_name="sxx"),
            Sum("xy", alias_name="sxy"),
        )
        .take_all()  # one row per returnflag — dimension-sized
    )
    rows = sorted(agg, key=lambda r: r["f"])
    out_f, out_s, out_i = [], [], []
    for r in rows:
        n = float(r["n"])
        cov = n * r["sxy"] - r["sx"] * r["sy"]
        vx = n * r["sxx"] - r["sx"] * r["sx"]
        if vx > 0:
            slope = cov / vx
            # un-shift: means in original coordinates
            mx, my = r["sx"] / n + px, r["sy"] / n + py_
            icept = my - slope * mx
            out_s.append(round(float(slope), 4))
            out_i.append(round(float(icept), 4))
        else:
            out_s.append(None)
            out_i.append(None)
        out_f.append(r["f"])
    return pa.table(
        {
            "l_returnflag": pa.array(out_f, pa.string()),
            "slope": pa.array(out_s, pa.float64()),
            "icept": pa.array(out_i, pa.float64()),
        }
    )


FLAG_PRICE_REGR_SQL = """
SELECT l_returnflag,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS icept
FROM lineitem GROUP BY l_returnflag
"""


def q_flag_price_skew_kurt(sf_dir: str):
    """SKEWNESS / KURTOSIS (excess) of l_extendedprice per returnflag —
    the 3rd/4th-moment aggregate family as ONE streaming pass of
    pivot-shifted fixed-size partials (n, Σx', Σx'², Σx'³, Σx'⁴ per
    flag per batch) and one dimension-sized groupby. Central moments
    are shift-invariant, so a constant pivot near the mean (first
    parquet row group, same trick as :func:`q_flag_price_corr`) keeps
    the M3/M4 reconstruction O(σ³·n)/O(σ⁴·n) instead of O(μ³·n)/O(μ⁴·n)
    — at prices ~1e4 the unshifted raw-moment form loses ~16 digits in
    M4 and is unusable in float64. Estimators match DuckDB's
    bias-adjusted sample forms (verified to ~1e-9 empirically):

      skew = √(n(n−1))/(n−2) · g1,            g1 = (M3/n)/(M2/n)^1.5
      kurt = (n−1)/((n−2)(n−3)) · ((n+1)·g2 + 6),  g2 = (M4/n)/(M2/n)² − 3

    Both are scale-free O(1) values; 5 dp rounding sits far above the
    float64 combine-order noise on either engine."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    pf = pq.ParquetFile(f"{sf_dir}/lineitem.parquet")
    head = pf.read_row_group(0, columns=["l_extendedprice"])
    px = float(np.mean(head["l_extendedprice"].to_numpy(zero_copy_only=False)))

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64) - px
        df = pd.DataFrame({"f": t["l_returnflag"].to_pylist(), "x": x})
        df["x2"] = x * x
        df["x3"] = df["x2"] * x
        df["x4"] = df["x2"] * df["x2"]
        df["n"] = 1
        g = df.groupby("f", sort=False, as_index=False)[
            ["n", "x", "x2", "x3", "x4"]
        ].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("f")
        .aggregate(
            Sum("n", alias_name="n"), Sum("x", alias_name="s1"),
            Sum("x2", alias_name="s2"), Sum("x3", alias_name="s3"),
            Sum("x4", alias_name="s4"),
        )
        .take_all()  # one row per returnflag — dimension-sized
    )
    out_f, out_s, out_k = [], [], []
    for r in sorted(agg, key=lambda x: x["f"]):
        n = float(r["n"])
        m = r["s1"] / n  # mean of the SHIFTED values
        M2 = r["s2"] - n * m * m
        M3 = r["s3"] - 3 * m * r["s2"] + 2 * n * m**3
        M4 = r["s4"] - 4 * m * r["s3"] + 6 * m * m * r["s2"] - 3 * n * m**4
        if n > 3 and M2 > 0:
            g1 = (M3 / n) / (M2 / n) ** 1.5
            skew = g1 * np.sqrt(n * (n - 1)) / (n - 2)
            g2 = (M4 / n) / (M2 / n) ** 2 - 3.0
            kurt = ((n - 1) / ((n - 2) * (n - 3))) * ((n + 1) * g2 + 6)
            out_s.append(round(float(skew), 5))
            out_k.append(round(float(kurt), 5))
        else:
            out_s.append(None)
            out_k.append(None)
        out_f.append(r["f"])
    return pa.table(
        {
            "l_returnflag": pa.array(out_f, pa.string()),
            "skew": pa.array(out_s, pa.float64()),
            "kurt": pa.array(out_k, pa.float64()),
        }
    )


FLAG_PRICE_SKEW_KURT_SQL = """
SELECT l_returnflag,
       ROUND(SKEWNESS(l_extendedprice), 5) AS skew,
       ROUND(KURTOSIS(l_extendedprice), 5) AS kurt
FROM lineitem GROUP BY l_returnflag
"""


# ------------------------------------------------ ordered string_agg


def q_priority_status_agg(sf_dir: str):
    """string_agg(DISTINCT status ORDER BY status) per priority — the
    ordered list-aggregation shape. Per-batch distinct pairs are the
    combiner (the shuffle sees ≤ priorities×statuses rows per batch,
    never the fact table); the ordered join happens on the
    dimension-sized result on the driver."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])

    def distinct_pairs(t: pa.Table) -> pa.Table:
        return t.group_by(
            ["o_orderpriority", "o_orderstatus"]
        ).aggregate([])

    pairs = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(Count(alias_name="n"))
        .take_all()  # dimension-sized
    )
    by_prio: dict[str, list[str]] = {}
    for r in pairs:
        by_prio.setdefault(r["o_orderpriority"], []).append(r["o_orderstatus"])
    prios = sorted(by_prio)
    return pa.table(
        {
            "o_orderpriority": pa.array(prios, pa.string()),
            "statuses": pa.array(
                [",".join(sorted(by_prio[p])) for p in prios], pa.string()
            ),
        }
    )


PRIORITY_STATUS_AGG_SQL = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
FROM orders GROUP BY o_orderpriority
"""


# -------------------------------------- TPC-H q21 shape: waiting suppliers


def q_suppliers_kept_waiting(
    sf_dir: str, dim_broadcast_limit: int = DIM_BROADCAST_LIMIT
):
    """TPC-H q21 shape (suppliers who kept orders waiting): for
    multi-supplier orders where EXACTLY ONE supplier shipped late
    (> 30 days after the order date), count such orders per blamed
    supplier; top 10 by count. The correlated EXISTS / NOT-EXISTS
    pair of the reference SQL compiles into per-order aggregates:

    1. lineitem ⋈ orders on orderkey (both fact-sized → the native
       hash ``Dataset.join``, data-dependent partition count), the
       late flag computed per batch right after the join;
    2. a per-batch (orderkey, suppkey) → any-late combiner, then ONE
       ``orderkey % P`` int-key shuffle; inside each part a VECTORIZED
       pandas two-level groupby derives per-order supplier counts,
       late-supplier counts and the blamed key — never a per-order
       Python group (an orderkey-keyed map_groups would degenerate at
       fact-table group counts);
    3. blamed keys pre-aggregate per batch into a supplier-keyed tiny
       groupby; names attach via the count-guarded supplier broadcast
       (hash-join fallback above the guard); driver sorts 10 rows."""
    from ray.data.aggregate import Sum

    from ..functions.joins import hash_join

    P = 64
    li_raw = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    joined = li_raw.join(
        orders, join_type="inner", num_partitions=_join_parts(li_raw),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def late_partial(t: pa.Table) -> pa.Table:
        late = pc.greater(
            t["l_shipdate"],
            pc.add(t["o_orderdate"], pa.scalar(timedelta(days=30))),
        )
        df = pd.DataFrame(
            {
                "ok": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "sk": t["l_suppkey"].to_numpy(zero_copy_only=False),
                "late": late.to_numpy(zero_copy_only=False),
            }
        )
        agg = df.groupby(["ok", "sk"], as_index=False)["late"].max()
        agg["part"] = agg["ok"] % P
        return pa.Table.from_pandas(agg, preserve_index=False)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        # re-combine across batches, then per-order aggregates —
        # all vectorized two-level groupbys
        sup = df.groupby(["ok", "sk"], as_index=False)["late"].max()
        per = sup.groupby("ok").agg(
            ns=("sk", "size"),
            nl=("late", "sum"),
        )
        blamed = sup[sup["late"]].groupby("ok")["sk"].max()
        per = per[(per["ns"] >= 2) & (per["nl"] == 1)]
        out = blamed.loc[per.index].value_counts()
        return pd.DataFrame(
            {"s_suppkey": out.index.to_numpy(np.int64),
             "waiting": out.to_numpy(np.int64)}
        )

    counts = (
        joined.map_batches(late_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .groupby("s_suppkey")
        .aggregate(Sum("waiting", alias_name="waiting"))
    )

    sup_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    if sup_ds.count() <= dim_broadcast_limit:
        names = {
            r["s_suppkey"]: r["s_name"] for r in sup_ds.take_all()
        }

        def attach(t: pa.Table) -> pa.Table:
            sk = t["s_suppkey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "s_name": pa.array(
                        pd.Series(sk).map(names), pa.string()
                    ),
                    "waiting": t["waiting"],
                }
            )

        named = counts.map_batches(attach, batch_format="pyarrow")
    else:  # scale path: supplier side exceeds the broadcast guard
        named = hash_join(
            counts, sup_ds, "s_suppkey", "s_suppkey", num_partitions=8
        ).select_columns(["s_name", "waiting"])

    rows = named.take_all()  # ≤ supplier-count rows reach the driver
    top = sorted(rows, key=lambda r: (-r["waiting"], r["s_name"]))[:10]
    return pa.table(
        {
            "s_name": pa.array([r["s_name"] for r in top], pa.string()),
            "waiting": pa.array([r["waiting"] for r in top], pa.int64()),
        }
    )


SUPPLIERS_KEPT_WAITING_SQL = """
WITH lo AS (
  SELECT l_orderkey AS ok, l_suppkey AS sk,
         (l_shipdate > o_orderdate + INTERVAL 30 DAY) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), per AS (
  SELECT ok,
         COUNT(DISTINCT sk) AS ns,
         COUNT(DISTINCT CASE WHEN late THEN sk END) AS nl,
         MAX(CASE WHEN late THEN sk END) AS lsk
  FROM lo GROUP BY ok
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS waiting
FROM per JOIN supplier ON s_suppkey = lsk
WHERE ns >= 2 AND nl = 1
GROUP BY s_name
ORDER BY waiting DESC, s_name
LIMIT 10
"""


# ------------------------------------------------- cohort retention


def q_user_retention(sf_dir: str):
    """Cohort retention matrix: users cohorted by the DATE of their
    first event; for every (cohort_day, day_offset) the number of
    cohort users active that day. Two-level shuffle shape:

    1. per-batch distinct (user, day) combiner → ONE ``user % P``
       int-key shuffle; each part derives every user's cohort (min
       day) AND emits its (cohort, offset) visit rows — a user's rows
       all live in one part, so the min is exact and no separate
       cohort join or broadcast is needed;
    2. per-batch (cohort, offset) histograms → a cohort-day-sized
       groupby sums them (each user contributes at most once per
       (cohort, offset) by the distinct combiner + part locality)."""
    from ray.data.aggregate import Sum

    P = 64
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def day_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "user_id": df["user_id"],
                "day": df["ts"].dt.floor("D"),
            }
        ).drop_duplicates(ignore_index=True)
        out["part"] = out["user_id"] % P
        return out

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"])
        cohort = df.groupby("user_id")["day"].transform("min")
        out = pd.DataFrame(
            {
                "cohort_day": cohort.dt.strftime("%Y-%m-%d"),
                "day_offset": (df["day"] - cohort).dt.days.astype(np.int64),
            }
        )
        agg = out.groupby(["cohort_day", "day_offset"], as_index=False).size()
        return agg.rename(columns={"size": "n_users"})

    return (
        ev.map_batches(day_pairs, batch_format="pandas")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


USER_RETENTION_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), c AS (
  SELECT user_id, MIN(d) AS cohort FROM ud GROUP BY user_id
)
SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', c.cohort, ud.d) AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ud JOIN c ON ud.user_id = c.user_id
GROUP BY 1, 2
"""


# ------------------------------------------- event-type transitions


def q_event_transitions(sf_dir: str):
    """Markov transition counts of ``event_type`` bigrams within each
    user's time-ordered stream — the sequence-model-features shape of
    the sessionization family.

    ONE shuffle, keyed ``user_id % P`` (a user's events land in exactly
    one part — the ``q_user_cumulative_spend`` idiom, NOT a raw
    user-cardinality ``map_groups`` which would pay one Python call per
    user at millions of distinct users); each part sorts its own rows
    by (user_id, ts, event_id) (the deterministic total order the
    oracle uses) and emits its bigram counts in ONE vectorized pass
    (adjacent-row pairs masked at user boundaries), so at most
    P × |types|² partial rows exist globally. The final combine is a
    tiny (from_type, to_type) groupby over those partials — never a
    corpus-sized second shuffle.

    Skew note: a hot user bounds one part's sort, nothing more; the
    partial size is independent of stream length.
    """
    from ray.data.aggregate import Sum

    P = 16

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(u % P, pa.int64()))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        uid = s["user_id"].to_numpy()
        et = s["event_type"].to_numpy()
        if len(et) < 2:
            return pd.DataFrame(
                {"from_type": [], "to_type": [], "n": []}
            ).astype({"from_type": str, "to_type": str, "n": np.int64})
        same = uid[1:] == uid[:-1]
        out = (
            pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
            .groupby(["from_type", "to_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    return (
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
        .map_batches(add_part, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


EVENT_TRANSITIONS_SQL = """
SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
FROM (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
    FROM events
)
WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""


# --------------------------------------- referential-integrity audit


def _nonnull_int_keys(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Non-null int64 key values of a column (NULL keys are dropped
    BEFORE the numpy cast — ``to_numpy`` would surface them as NaN and
    ``astype(int64)`` would turn them into undefined integers, making
    engine/oracle NULL semantics diverge — round-4 ADVICE item)."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if a.null_count:
        a = a.drop_null()
    return a.to_numpy(zero_copy_only=False).astype(np.int64)


def _orphan_counts(
    fact_ds, fact_key: str, dim_ds, dim_key: str,
    dim_broadcast_limit: int = DIM_BROADCAST_LIMIT,
    num_partitions: int = 16,
) -> tuple[int, int]:
    """(fact_rows, orphans) for one foreign-key relationship.

    NULL semantics match the SQL ``NOT IN`` oracle: ``fact_rows``
    counts every row, a NULL fact key is never an orphan, NULL
    dimension keys are ignored.

    Dimension keys broadcast ONCE via ``ray.put`` when the dimension
    stays under ``dim_broadcast_limit`` — decided in the SAME streaming
    pass that collects the keys (running row count; no separate
    ``count()`` execution before a second scan — round-4 ADVICE item).
    The fact side streams, emitting two int64 partials per batch. Past
    the guard, both sides shuffle once on ``key % num_partitions`` and
    each part anti-counts locally — the same union-partition idiom as
    ``functions.joins.hash_join``, counts only (no payload movement).
    """
    import ray
    import ray.data  # noqa: F401
    from ray.data.aggregate import Sum

    # one pass: collect keys while the running count stays under the
    # guard; bail to the distributed path the moment it does not
    key_chunks: list[np.ndarray] = []
    seen = 0
    small = True
    for b in dim_ds.iter_batches(batch_format="pyarrow"):
        seen += b.num_rows
        if seen > dim_broadcast_limit:
            small = False
            break
        key_chunks.append(_nonnull_int_keys(b[dim_key]))

    if small:
        key_arr = np.unique(
            np.concatenate(key_chunks) if key_chunks else np.zeros(0, np.int64)
        )
        key_ref = ray.put(key_arr)

        def audit(t: pa.Table) -> pa.Table:
            k = _nonnull_int_keys(t[fact_key])
            hit = np.isin(k, ray.get(key_ref))
            return pa.table(
                {
                    "fact_rows": pa.array([t.num_rows], pa.int64()),
                    "orphans": pa.array([int((~hit).sum())], pa.int64()),
                }
            )

        partials = fact_ds.map_batches(audit, batch_format="pyarrow")
        agg = partials.aggregate(
            Sum("fact_rows", alias_name="fact_rows"),
            Sum("orphans", alias_name="orphans"),
        ) or {}
        return (
            int(agg.get("fact_rows") or 0),
            int(agg.get("orphans") or 0),
        )

    # distributed fallback: one co-shuffle on key % P, local anti-count.
    # NULL fact keys ship with valid=0 (still counted into fact_rows,
    # never orphan-eligible); NULL dim keys are dropped — SQL NOT IN
    # semantics in one pass, no extra null-count scan.
    def tag(side: int, col: str):
        def fn(t: pa.Table) -> pa.Table:
            c = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
            valid = np.ones(len(c), np.int8) if c.null_count == 0 else (
                c.is_valid().to_numpy(zero_copy_only=False).astype(np.int8)
            )
            k = np.where(
                valid.astype(bool),
                c.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64),
                np.int64(0),
            )
            if side == 1 and c.null_count:
                keep = valid.astype(bool)
                k, valid = k[keep], valid[keep]
            return pa.table(
                {
                    "k": pa.array(k, pa.int64()),
                    "side": pa.array(
                        np.full(len(k), side, np.int8), pa.int8()
                    ),
                    "valid": pa.array(valid, pa.int8()),
                    "part": pa.array(k % num_partitions, pa.int64()),
                }
            )

        return fn

    both = fact_ds.map_batches(tag(0, fact_key), batch_format="pyarrow").union(
        dim_ds.map_batches(tag(1, dim_key), batch_format="pyarrow")
    )

    def anti_count(g: pd.DataFrame) -> pd.DataFrame:
        is_fact = g["side"].to_numpy() == 0
        fact_valid = g.loc[
            is_fact & (g["valid"].to_numpy() == 1), "k"
        ].to_numpy()
        dim = np.unique(g.loc[~is_fact, "k"].to_numpy())
        return pd.DataFrame(
            {
                "fact_rows": [np.int64(is_fact.sum())],
                "orphans": [np.int64((~np.isin(fact_valid, dim)).sum())],
            }
        )

    agg = (
        both.groupby("part")
        .map_groups(anti_count, batch_format="pandas")
        .aggregate(
            Sum("fact_rows", alias_name="fact_rows"),
            Sum("orphans", alias_name="orphans"),
        )
    ) or {}
    return int(agg.get("fact_rows") or 0), int(agg.get("orphans") or 0)


def q_fk_orphans(sf_dir: str, dim_broadcast_limit: int = DIM_BROADCAST_LIMIT):
    """Foreign-key orphan audit across the star schema — the
    data-quality gate a 100-TB ingest runs before training-data jobs
    trust a snapshot. One row per relationship: total fact rows and
    rows whose key has no match in the referenced dimension.

    FUSED fact scans: every relationship sharing a fact table audits
    in ONE streaming pass over that table (lineitem's three FKs = one
    scan reading three key columns; the naive per-rel loop scanned it
    three times), and each dimension's key set loads once no matter
    how many relationships reference it (customer backs two). Count
    partials only — no payload columns leave the scans. A dimension
    past ``dim_broadcast_limit`` drops just ITS relationships to the
    per-rel co-shuffle fallback (:func:`_orphan_counts`).
    """
    import ray

    rels = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("events->customer", "events", "user_id", "customer", "c_custkey"),
    ]

    # one guarded key-set broadcast per DISTINCT dimension; the guard
    # count comes from the parquet FOOTER (no Ray job) and the key
    # column — dimension-sized by the guard — loads driver-side in one
    # pyarrow read, same footer-stats idiom as the quantile engines
    import pyarrow.dataset as pads

    key_refs: dict[str, object] = {}
    for dim, dkey in {(r[3], r[4]) for r in rels}:
        dim_pads = pads.dataset(f"{sf_dir}/{dim}.parquet", format="parquet")
        if dim_pads.count_rows() > dim_broadcast_limit:
            continue  # its rels take the per-rel fallback below
        keys = _nonnull_int_keys(dim_pads.to_table(columns=[dkey])[dkey])
        key_refs[dim] = ray.put(np.unique(keys))

    results: dict[str, tuple[int, int]] = {}
    fused = [r for r in rels if r[3] in key_refs]
    for fact in {r[1] for r in fused}:
        fact_rels = [(r[0], r[2], r[3]) for r in fused if r[1] == fact]
        fkeys = sorted({fk for _, fk, _ in fact_rels})
        refs = {rel: key_refs[dim] for rel, _, dim in fact_rels}
        audits = [(rel, fk) for rel, fk, _ in fact_rels]

        def audit(t: pa.Table, audits=audits, refs=refs) -> pa.Table:
            out_rel, out_orph = [], []
            for rel, fk in audits:
                # NULL fact keys count into fact_rows (t.num_rows) but
                # are never orphans — SQL NOT IN semantics
                k = _nonnull_int_keys(t[fk])
                out_rel.append(rel)
                out_orph.append(int((~np.isin(k, ray.get(refs[rel]))).sum()))
            return pa.table(
                {
                    "rel": pa.array(out_rel, pa.string()),
                    "fact_rows": pa.array(
                        np.full(len(audits), t.num_rows, np.int64), pa.int64()
                    ),
                    "orphans": pa.array(out_orph, pa.int64()),
                }
            )

        # partials are blocks × ≤len(audits) tiny rows — a driver sum
        # beats paying a shuffle job per fact table
        partials = (
            _read(sf_dir, fact, fkeys)
            .map_batches(audit, batch_format="pyarrow")
            .take_all()
        )
        for rel, _, _ in fact_rels:
            results[rel] = (
                sum(p["fact_rows"] for p in partials if p["rel"] == rel),
                sum(p["orphans"] for p in partials if p["rel"] == rel),
            )

    for rel, fact, fkey, dim, dkey in rels:  # past-guard dims
        if rel in results:
            continue
        results[rel] = _orphan_counts(
            _read(sf_dir, fact, [fkey]),
            fkey,
            _read(sf_dir, dim, [dkey]),
            dkey,
            dim_broadcast_limit=dim_broadcast_limit,
        )

    names = [r[0] for r in rels]
    return pa.table(
        {
            "rel": pa.array(names, pa.string()),
            "fact_rows": pa.array(
                [results[n][0] for n in names], pa.int64()
            ),
            "orphans": pa.array([results[n][1] for n in names], pa.int64()),
        }
    )


FK_ORPHANS_SQL = """
SELECT 'lineitem->orders' AS rel,
       (SELECT COUNT(*) FROM lineitem) AS fact_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
         WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS orphans
UNION ALL
SELECT 'lineitem->part',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
         WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
UNION ALL
SELECT 'lineitem->supplier',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
         WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
UNION ALL
SELECT 'orders->customer',
       (SELECT COUNT(*) FROM orders),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
UNION ALL
SELECT 'events->customer',
       (SELECT COUNT(*) FROM events),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM events
         WHERE user_id NOT IN (SELECT c_custkey FROM customer))
"""


# ------------------------------------------------- exponential decay


def q_user_value_ema(sf_dir: str, alpha: float = 0.1):
    """Final exponentially-weighted moving average of ``value`` per
    user over the (ts, event_id) total order — the recurrence-shaped
    member of the windowed-scan family (EMA_n = α·x_n + (1−α)·EMA_{n−1},
    EMA_1 = x_1), the standard decayed-engagement feature.

    Users hash-partition on ``user_id % P`` (a user's events land in
    exactly one part — the ``q_user_cumulative_spend`` idiom, NOT a
    raw user-cardinality groupby which degenerates at millions of
    distinct users); each part sorts only its own rows and evaluates
    the CLOSED FORM per user with segment reductions (no per-group
    Python calls):
    EMA_N = (1−α)^{N−1}·x_1 + α·Σ_{i≥2} (1−α)^{N−i}·x_i.
    Numerics: every weight is ≤ 1 and only ever UNDERFLOWS (old terms'
    true contribution is below 1e-300 anyway) — never the exploding
    w^{−i} rescaling trick. The oracle computes the identical closed
    form with SQL POWER; both sides round to 5 dp with the SAME
    half-away-from-zero rule (floor(x·1e5 + 0.5)/1e5 — values are
    non-negative) so the hash compare never straddles a rounding
    boundary. NOTE: the SQL twin hardcodes α = 0.1; calling this with
    a non-default ``alpha`` diverges from ``USER_VALUE_EMA_SQL`` by
    design (the oracle is only the α = 0.1 instance).
    """
    P = 16

    def add_part(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(u % P, pa.int64()))

    def ema_part(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
        uid = s["user_id"].to_numpy().astype(np.int64)
        x = s["value"].to_numpy(np.float64)
        n = len(uid)
        if n == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "ema_value": pd.Series([], dtype=np.float64)}
            )
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        bounds = np.flatnonzero(first)
        seg_len = np.diff(np.append(bounds, n))
        # 0-based rank within user and user group size, per row.
        rn0 = np.arange(n) - np.repeat(bounds, seg_len)
        cnt = np.repeat(seg_len, seg_len)
        w = 1.0 - alpha
        weight = np.where(first, 1.0, alpha) * w ** (cnt - 1 - rn0)
        ema = np.add.reduceat(weight * x, bounds)
        return pd.DataFrame(
            {
                "user_id": uid[bounds],
                "ema_value": np.floor(ema * 1e5 + 0.5) / 1e5,
            }
        )

    return (
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
        .map_batches(add_part, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(ema_part, batch_format="pandas")
    )


USER_VALUE_EMA_SQL = """
SELECT user_id,
       FLOOR(SUM(CASE WHEN rn = 1 THEN POWER(0.9, cnt - rn) * value
                      ELSE 0.1 * POWER(0.9, cnt - rn) * value END)
             * 100000 + 0.5) / 100000
           AS ema_value
FROM (
    SELECT user_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           COUNT(*) OVER (PARTITION BY user_id) AS cnt
    FROM events
)
GROUP BY user_id
"""


# ------------------------------------------- hopping (sliding) windows


def q_events_hopping(sf_dir: str, width_s: int = 3600, hop_s: int = 900):
    """Hopping-window aggregate (1 h window sliding every 15 min) —
    the third event-time window family next to tumbling
    (:func:`q_events_hourly`) and per-key RANGE rolling
    (:func:`q_user_rolling_1h`).

    Scale shape: each event covers exactly ``width/hop`` windows, so
    the map side flat-expands every batch by that constant factor
    vectorized (``np.add.outer`` of the hop offsets, no Python loop),
    collapses the expansion to in-batch partial (window, type)
    counts/sums — shuffle bytes stay at partial-row size, never
    expanded-event size — and the merge runs on the bounded
    ``win_start % P`` part key with a per-part vectorized groupby
    (a window lands in exactly ONE part, so per-part sums are
    globally exact). A raw ``groupby(win_start, event_type)``
    .aggregate here is window-cardinality-keyed and degenerates
    Ray's sort-aggregate exactly like the pre-fix graph_triangles
    (measured 18.5 s → <1 s at sf0.1 for the SAME 14k partial rows).
    ``win_start`` is the window's epoch-second start (BIGINT on both
    engines; no timezone/format dependence).

    NOTE: :data:`EVENTS_HOPPING_SQL` hardcodes the default
    width/hop (3600/900); non-default parameters diverge from the
    SQL twin (the ``q_user_value_ema`` alpha precedent).
    """
    P = 16
    k = width_s // hop_s
    offs = (np.arange(k, dtype=np.int64) * hop_s)[::-1].copy()

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        sec = df["ts"].to_numpy("datetime64[ns]").view(np.int64) // 1_000_000_000
        hop_floor = (sec // hop_s) * hop_s
        starts = (hop_floor[:, None] - offs[None, :]).ravel()
        cents = np.floor(df["value"].to_numpy() * 100).astype(np.int64)
        out = pd.DataFrame(
            {
                "part": (starts // hop_s) % P,
                "win_start": starts,
                "event_type": np.repeat(df["event_type"].to_numpy(), k),
                "n_events": np.int64(1),
                "sum_value_cents": np.repeat(cents, k),
            }
        )
        return (
            out.groupby(["part", "win_start", "event_type"], sort=False, as_index=False)
            .agg(n_events=("n_events", "sum"), sum_value_cents=("sum_value_cents", "sum"))
        )

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(["win_start", "event_type"], sort=False, as_index=False)
            .agg(n_events=("n_events", "sum"), sum_value_cents=("sum_value_cents", "sum"))
        )

    return (
        _read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(expand, batch_format="pandas", batch_size=65536)
        .groupby("part")
        .map_groups(merge_part, batch_format="pandas")
    )


EVENTS_HOPPING_SQL = """
SELECT hf - off AS win_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM (SELECT CAST(FLOOR(epoch(ts) / 900) AS BIGINT) * 900 AS hf, event_type, value
      FROM events),
     (SELECT unnest([0, 900, 1800, 2700]) AS off)
GROUP BY 1, 2
"""


def q_weekly_active_users(sf_dir: str, window_days: int = 7):
    """Sliding-window COUNT(DISTINCT): users active in the trailing
    7 days, per window-end day (the WAU curve). Distinct does NOT
    decompose over hops, so the exact plan is two distincts with the
    expansion between them, each stage combiner-reduced:

    1. map side collapses batches to distinct (part=user%P, day, user)
       triples — shuffle bytes shrink to the per-batch distinct set;
    2. ONE shuffle on the bounded part key; a user's rows land in one
       part, so the per-part dedup of (day, user) and, after the ×7
       closed-form window expansion, of (win_day, user) are both
       globally exact;
    3. per-part partial counts per win_day → a win_day-cardinality
       groupby sum (metadata-sized).

    ``win_day`` = epoch days (BIGINT both engines). Only windows whose
    trailing range saw ≥ 1 active user appear (identical both sides).

    NOTE: :data:`WEEKLY_ACTIVE_SQL` hardcodes the default 7-day
    window; a non-default ``window_days`` diverges from the SQL twin.
    """
    from ray.data.aggregate import Sum

    P = 16
    offs = np.arange(window_days, dtype=np.int64)

    def day_pairs(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy().astype(np.int64)
        day = df["ts"].to_numpy("datetime64[ns]").view(np.int64) // 86_400_000_000_000
        out = pd.DataFrame({"part": u % P, "day": day, "user_id": u})
        return out.drop_duplicates(ignore_index=True)

    def part_counts(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["day", "user_id"])
        day = u["day"].to_numpy()
        uid = u["user_id"].to_numpy()
        win = (day[:, None] + offs[None, :]).ravel()
        pairs = pd.DataFrame({"win_day": win, "user_id": np.repeat(uid, len(offs))})
        pairs = pairs.drop_duplicates(ignore_index=True)
        return (
            pairs.groupby("win_day", sort=False)
            .size()
            .reset_index(name="n_users")
        )

    return (
        _read(sf_dir, "events", ["ts", "user_id"])
        .map_batches(day_pairs, batch_format="pandas", batch_size=65536)
        .groupby("part")
        .map_groups(part_counts, batch_format="pandas")
        .groupby("win_day")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


WEEKLY_ACTIVE_SQL = """
SELECT day + off AS win_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM (SELECT DISTINCT CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) AS day, user_id
      FROM events),
     (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS off)
GROUP BY 1
"""


def q_nation_revenue_share(sf_dir: str, dim_broadcast_limit: int = DIM_BROADCAST_LIMIT):
    """Ratio-to-report window (share of partition total): each
    nation's customer revenue next to its REGION's total — the
    ``SUM(x) OVER (PARTITION BY region)`` family, the one window shape
    (share-of-total) the window suite didn't yet cover.

    Scale shape: the fact table is touched ONCE (in-batch partials
    keyed by the ≤ 25-value nationkey, customer attached via the
    guarded broadcast ⇄ hash-join idiom of :func:`q_segment_revenue`);
    the window itself runs over the nation-cardinality aggregate — a
    bounded-size result, so the "window" is a vectorized transform on
    metadata-sized data, never a second fact pass. Output is
    integer-exact (cents on both engines), no float share column.
    """
    from ray.data.aggregate import Sum

    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    if cust_ds.count() <= dim_broadcast_limit:
        cust = cust_ds.to_pandas()
        nat_of = pd.Series(
            cust.c_nationkey.to_numpy().astype(np.int64),
            index=cust.c_custkey.to_numpy(),
        )

        def lookup(batch: pa.Table) -> pa.Table:
            nk = (
                pd.Series(batch["o_custkey"].to_numpy(zero_copy_only=False))
                .map(nat_of).to_numpy().astype(np.int64)
            )
            return pa.table(
                {
                    "c_nationkey": pa.array(nk, pa.int64()),
                    "total_cents": _floor_units(batch["o_totalprice"], 100),
                }
            )

        tagged = orders.map_batches(lookup, batch_format="pyarrow")
    else:
        from ..functions.joins import hash_join

        pre = orders.map_batches(
            lambda t: pa.table(
                {
                    "o_custkey": t["o_custkey"],
                    "total_cents": _floor_units(t["o_totalprice"], 100),
                }
            ),
            batch_format="pyarrow",
        )
        tagged = hash_join(
            pre, cust_ds, left_on="o_custkey", right_on="c_custkey",
            num_partitions=16,
        ).map_batches(
            lambda t: pa.table(
                {
                    "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
                    "total_cents": t["total_cents"],
                }
            ),
            batch_format="pyarrow",
        )

    per_nation = (
        tagged.groupby("c_nationkey")
        .aggregate(Sum("total_cents", alias_name="revenue_cents"))
        .to_pandas()
    )
    # nation-cardinality window: attach names + region totals
    nk = per_nation["c_nationkey"].to_numpy().astype(np.int64)
    nat = nation.set_index("n_nationkey")
    rname_of = region.set_index("r_regionkey")["r_name"]
    rkey = nat["n_regionkey"].loc[nk].to_numpy()
    rev = per_nation["revenue_cents"].to_numpy().astype(np.int64)
    out = pd.DataFrame(
        {
            "n_name": nat["n_name"].loc[nk].to_numpy(),
            "r_name": rname_of.loc[rkey].to_numpy(),
            "revenue_cents": rev,
        }
    )
    out["region_total_cents"] = out.groupby("r_name")["revenue_cents"].transform("sum")
    return pa.Table.from_pandas(out, preserve_index=False)


NATION_REVENUE_SHARE_SQL = """
SELECT n_name, r_name, revenue_cents,
       CAST(SUM(revenue_cents) OVER (PARTITION BY r_name) AS BIGINT)
           AS region_total_cents
FROM (
    SELECT n_name, r_name,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
)
"""
