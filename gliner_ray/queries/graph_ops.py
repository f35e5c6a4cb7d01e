"""Graph-analytics driver queries over the events-derived bipartite
interaction graph (node 'u<user_id>' — node 'i<k>' for every event,
``k`` parsed from the ``props`` JSON).

All three queries have exact DuckDB oracles: ``graph_components`` via
a recursive-CTE transitive closure (exact but O(n²) in component
size, fine at oracle scale; the Ray path is the production
O(E·diameter) propagation) and ``graph_pagerank`` via an unrolled
fixed-iteration power-iteration SQL twin.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions import graph as fgraph


def _events(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _edges_batch(t: pa.Table) -> pa.Table:
    users = t["user_id"].to_pylist()
    items = [str(json.loads(p)["k"]) for p in t["props"].to_pylist()]
    return pa.table(
        {
            "src": pa.array([f"u{u}" for u in users], pa.string()),
            "dst": pa.array([f"i{k}" for k in items], pa.string()),
        }
    )


def interaction_edges(sf_dir: str):
    return _events(sf_dir, ["user_id", "props"]).map_batches(
        _edges_batch, batch_format="pyarrow"
    )


def q_user_item_degree(sf_dir: str):
    """Per-user degree over the interaction graph: distinct items
    touched + total events. In-batch distinct combiner → one
    ``user_id % P`` int-key shuffle → per-part pandas distinct counts
    (nothing string-keyed crosses the shuffle)."""
    import pandas as pd

    P = 16

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_pandas(),
                "item": [str(json.loads(p)["k"]) for p in t["props"].to_pylist()],
            }
        )
        agg = (
            df.groupby(["user_id", "item"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        agg["part"] = agg["user_id"] % P
        return pa.Table.from_pandas(agg, preserve_index=False)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id").agg(
            n_items=("item", "nunique"), n_events=("n", "sum")
        )
        return out.reset_index()

    return (
        _events(sf_dir, ["user_id", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .select_columns(["user_id", "n_items", "n_events"])
    )


USER_ITEM_DEGREE_SQL = """
SELECT user_id,
       CAST(COUNT(DISTINCT json_extract_string(props, '$.k')) AS BIGINT) AS n_items,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
"""


def graph_components(sf_dir: str):
    """Connected components of the interaction graph (adaptive:
    driver union-find under the edge-count guard, distributed
    min-label propagation above it — both tested for parity)."""
    return fgraph.connected_components(interaction_edges(sf_dir))


GRAPH_COMPONENTS_SQL = """
WITH RECURSIVE e AS (
  SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS a,
                  'i' || json_extract_string(props, '$.k') AS b
  FROM events
), sym AS (
  SELECT a, b FROM e UNION SELECT b, a FROM e
), reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
)
SELECT a AS node, least(min(b), a) AS component
FROM reach
GROUP BY a
"""


def graph_pagerank(sf_dir: str):
    """PageRank over the interaction graph via the Pregel-style
    partition-actor engine, now under an EXACT DuckDB oracle: both
    sides run exactly ``n_iter=15`` damping-0.85 rounds (``tol=0`` —
    no early stop, so the iteration counts can never diverge) of the
    same formulation (dedup edges, 1/n init, (1-d)/n base, dangling
    mass redistributed uniformly). The SQL twin unrolls the power
    iteration as chained CTEs. Ranks round to 8 dp on both sides:
    measured cross-engine float64 combine noise is ~1e-14, six orders
    inside the rounding granularity. Exact-parity vs the sequential
    formulation also lives in tests/test_graph.py."""
    import pyarrow.compute as pc

    ranks = fgraph.pagerank(
        interaction_edges(sf_dir), n_parts=4, n_iter=_PR_ITER, tol=0.0
    )
    return ranks.map_batches(
        lambda t: pa.table(
            {"node": t["node"], "rank": pc.round(t["rank"], ndigits=8)}
        ),
        batch_format="pyarrow",
    )


_PR_ITER = 15
_PR_DAMP = 0.85


def _pagerank_sql(n_iter: int = _PR_ITER, damping: float = _PR_DAMP) -> str:
    """Unrolled power-iteration PageRank as one DuckDB query: r0 is
    uniform, each r{k} CTE is one matvec round (contribution join +
    dangling-mass scalar), mirroring ``pagerank_sequential`` exactly.
    Every CTE is MATERIALIZED: each round references the previous one
    twice, so DuckDB's default CTE inlining would expand the plan
    2^n_iter-fold (observed as thousands of concurrent parquet scans
    blowing the fd limit)."""
    header = """
WITH edges AS MATERIALIZED (
  SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS src,
                  'i' || json_extract_string(props, '$.k') AS dst
  FROM events
),
nodes AS MATERIALIZED (
  SELECT node FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges)
),
meta AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
outdeg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS od FROM edges GROUP BY src),
r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM meta) AS rank FROM nodes)"""
    step = """,
r{next} AS MATERIALIZED (
  SELECT nd.node,
         (1 - {d}) / (SELECT n FROM meta)
         + {d} * (COALESCE(c.contrib, 0)
                  + (SELECT COALESCE(SUM(r.rank), 0) FROM r{cur} r
                     LEFT JOIN outdeg o ON r.node = o.src
                     WHERE o.src IS NULL) / (SELECT n FROM meta)) AS rank
  FROM nodes nd
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank / o.od) AS contrib
    FROM edges e
    JOIN r{cur} r ON e.src = r.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) c ON nd.node = c.node
)"""
    body = "".join(
        step.format(cur=k, next=k + 1, d=damping) for k in range(n_iter)
    )
    return (
        header + body
        + f"\nSELECT node, ROUND(rank, 8) AS rank FROM r{n_iter}"
    )


GRAPH_PAGERANK_SQL = _pagerank_sql()


def graph_cf_pairs(
    sf_dir: str,
    min_shared: int = 3,
    k: int = 20,
    max_item_degree: int = 10_000,
):
    """Co-engagement projection of the bipartite graph: top-``k``
    user pairs by DISTINCT shared items — the collaborative-filtering
    common-neighbors op. The pair space is quadratic in item degree,
    so items with more than ``max_item_degree`` distinct users are
    EXCLUDED up front (the standard stop-item rule; the SQL twin
    applies the identical HAVING cap, so the bound is part of the
    contract, not an approximation). Shuffle shape:

    1. per-batch distinct (user, item) combiner → ONE item-keyed
       shuffle; each item group dedups users globally and emits its
       ``C(d,2)`` pairs (d ≤ max_item_degree by the cap);
    2. pair-keyed groupby sums shared-item counts (the documented
       Σd² cost — bounded by the cap, salted-hot-key-free);
    3. ``min_shared`` filter + per-block partial top-k, driver-merged
       (every pair lives in exactly one block after the groupby).
    """
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def distinct_pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_pandas(),
                "item": [str(json.loads(p)["k"]) for p in t["props"].to_pylist()],
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_item(g: pd.DataFrame) -> pd.DataFrame:
        users = np.unique(g["user_id"].to_numpy())
        if len(users) < 2 or len(users) > max_item_degree:
            return pd.DataFrame({"ua": [], "ub": [], "shared": []}).astype(
                {"ua": "int64", "ub": "int64", "shared": "int64"}
            )
        # vectorized C(d,2) pair enumeration (users is sorted by
        # np.unique, so iu < ju keeps ua < ub)
        iu, ju = np.triu_indices(len(users), k=1)
        return pd.DataFrame(
            {
                "ua": users[iu].astype(np.int64),
                "ub": users[ju].astype(np.int64),
                "shared": np.ones(len(iu), np.int64),
            }
        )

    counts = (
        _events(sf_dir, ["user_id", "props"])
        .map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("item")
        .map_groups(per_item, batch_format="pandas")
        .groupby(["ua", "ub"])
        .aggregate(Sum("shared", alias_name="shared"))
    )

    def block_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["shared"] >= min_shared]
        df = df.sort_values(
            ["shared", "ua", "ub"], ascending=[False, True, True]
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cands = counts.map_batches(block_topk, batch_format="pyarrow").take_all()
    top = sorted(cands, key=lambda r: (-r["shared"], r["ua"], r["ub"]))[:k]
    return pa.table(
        {
            "ua": pa.array([r["ua"] for r in top], pa.int64()),
            "ub": pa.array([r["ub"] for r in top], pa.int64()),
            "shared": pa.array([r["shared"] for r in top], pa.int64()),
        }
    )


GRAPH_CF_PAIRS_SQL = """
WITH ui AS (
  SELECT DISTINCT user_id, json_extract_string(props, '$.k') AS item
  FROM events
), keep AS (
  SELECT item FROM ui GROUP BY item HAVING COUNT(*) BETWEEN 2 AND 10000
), pairs AS (
  SELECT a.user_id AS ua, b.user_id AS ub, CAST(COUNT(*) AS BIGINT) AS shared
  FROM ui a
  JOIN ui b ON a.item = b.item AND a.user_id < b.user_id
  JOIN keep ON keep.item = a.item
  GROUP BY 1, 2
)
SELECT ua, ub, shared FROM pairs WHERE shared >= 3
ORDER BY shared DESC, ua, ub
LIMIT 20
"""
