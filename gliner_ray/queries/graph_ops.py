"""Graph-analytics driver queries over the events-derived bipartite
interaction graph (node 'u<user_id>' — node 'i<k>' for every event,
``k`` parsed from the ``props`` JSON).

``q_user_item_degree`` and ``graph_components`` have exact DuckDB
oracles (the latter a recursive-CTE transitive closure — exact but
O(n²) in component size, fine at oracle scale; the Ray path is the
production O(E·diameter) propagation). ``graph_pagerank`` is
rows-only here; exact-parity vs the sequential oracle lives in pytest.
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
    partition-actor engine (rows-only; exact-parity pytest oracle in
    tests/test_graph.py). Ranks are rounded to 12 decimals so the
    output is hash-stable across partition layouts."""
    import pyarrow.compute as pc

    ranks = fgraph.pagerank(interaction_edges(sf_dir), n_parts=4, n_iter=30)
    return ranks.map_batches(
        lambda t: pa.table(
            {"node": t["node"], "rank": pc.round(t["rank"], ndigits=12)}
        ),
        batch_format="pyarrow",
    )
