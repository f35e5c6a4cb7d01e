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


# Two-tier exact ``str(json.loads(props)["k"])`` (the q_props_k_sum
# idiom): rows that are provably FLAT objects with no escapes take the
# vectorized Arrow regex kernel; anything else (nested objects, escaped
# strings, non-integer k) falls back to a real json.loads on just those
# rows — rare by corpus shape, exact always (including raising on a
# malformed row, same as the scalar idiom it replaces).
_FLAT_RE = r"^\{[^{\[\\]*\}$"
_K_INT_RE = r'"k"\s*:\s*(?P<item>-?\d+)'


def _props_k_str(col: pa.ChunkedArray) -> "np.ndarray":
    import numpy as np
    import pyarrow.compute as pc

    m = pc.extract_regex(col, _K_INT_RE)
    item = pc.struct_field(m, "item")
    flat = pc.fill_null(pc.match_substring_regex(col, _FLAT_RE), False)
    ok = pc.and_(pc.is_valid(item), flat)
    out = pc.fill_null(item, "").to_numpy(zero_copy_only=False).astype(object)
    bad = np.flatnonzero(np.logical_not(ok.to_numpy(zero_copy_only=False)))
    if len(bad):
        raw = col.take(pa.array(bad)).to_pylist()
        for i, txt in zip(bad, raw):
            out[i] = str(json.loads(txt)["k"])
    return out


def _edges_batch(t: pa.Table) -> pa.Table:
    import numpy as np

    users = t["user_id"].to_numpy(zero_copy_only=False)
    items = _props_k_str(t["props"])
    return pa.table(
        {
            "src": pa.array(np.char.add("u", users.astype("U")), pa.string()),
            "dst": pa.array(np.char.add("i", items.astype("U")), pa.string()),
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
                "item": _props_k_str(t["props"]),
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


def _kcore_sql(n_rounds: int = 40) -> str:
    """Unrolled k-core peel as one DuckDB query (same MATERIALIZED-CTE
    unrolling as :func:`_pagerank_sql`): a0 is every co-purchase node,
    each round keeps nodes whose degree WITHIN the previous survivor
    set is ≥ k, where k replicates the engine's derived default
    ``max(2, ceil(0.7 · 2E/N))`` with the identical double-precision
    expression. Peeling is monotone and idempotent at the fixpoint, so
    any ``n_rounds`` ≥ the true peel depth is exact — 40 is ~3× the
    measured depth at sf0.01 (the engine's own max_rounds guard is
    64). Final row set: (node, deg-inside-core), matching
    :func:`graph_kcore`."""
    header = """
WITH op AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
edges AS MATERIALIZED (
  SELECT DISTINCT l1.p AS a, l2.p AS b
  FROM op l1 JOIN op l2 ON l1.o = l2.o AND l1.p < l2.p
),
sym AS MATERIALIZED (
  SELECT a AS u, b AS v FROM edges UNION ALL SELECT b, a FROM edges
),
kmeta AS MATERIALIZED (
  SELECT GREATEST(2, CAST(CEIL(0.7 * 2.0 * (SELECT COUNT(*) FROM edges)
                               / (SELECT COUNT(DISTINCT u) FROM sym))
                          AS BIGINT)) AS kv
),
a0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym)"""
    step = """,
a{next} AS MATERIALIZED (
  SELECT e.u AS node
  FROM sym e
  JOIN a{cur} x ON x.node = e.u
  JOIN a{cur} y ON y.node = e.v
  GROUP BY e.u
  HAVING COUNT(*) >= (SELECT kv FROM kmeta)
)"""
    body = "".join(step.format(cur=r, next=r + 1) for r in range(n_rounds))
    return (
        header + body
        + f"""
SELECT e.u AS node, COUNT(*) AS deg
FROM sym e
JOIN a{n_rounds} x ON x.node = e.u
JOIN a{n_rounds} y ON y.node = e.v
GROUP BY e.u"""
    )


GRAPH_KCORE_SQL = _kcore_sql()


def graph_cf_pairs(
    sf_dir: str,
    min_shared: int = 3,
    k: int = 20,
    max_item_degree: int = 10_000,
    dense_users_limit: int = 4096,
):
    """Co-engagement projection of the bipartite graph: top-``k``
    user pairs by DISTINCT shared items — the collaborative-filtering
    common-neighbors op. The pair space is quadratic in item degree,
    so items with more than ``max_item_degree`` distinct users are
    EXCLUDED up front (the standard stop-item rule; the SQL twin
    applies the identical HAVING cap, so the bound is part of the
    contract, not an approximation).

    Two exact tiers, decided by a guarded distinct-user probe (the
    repo's broadcast ⇄ distributed idiom):

    DENSE (≤ ``dense_users_limit`` distinct users — the small-side
    regime): the sorted user vector rides the closure; each item-part
    folds its items into ONE ``U×U`` co-occurrence partial via chunked
    ``A.T @ A`` (item chunks ≤ 256 rows keep every float32 product
    exact, accumulated into an int32 matrix), and the driver sums P
    blob partials — the k-means K×D-partials shape. NOTHING pair-sized
    ever shuffles (at sf0.1 that replaces a ~13M-row pair exchange
    with 16 × ~9 MB partials, measured ~20 s → ~2 s).

    SPARSE (above the limit — the 100-TB shape):

    1. per-batch distinct (user, item) combiner, part key =
       ``hash(item) % P`` (an item lives in exactly one part — never
       a raw item-string groupby, which degenerates at catalog-scale
       item cardinality exactly like the pre-fix ``graph_triangles``);
    2. per part: global (user, item) dedup, vectorized ``C(d,2)``
       pair emission per item (d ≤ ``max_item_degree`` by the cap),
       then a LOCAL pair pre-aggregation before anything shuffles —
       via lexsort + ``reduceat`` segment reduction (measured 12 s →
       sub-second per part vs a pandas two-key groupby at ~4M pairs,
       and exact for the FULL int64 id domain, no packing guard);
    3. ONE pair shuffle on ``(ua·PRIME + ub) % P`` (a pair lives in
       exactly one part) → per-part exact sums, ``min_shared`` filter
       and per-part top-k; the driver merges P candidate top-ks.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    P = 16
    PRIME = np.int64(1_000_003)

    def _segment_sum(ua, ub, w):
        """Sum ``w`` over equal (ua, ub) runs: lexsorted keys →
        boundary mask → one ``add.reduceat``. Returns unique
        (ua, ub, total) already sorted ascending by (ua, ub)."""
        if len(ua) == 0:
            z = np.array([], dtype=np.int64)
            return z, z, z
        order = np.lexsort((ub, ua))
        ua_s, ub_s, w_s = ua[order], ub[order], w[order]
        m = len(ua_s)
        new = np.empty(m, dtype=bool)
        new[0] = True
        new[1:] = (ua_s[1:] != ua_s[:-1]) | (ub_s[1:] != ub_s[:-1])
        b = np.flatnonzero(new)
        return ua_s[b], ub_s[b], np.add.reduceat(w_s, b).astype(np.int64)

    def distinct_pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_pandas(),
                "item": _props_k_str(t["props"]),
            }
        ).drop_duplicates()
        # stable cross-process string hash (fixed-key siphash)
        df["part"] = (
            pd.util.hash_pandas_object(df["item"], index=False).to_numpy()
            % np.uint64(P)
        ).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        s = g.drop_duplicates(["user_id", "item"]).sort_values(
            ["item", "user_id"], ignore_index=True
        )
        uid = s["user_id"].to_numpy().astype(np.int64)
        item = s["item"].to_numpy()
        n = len(uid)
        empty = pd.DataFrame(
            {"ua": pd.Series([], dtype=np.int64),
             "ub": pd.Series([], dtype=np.int64),
             "shared": pd.Series([], dtype=np.int64),
             "pairpart": pd.Series([], dtype=np.int64)}
        )
        if n == 0:
            return empty
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = item[1:] != item[:-1]
        bounds = np.append(np.flatnonzero(first), n)
        ua_out, ub_out = [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            d = hi - lo
            if d < 2 or d > max_item_degree:
                continue
            iu, ju = np.triu_indices(d, k=1)
            ua_out.append(uid[lo:hi][iu])
            ub_out.append(uid[lo:hi][ju])
        if not ua_out:
            return empty
        # local combine before the pair shuffle (segment reduction,
        # never a pandas multi-key groupby over millions of pairs)
        ua_all = np.concatenate(ua_out)
        ub_all = np.concatenate(ub_out)
        ua_u, ub_u, shared = _segment_sum(
            ua_all, ub_all, np.ones(len(ua_all), dtype=np.int64)
        )
        return pd.DataFrame(
            {
                "ua": ua_u,
                "ub": ub_u,
                "shared": shared,
                "pairpart": (ua_u * PRIME + ub_u) % P,
            }
        )

    def part_topk(g: pd.DataFrame) -> pd.DataFrame:
        ua_u, ub_u, shared = _segment_sum(
            g["ua"].to_numpy(), g["ub"].to_numpy(), g["shared"].to_numpy()
        )
        keep = shared >= min_shared
        ua_u, ub_u, shared = ua_u[keep], ub_u[keep], shared[keep]
        # top-k by (-shared, ua, ub): keys already (ua, ub)-ascending,
        # so a stable sort on -shared alone preserves the tiebreak
        top = np.argsort(-shared, kind="stable")[:k]
        return pd.DataFrame(
            {"ua": ua_u[top], "ub": ub_u[top], "shared": shared[top]}
        )

    # ---- guarded distinct-user probe: stream per-batch uniques, bail
    # to the sparse tier the moment the union exceeds the limit (the
    # driver never holds more than limit + one batch of ids)
    users = None
    acc = np.array([], dtype=np.int64)
    uds = _events(sf_dir, ["user_id"]).map_batches(
        lambda t: pa.table({"u": pc.unique(t["user_id"])}),
        batch_format="pyarrow",
    )
    for b in uds.iter_batches(batch_format="pyarrow"):
        acc = np.union1d(acc, b["u"].to_numpy(zero_copy_only=False))
        if len(acc) > dense_users_limit:
            break
    else:
        users = acc  # sorted ascending by construction

    ui = _events(sf_dir, ["user_id", "props"]).map_batches(
        distinct_pairs, batch_format="pyarrow"
    )

    if users is not None and len(users) > 0:
        U = len(users)
        uvec = users  # closure-captured (ray.put-sized: ≤ limit ids)

        def part_cooc(g: pd.DataFrame) -> pd.DataFrame:
            s = g.drop_duplicates(["user_id", "item"])
            icode, _ = pd.factorize(s["item"], sort=False)
            ucode = np.searchsorted(uvec, s["user_id"].to_numpy())
            deg = np.bincount(icode)
            ok = (deg >= 2) & (deg <= max_item_degree)
            keepm = ok[icode]
            icode, ucode = icode[keepm], ucode[keepm]
            C = np.zeros((U, U), dtype=np.int32)
            if len(icode):
                # compact item ids, then chunked A.T@A: ≤256 items per
                # chunk keeps every float32 dot product exact (< 2^24)
                icode = np.unique(icode, return_inverse=True)[1]
                n_items = int(icode.max()) + 1
                for lo in range(0, n_items, 256):
                    sel = (icode >= lo) & (icode < lo + 256)
                    if not sel.any():
                        continue
                    A = np.zeros((min(256, n_items - lo), U), np.float32)
                    A[icode[sel] - lo, ucode[sel]] = 1.0
                    C += np.rint(A.T @ A).astype(np.int32)
            return pd.DataFrame({"c": [C.ravel().tobytes()]})

        parts = (
            ui.groupby("part")
            .map_groups(part_cooc, batch_format="pandas")
            .take_all()
        )
        C = np.zeros(U * U, dtype=np.int64)
        for r in parts:
            C += np.frombuffer(r["c"], dtype=np.int32).astype(np.int64)
        C = C.reshape(U, U)
        iu, ju = np.nonzero(np.triu(C >= min_shared, 1))
        shared = C[iu, ju]
        order = np.lexsort((ju, iu, -shared))[:k]
        return pa.table(
            {
                "ua": pa.array(uvec[iu[order]], pa.int64()),
                "ub": pa.array(uvec[ju[order]], pa.int64()),
                "shared": pa.array(shared[order].astype(np.int64), pa.int64()),
            }
        )

    cands = (
        ui.groupby("part")
        .map_groups(part_pairs, batch_format="pandas")
        .groupby("pairpart")
        .map_groups(part_topk, batch_format="pandas")
        .take_all()
    )
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


def graph_triangles(sf_dir: str, deg_broadcast_limit: int = 4_000_000):
    """Exact triangle count of the co-purchase part graph (parts are
    adjacent iff some order contains both) — the standard clustering
    primitive, as a degree-oriented wedge-close plan (node-iterator
    with the out-degree bound of Chiba–Nishizeki orientation):

    1. per-batch distinct (order, part) combiner → ONE order-keyed
       shuffle; each order group emits its ``C(d,2)`` part pairs,
       packed ``a·2^32 + b`` (a < b) into one int64 — the pair stream
       is MATERIALIZED once and reused for degrees, orientation and
       the close (duplicate pair instances across orders are fine
       everywhere downstream: ``np.unique`` dedups neighbor lists,
       ``Max`` dedups edge existence, so no distinct-edge shuffle is
       ever paid);
    2. orientation degrees come from endpoint histograms of the pair
       stream (tiny node-keyed groupby of in-batch partials) —
       co-occurrence-weighted rather than distinct-neighbor degrees,
       which is still a deterministic TOTAL order on nodes (all
       correctness needs) and an equally good hub bound in practice;
       the node→degree map broadcasts (``ray.put`` once, read per
       task) under ``deg_broadcast_limit`` — above it the orientation
       falls back to node-id order, which changes only the wedge-
       enumeration COST, never the count;
    3. pairs orient low→high by (degree, id) — an acyclic total order,
       so every triangle has exactly ONE node with two out-edges and
       each wedge-close counts it exactly once; out-degree is bounded
       by O(√E), so per-group pair enumeration cannot blow up on hubs;
    4. per-src wedge pairs aggregate in-group and again per-batch
       (combiner), then the close is ONE shuffle on a P-ary HASH part
       of the pair key (a pair lives in exactly one part; never a
       groupby on the raw pair key, whose millions of distinct groups
       degenerate the aggregate) with a vectorized ``np.isin``
       edge-membership test per part, and a global sum emits the
       count — no driver-side edge set anywhere.
    """
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    SHIFT = np.int64(1) << np.int64(32)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def op_distinct(t: pa.Table) -> pa.Table:
        o = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if p.max(initial=0) >= int(SHIFT):
            raise ValueError("partkey exceeds 2^32 pair-encode width")
        u = np.unique(np.stack([o, p], axis=1), axis=0)
        return pa.table(
            {"o": pa.array(u[:, 0], pa.int64()), "p": pa.array(u[:, 1], pa.int64())}
        )

    P = 64  # hash-partition fanout for every keyed stage: P groups, never millions

    def add_opart(t: pa.Table) -> pa.Table:
        o = t["o"].to_numpy(zero_copy_only=False)
        return t.append_column("opart", pa.array(o % P, pa.int64()))

    def part_orders(g: pd.DataFrame) -> pd.DataFrame:
        # orders hash-partition on o % P (an order lives in exactly
        # one part — never a raw order-key groupby, which degenerates
        # at catalog order cardinality); per-order triu emission is
        # one segment pass. The pair MULTISET across orders is
        # preserved exactly (degrees-for-orientation semantics).
        s = g.drop_duplicates(["o", "p"]).sort_values(
            ["o", "p"], ignore_index=True
        )
        o = s["o"].to_numpy().astype(np.int64)
        p = s["p"].to_numpy().astype(np.int64)
        n = len(o)
        if n == 0:
            return pd.DataFrame({"e": pd.Series([], dtype=np.int64)})
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = o[1:] != o[:-1]
        bounds = np.append(np.flatnonzero(first), n)
        out = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            d = hi - lo
            if d < 2:
                continue
            iu, ju = np.triu_indices(d, k=1)
            out.append(p[lo:hi][iu] * SHIFT + p[lo:hi][ju])
        e = np.concatenate(out) if out else np.empty(0, np.int64)
        return pd.DataFrame({"e": e})

    pairs = (
        li.map_batches(op_distinct, batch_format="pyarrow")
        .map_batches(add_opart, batch_format="pyarrow")
        .groupby("opart")
        .map_groups(part_orders, batch_format="pandas")
        .materialize()  # reused: degrees, orientation, and the close
    )

    def deg_partial(t: pa.Table) -> pa.Table:
        e = t["e"].to_numpy(zero_copy_only=False)
        nodes = np.concatenate([e // int(SHIFT), e % int(SHIFT)])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table(
            {"part": pa.array(u % P, pa.int64()),
             "node": pa.array(u, pa.int64()),
             "cnt": pa.array(c.astype(np.int64), pa.int64())}
        )

    def deg_sum_part(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)[["cnt"]].sum()
        return out.rename(columns={"cnt": "deg"})

    degs = (
        pairs.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(deg_sum_part, batch_format="pandas")
        .materialize()  # node-sized; counted AND read without re-running
    )
    if degs.count() <= deg_broadcast_limit:
        deg_ref = ray.put({r["node"]: r["deg"] for r in degs.take_all()})
    else:
        deg_ref = None  # id-orientation: exact, just weaker hub bound

    def orient(t: pa.Table) -> pa.Table:
        e = t["e"].to_numpy(zero_copy_only=False)
        a, b = e // int(SHIFT), e % int(SHIFT)
        if deg_ref is not None:
            dm = ray.get(deg_ref)
            da = pd.Series(a).map(dm).to_numpy(np.int64)
            db = pd.Series(b).map(dm).to_numpy(np.int64)
            a_first = (da < db) | ((da == db) & (a < b))
        else:
            a_first = np.ones(len(a), bool)  # a < b by construction
        src = np.where(a_first, a, b)
        return pa.table(
            {
                "spart": pa.array(src % P, pa.int64()),
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(np.where(a_first, b, a), pa.int64()),
            }
        )

    def part_srcs(g: pd.DataFrame) -> pd.DataFrame:
        # sources hash-partition on src % P (a src's out-neighborhood
        # lives in one part); per-src wedge triu is a segment pass
        # with the same np.unique-dedup per source as before
        s = g.drop_duplicates(["src", "dst"]).sort_values(
            ["src", "dst"], ignore_index=True
        )
        src = s["src"].to_numpy().astype(np.int64)
        dst = s["dst"].to_numpy().astype(np.int64)
        n = len(src)
        if n == 0:
            return pd.DataFrame(
                {"e": pd.Series([], dtype=np.int64),
                 "w": pd.Series([], dtype=np.int64)}
            )
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = src[1:] != src[:-1]
        bounds = np.append(np.flatnonzero(first), n)
        out = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            d = hi - lo
            if d < 2:
                continue
            iu, ju = np.triu_indices(d, k=1)
            # wedge endpoints re-packed in ID order to match the edge key
            out.append(dst[lo:hi][iu] * SHIFT + dst[lo:hi][ju])
        e = np.concatenate(out) if out else np.empty(0, np.int64)
        return pd.DataFrame({"e": e, "w": np.ones(len(e), np.int64)})

    def wedge_part(t: pa.Table) -> pa.Table:
        # per-batch (e → Σw) combiner + hash part ahead of the close
        e = t["e"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(e, return_inverse=True)
        return pa.table(
            {
                "part": pa.array(u % P, pa.int64()),
                "e": pa.array(u, pa.int64()),
                "w": pa.array(np.bincount(inv, weights=w).astype(np.int64), pa.int64()),
                "ie": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            }
        )

    wedges = (
        pairs.map_batches(orient, batch_format="pyarrow")
        .groupby("spart")
        .map_groups(part_srcs, batch_format="pandas")
        .map_batches(wedge_part, batch_format="pyarrow")
    )

    def tag_edge(t: pa.Table) -> pa.Table:
        u = np.unique(t["e"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "part": pa.array(u % P, pa.int64()),
                "e": pa.array(u, pa.int64()),
                "w": pa.array(np.zeros(len(u), np.int64), pa.int64()),
                "ie": pa.array(np.ones(len(u), np.int64), pa.int64()),
            }
        )

    # close: ONE shuffle on a P-ary hash part (a pair key lives in
    # exactly one part), vectorized np.isin edge-membership per part —
    # NOT a groupby on the pair key itself, whose millions of distinct
    # groups would degenerate the aggregate
    def close_part(g: pd.DataFrame) -> pd.DataFrame:
        ie = g["ie"].to_numpy() == 1
        hit = np.isin(g["e"].to_numpy()[~ie], g["e"].to_numpy()[ie])
        return pd.DataFrame(
            {"tri": [int(g["w"].to_numpy()[~ie][hit].sum())]}
        )

    total = (
        pairs.map_batches(tag_edge, batch_format="pyarrow")
        .union(wedges)
        .groupby("part")
        .map_groups(close_part, batch_format="pandas")
        .aggregate(Sum("tri", alias_name="n_triangles"))
    )
    return pa.table(
        {"n_triangles": pa.array([int(total["n_triangles"])], pa.int64())}
    )


GRAPH_TRIANGLES_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e AS (
  SELECT DISTINCT a.p AS a, b.p AS b
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.b
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
"""


def graph_clustering_coeff(sf_dir: str, deg_broadcast_limit: int = 4_000_000):
    """Per-node local clustering coefficient of the co-purchase part
    graph: ``coeff(v) = 2·tri(v) / (deg(v)·(deg(v)−1))`` with TRUE
    distinct-neighbor degrees. Same wedge-close engine as
    :func:`graph_triangles`, with three differences forced by the
    per-node output:

    - the DISTINCT edge set is materialized once (a P-ary hash-part
      shuffle with an ``np.unique`` dedup per part — never a groupby
      on the raw pair key), because coefficients need exact degrees,
      not the co-occurrence-weighted orientation proxy;
    - wedge rows carry their apex ``src`` so each closed wedge can
      credit ALL THREE corners (apex from the row, the other two
      unpacked from the pair key) — node-count histograms per batch,
      part-keyed sum;
    - degrees and triangle counts meet in one node-keyed part shuffle
      (union of tagged partials), where the coefficient is computed
      vectorized; isolated-ish nodes (deg < 2) emit coeff 0.

    Coefficients round to 8 dp (measured cross-engine float noise is
    zero here — the ratio is of small exact integers — but rounding
    pins the schema against future float churn)."""
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    SHIFT = np.int64(1) << np.int64(32)
    P = 64

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def op_distinct(t: pa.Table) -> pa.Table:
        o = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if p.max(initial=0) >= int(SHIFT):
            raise ValueError("partkey exceeds 2^32 pair-encode width")
        u = np.unique(np.stack([o, p], axis=1), axis=0)
        return pa.table(
            {"o": pa.array(u[:, 0], pa.int64()), "p": pa.array(u[:, 1], pa.int64())}
        )

    def add_opart(t: pa.Table) -> pa.Table:
        o = t["o"].to_numpy(zero_copy_only=False)
        return t.append_column("opart", pa.array(o % P, pa.int64()))

    def part_orders(g: pd.DataFrame) -> pd.DataFrame:
        # orders hash-partition on o % P — never a raw order-key
        # groupby (catalog order cardinality degenerates it); one
        # segment pass emits each order's triu pairs, pre-deduped
        # within the part ahead of the global dedup shuffle
        s = g.drop_duplicates(["o", "p"]).sort_values(
            ["o", "p"], ignore_index=True
        )
        o = s["o"].to_numpy().astype(np.int64)
        p = s["p"].to_numpy().astype(np.int64)
        n = len(o)
        if n == 0:
            return pd.DataFrame({"e": pd.Series([], dtype=np.int64)})
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = o[1:] != o[:-1]
        bounds = np.append(np.flatnonzero(first), n)
        out = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            d = hi - lo
            if d < 2:
                continue
            iu, ju = np.triu_indices(d, k=1)
            out.append(p[lo:hi][iu] * SHIFT + p[lo:hi][ju])
        e = np.concatenate(out) if out else np.empty(0, np.int64)
        return pd.DataFrame({"e": np.unique(e)})

    def pair_part(t: pa.Table) -> pa.Table:
        u = np.unique(t["e"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"part": pa.array(u % P, pa.int64()), "e": pa.array(u, pa.int64())}
        )

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"e": np.unique(g["e"].to_numpy())})

    edges = (
        li.map_batches(op_distinct, batch_format="pyarrow")
        .map_batches(add_opart, batch_format="pyarrow")
        .groupby("opart")
        .map_groups(part_orders, batch_format="pandas")
        .map_batches(pair_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pandas")
        .materialize()  # the DISTINCT edge set, reused three times
    )

    def deg_partial(t: pa.Table) -> pa.Table:
        e = t["e"].to_numpy(zero_copy_only=False)
        nodes = np.concatenate([e // int(SHIFT), e % int(SHIFT)])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "part": pa.array(u % P, pa.int64()),
                "node": pa.array(u, pa.int64()),
                "deg": pa.array(c.astype(np.int64), pa.int64()),
                "tri": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            }
        )

    deg_partials = edges.map_batches(deg_partial, batch_format="pyarrow")

    def sum_node(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)[["deg", "tri"]].sum()
        return out

    degs = (
        deg_partials.groupby("part").map_groups(sum_node, batch_format="pandas")
        .materialize()
    )
    if degs.count() <= deg_broadcast_limit:
        deg_ref = ray.put(
            dict(zip(degs.to_pandas()["node"], degs.to_pandas()["deg"]))
        )
    else:
        deg_ref = None  # id-orientation: exact, just weaker hub bound

    def orient(t: pa.Table) -> pa.Table:
        e = t["e"].to_numpy(zero_copy_only=False)
        a, b = e // int(SHIFT), e % int(SHIFT)
        if deg_ref is not None:
            dm = ray.get(deg_ref)
            da = pd.Series(a).map(dm).to_numpy(np.int64)
            db = pd.Series(b).map(dm).to_numpy(np.int64)
            a_first = (da < db) | ((da == db) & (a < b))
        else:
            a_first = np.ones(len(a), bool)
        src = np.where(a_first, a, b)
        return pa.table(
            {
                "spart": pa.array(src % P, pa.int64()),
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(np.where(a_first, b, a), pa.int64()),
            }
        )

    def part_srcs(g: pd.DataFrame) -> pd.DataFrame:
        # sources hash-partition on src % P; per-src wedge triu is a
        # segment pass (edges are already distinct, so no in-segment
        # dedup needed beyond the sort)
        s = g.sort_values(["src", "dst"], ignore_index=True)
        src = s["src"].to_numpy().astype(np.int64)
        dst = s["dst"].to_numpy().astype(np.int64)
        n = len(src)
        empty = pd.DataFrame(
            {"e": pd.Series([], dtype=np.int64),
             "src": pd.Series([], dtype=np.int64)}
        )
        if n == 0:
            return empty
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = src[1:] != src[:-1]
        bounds = np.append(np.flatnonzero(first), n)
        e_out, s_out = [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            d = hi - lo
            if d < 2:
                continue
            iu, ju = np.triu_indices(d, k=1)
            e_out.append(dst[lo:hi][iu] * SHIFT + dst[lo:hi][ju])
            s_out.append(np.full(len(iu), src[lo], np.int64))
        if not e_out:
            return empty
        return pd.DataFrame(
            {"e": np.concatenate(e_out), "src": np.concatenate(s_out)}
        )

    def wedge_part(t: pa.Table) -> pa.Table:
        e = t["e"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array(e % P, pa.int64()),
                "e": pa.array(e, pa.int64()),
                "src": t["src"],
                "ie": pa.array(np.zeros(len(e), np.int64), pa.int64()),
            }
        )

    def tag_edge(t: pa.Table) -> pa.Table:
        e = t["e"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": pa.array(e % P, pa.int64()),
                "e": pa.array(e, pa.int64()),
                "src": pa.array(np.zeros(len(e), np.int64), pa.int64()),
                "ie": pa.array(np.ones(len(e), np.int64), pa.int64()),
            }
        )

    wedges = (
        edges.map_batches(orient, batch_format="pyarrow")
        .groupby("spart")
        .map_groups(part_srcs, batch_format="pandas")
        .map_batches(wedge_part, batch_format="pyarrow")
    )

    def close_part(g: pd.DataFrame) -> pd.DataFrame:
        ie = g["ie"].to_numpy() == 1
        we = g["e"].to_numpy()[~ie]
        hit = np.isin(we, g["e"].to_numpy()[ie])
        apex = g["src"].to_numpy()[~ie][hit]
        closed = we[hit]
        corners = np.concatenate(
            [apex, closed // int(SHIFT), closed % int(SHIFT)]
        )
        u, c = np.unique(corners, return_counts=True)
        return pd.DataFrame(
            {
                "part": u % P,
                "node": u,
                "deg": np.zeros(len(u), np.int64),
                "tri": c.astype(np.int64),
            }
        )

    tri_partials = (
        edges.map_batches(tag_edge, batch_format="pyarrow")
        .union(wedges)
        .groupby("part")
        .map_groups(close_part, batch_format="pandas")
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)[["deg", "tri"]].sum()
        d = out["deg"].to_numpy(np.float64)
        t = out["tri"].to_numpy(np.float64)
        denom = d * (d - 1.0)
        coeff = np.where(denom > 0, 2.0 * t / np.maximum(denom, 1.0), 0.0)
        return pd.DataFrame(
            {
                "node": out["node"],
                "degree": out["deg"],
                "n_tri": out["tri"],
                "coeff": np.round(coeff, 8),
            }
        )

    # deg partials re-derive their part key on the way into the merge
    return (
        deg_partials.union(
            tri_partials.map_batches(
                lambda t: t.select(["part", "node", "deg", "tri"]),
                batch_format="pyarrow",
            )
        )
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )


GRAPH_CLUSTERING_COEFF_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e AS (
  SELECT DISTINCT a.p AS a, b.p AS b
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
), deg AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT a AS n FROM e UNION ALL SELECT b FROM e
  ) GROUP BY n
), tri AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
    SELECT e1.a AS n FROM e e1
      JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    UNION ALL
    SELECT e1.b FROM e e1
      JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    UNION ALL
    SELECT e2.b FROM e e1
      JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
  ) GROUP BY n
)
SELECT deg.n AS node, deg.degree, COALESCE(tri.n_tri, 0) AS n_tri,
       ROUND(CASE WHEN deg.degree >= 2
                  THEN 2.0 * COALESCE(tri.n_tri, 0)
                       / (deg.degree * (deg.degree - 1))
                  ELSE 0.0 END, 8) AS coeff
FROM deg LEFT JOIN tri ON tri.n = deg.n
"""


def graph_kcore(sf_dir: str, k: int | None = None):
    """k-core of the co-purchase part graph via the distributed
    peeling engine (:func:`gliner_ray.functions.graph.kcore`) —
    → (node, deg) survivors with their in-core degrees. ``k``
    defaults to max(2, ⌈0.7 · mean degree⌉) — measured just under this
    graph family's degeneracy (68 @ sf0.001, 82 @ sf0.01 vs means
    89/116), so the peel does real cascade rounds AND keeps a
    non-trivial core at any scale factor (deterministic: derived from
    the distinct edge/node counts of the same data). Rows-only driver
    entry; exact parity vs a sequential reference peeler is pinned in
    tests/test_graph.py."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ..functions.graph import kcore

    SHIFT = np.int64(1) << np.int64(32)
    P = 64

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def op_distinct(t: pa.Table) -> pa.Table:
        o = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.unique(np.stack([o, p], axis=1), axis=0)
        return pa.table(
            {"o": pa.array(u[:, 0], pa.int64()), "p": pa.array(u[:, 1], pa.int64())}
        )

    def add_opart(t: pa.Table) -> pa.Table:
        o = t["o"].to_numpy(zero_copy_only=False)
        return t.append_column("opart", pa.array(o % P, pa.int64()))

    def part_orders(g: pd.DataFrame) -> pd.DataFrame:
        # orders hash-partition on o % P (an order lives in one part —
        # never a raw order-key groupby, which degenerates at catalog
        # order cardinality); per-order triu pair emission is one
        # segment pass over the part
        s = g.drop_duplicates(["o", "p"]).sort_values(
            ["o", "p"], ignore_index=True
        )
        o = s["o"].to_numpy().astype(np.int64)
        p = s["p"].to_numpy().astype(np.int64)
        n = len(o)
        if n == 0:
            return pd.DataFrame({"e": pd.Series([], dtype=np.int64)})
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = o[1:] != o[:-1]
        bounds = np.append(np.flatnonzero(first), n)
        out = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            d = hi - lo
            if d < 2:
                continue
            iu, ju = np.triu_indices(d, k=1)
            out.append(p[lo:hi][iu] * SHIFT + p[lo:hi][ju])
        e = np.concatenate(out) if out else np.empty(0, np.int64)
        return pd.DataFrame({"e": np.unique(e)})

    def pair_part(t: pa.Table) -> pa.Table:
        u = np.unique(t["e"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"part": pa.array(u % P, pa.int64()), "e": pa.array(u, pa.int64())}
        )

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        e = np.unique(g["e"].to_numpy())
        return pd.DataFrame({"a": e // int(SHIFT), "b": e % int(SHIFT)})

    edges = (
        li.map_batches(op_distinct, batch_format="pyarrow")
        .map_batches(add_opart, batch_format="pyarrow")
        .groupby("opart")
        .map_groups(part_orders, batch_format="pandas")
        .map_batches(pair_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pandas")
        .materialize()
    )

    if k is None:
        n_edges = edges.count()

        def nodes_partial(t: pa.Table) -> pa.Table:
            u = np.unique(
                np.concatenate(
                    [
                        t["a"].to_numpy(zero_copy_only=False),
                        t["b"].to_numpy(zero_copy_only=False),
                    ]
                )
            )
            return pa.table(
                {"part": pa.array(u % P, pa.int64()),
                 "node": pa.array(u, pa.int64())}
            )

        def count_part(g: pd.DataFrame) -> pd.DataFrame:
            # distinct-node count partial per part — never a raw
            # node-key groupby just to count distincts
            return pd.DataFrame(
                {"n": [np.int64(len(np.unique(g["node"].to_numpy())))]}
            )

        n_nodes = int(
            edges.map_batches(nodes_partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(count_part, batch_format="pandas")
            .sum("n") or 0
        )
        k = max(2, int(np.ceil(0.7 * 2.0 * n_edges / max(n_nodes, 1))))

    return kcore(edges, k)
