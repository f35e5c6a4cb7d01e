"""Graph analytics: connected components (both paths), PageRank
(distributed == sequential oracle), degree query wiring."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from gliner_ray.functions import graph as fg


def _edges_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], pa.string()),
                "dst": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


PLANTED = [
    ("a", "b"), ("b", "c"), ("c", "a"),      # triangle → comp a
    ("d", "e"),                              # pair → comp d
    ("f", "f"),                              # self-loop singleton → comp f
    ("m", "n"), ("n", "o"), ("o", "p"), ("p", "q"),  # chain → comp m
]
EXPECTED_COMP = {
    "a": "a", "b": "a", "c": "a",
    "d": "d", "e": "d",
    "f": "f",
    "m": "m", "n": "m", "o": "m", "p": "m", "q": "m",
}


class TestConnectedComponents:
    def test_driver_path_planted(self, ray_session):
        out = fg.connected_components(_edges_ds(PLANTED)).to_pandas()
        got = dict(zip(out["node"], out["component"]))
        assert got == EXPECTED_COMP

    def test_distributed_path_parity(self, ray_session):
        ds = _edges_ds(PLANTED)
        a = (
            fg.connected_components(ds)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        b = (
            fg.connected_components(ds, force_distributed=True)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert a.equals(b)

    def test_guard_forces_distributed(self, ray_session):
        # broadcast_limit=0 → the distributed path runs (and matches)
        out = fg.connected_components(
            _edges_ds(PLANTED), broadcast_limit=0
        ).to_pandas()
        assert dict(zip(out["node"], out["component"])) == EXPECTED_COMP

    def test_empty_edges(self, ray_session):
        out = fg.connected_components(_edges_ds([])).to_pandas()
        assert len(out) == 0

    def test_null_endpoints_dropped(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array(["a", None, "b"], pa.string()),
                    "dst": pa.array(["b", "x", None], pa.string()),
                }
            )
        )
        out = fg.connected_components(ds).to_pandas()
        assert set(out["node"]) == {"a", "b"}


class TestPagerank:
    def test_matches_sequential_oracle(self, ray_session):
        ranks = fg.pagerank(_edges_ds(PLANTED), n_parts=3, n_iter=50).to_pandas()
        oracle = fg.pagerank_sequential(PLANTED, n_iter=50)
        assert set(ranks["node"]) == set(oracle)
        got = dict(zip(ranks["node"], ranks["rank"]))
        for node, want in oracle.items():
            assert np.isclose(got[node], want, rtol=1e-8), node
        assert np.isclose(sum(got.values()), 1.0)

    def test_duplicate_edges_count_once(self, ray_session):
        dup = PLANTED + PLANTED[:3]
        ranks = fg.pagerank(_edges_ds(dup), n_parts=2, n_iter=50).to_pandas()
        oracle = fg.pagerank_sequential(PLANTED, n_iter=50)
        got = dict(zip(ranks["node"], ranks["rank"]))
        for node, want in oracle.items():
            assert np.isclose(got[node], want, rtol=1e-8), node

    def test_dangling_mass_redistributed(self, ray_session):
        # b has no outgoing edge: without dangling redistribution the
        # total rank would leak below 1
        edges = [("a", "b"), ("c", "b")]
        ranks = fg.pagerank(_edges_ds(edges), n_parts=2, n_iter=60).to_pandas()
        assert np.isclose(ranks["rank"].sum(), 1.0)
        oracle = fg.pagerank_sequential(edges, n_iter=60)
        got = dict(zip(ranks["node"], ranks["rank"]))
        for node, want in oracle.items():
            assert np.isclose(got[node], want, rtol=1e-8), node

    def test_empty(self, ray_session):
        assert fg.pagerank(_edges_ds([]), n_parts=2).count() == 0

    def test_nparts_equal_to_cluster_cpus_no_deadlock(self, ray_session):
        # regression: 4 one-CPU shard actors on the 4-CPU test cluster
        # starved the ingest Dataset task forever; the adaptive
        # per-actor CPU request must leave task headroom
        ranks = fg.pagerank(_edges_ds(PLANTED), n_parts=4, n_iter=50).to_pandas()
        oracle = fg.pagerank_sequential(PLANTED, n_iter=50)
        got = dict(zip(ranks["node"], ranks["rank"]))
        for node, want in oracle.items():
            assert np.isclose(got[node], want, rtol=1e-8), node


class TestHashJoinStringKeys:
    def test_string_key_join(self, ray_session):
        import ray.data as rd

        from gliner_ray.functions.joins import hash_join

        left = rd.from_arrow(
            pa.table({"k": pa.array(["x", "y", "z"], pa.string()),
                      "lv": pa.array([1, 2, 3], pa.int64())})
        )
        right = rd.from_arrow(
            pa.table({"rk": pa.array(["y", "z", "w"], pa.string()),
                      "rv": pa.array([20, 30, 40], pa.int64())})
        )
        out = (
            hash_join(left, right, left_on="k", right_on="rk", num_partitions=4)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert list(out["k"]) == ["y", "z"]
        assert list(out["lv"]) == [2, 3]
        assert list(out["rv"]) == [20, 30]


def _peel_sequential(edges, k):
    """Reference k-core peeler: repeated min-degree removal."""
    edges = {tuple(sorted(e)) for e in edges}
    while True:
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        rm = {n for n, d in deg.items() if d < k}
        if not rm:
            return deg
        edges = {e for e in edges if e[0] not in rm and e[1] not in rm}


class TestKCore:
    def _run(self, edges, k, **kw):
        import ray.data as rd

        from gliner_ray.functions.graph import kcore

        ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
        df = kcore(ds, k, **kw).to_pandas()
        if df.empty:  # Ray drops column names on fully-empty datasets
            return {}
        return dict(zip(df["node"], df["deg"]))

    def test_planted_core(self, ray_session):
        # clique {1,2,3,4} (3-core) + tail 4-5-6 that peels away at k=2
        edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                 (4, 5), (5, 6)]
        want = _peel_sequential(edges, 3)
        got = self._run(edges, 3)
        assert got == want == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_random_graph_matches_sequential(self, ray_session):
        rng = np.random.default_rng(11)
        edges = {
            tuple(sorted((int(a), int(b))))
            for a, b in rng.integers(0, 40, (300, 2))
            if a != b
        }
        for k in (2, 3, 5):
            assert self._run(sorted(edges), k) == _peel_sequential(edges, k)

    def test_distributed_anti_filter_parity(self, ray_session):
        rng = np.random.default_rng(13)
        edges = {
            tuple(sorted((int(a), int(b))))
            for a, b in rng.integers(0, 30, (150, 2))
            if a != b
        }
        want = _peel_sequential(edges, 3)
        got = self._run(sorted(edges), 3, removal_broadcast_limit=0)
        assert got == want

    def test_empty_core(self, ray_session):
        edges = [(1, 2), (2, 3)]  # a path has no 2-core
        assert self._run(edges, 2) == {}

    def test_copurchase_kcore_matches_sequential(self, ray_session):
        import duckdb

        from gliner_ray.queries.graph_ops import graph_kcore

        con = duckdb.connect()
        rows = con.sql("""
          WITH op AS (SELECT DISTINCT l_orderkey o, l_partkey p
                      FROM '/root/testdata/sf0.001/lineitem.parquet')
          SELECT DISTINCT a.p, b.p FROM op a
          JOIN op b ON a.o = b.o AND a.p < b.p""").fetchall()
        edges = {tuple(r) for r in rows}
        nodes = {n for e in edges for n in e}
        k = max(2, int(np.ceil(0.7 * 2.0 * len(edges) / len(nodes))))
        want = _peel_sequential(edges, k)
        df = graph_kcore("/root/testdata/sf0.001").to_pandas()
        got = dict(zip(df["node"], df["deg"])) if not df.empty else {}
        assert got == want and len(got) > 0

    def test_copurchase_kcore_matches_unrolled_sql_oracle(self, ray_session):
        """The driver-facing DuckDB twin (GRAPH_KCORE_SQL, unrolled
        peel with the k rule inlined) must equal the engine exactly —
        node set AND in-core degrees."""
        import duckdb

        from gliner_ray.queries.graph_ops import GRAPH_KCORE_SQL, graph_kcore

        sf = "/root/testdata/sf0.01"
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
        )
        odf = con.sql(GRAPH_KCORE_SQL).df()
        want = dict(zip(odf["node"], odf["deg"]))
        df = graph_kcore(sf).to_pandas()
        got = dict(zip(df["node"], df["deg"])) if not df.empty else {}
        assert got == want and len(got) > 0


class TestMegaOrderSkew:
    def test_one_giant_order_exact(self, ray_session, tmp_path):
        """Skew pin for the round-5 part-keyed edge builders: ONE order
        holding 300 distinct parts (C(300,2) = 44,850 pairs in a single
        segment) among many small orders — the per-part segment pass
        must emit the exact triangle count and k-core a sequential
        DuckDB twin computes."""
        import duckdb
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gliner_ray.queries import graph_ops as go

        rng = np.random.default_rng(3)
        o = [1] * 300 + list(rng.integers(2, 200, 1200))
        p = list(np.arange(300)) + list(rng.integers(0, 80, 1200))
        t = pa.table(
            {"l_orderkey": pa.array(o, pa.int64()),
             "l_partkey": pa.array(p, pa.int64())}
        )
        pq.write_table(t, str(tmp_path / "lineitem.parquet"))

        c = duckdb.connect()
        c.sql(
            f"CREATE VIEW lineitem AS SELECT * FROM '{tmp_path}/lineitem.parquet'"
        )
        import __ray_entry__ as E

        got = go.graph_triangles(str(tmp_path)).to_pylist()[0]["n_triangles"]
        want = c.sql(E.oracle_sql()["graph_triangles"]).fetchone()[0]
        assert got == want > 0

        a = go.graph_kcore(str(tmp_path))
        a = a.to_pandas() if hasattr(a, "to_pandas") else a
        b = c.sql(E.oracle_sql()["graph_kcore"]).df()
        import pandas as pd
        a2 = a[sorted(a.columns)].sort_values(sorted(a.columns)).reset_index(drop=True)
        b2 = b[sorted(b.columns)].sort_values(sorted(b.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a2, b2, check_dtype=False)


class TestCfPairsTiers:
    """graph_cf_pairs' dense (guarded U×U matmul partials) and sparse
    (pair-emission + lexsort segment reduction) tiers must agree with
    each other and with the DuckDB twin — including when the degree
    cap actually excludes a stop item."""

    def test_dense_sparse_parity_vs_oracle(self, ray_session):
        import duckdb

        import __ray_entry__ as E
        from gliner_ray.queries import graph_ops as go

        sf = "/root/testdata/sf0.001"
        dense = go.graph_cf_pairs(sf).to_pydict()
        sparse = go.graph_cf_pairs(sf, dense_users_limit=1).to_pydict()
        c = duckdb.connect()
        c.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        want = c.sql(E.oracle_sql()["graph_cf_pairs"]).fetch_arrow_table()
        assert dense == want.to_pydict()
        assert sparse == want.to_pydict()

    def test_degree_cap_excludes_stop_item_both_tiers(
        self, ray_session, tmp_path
    ):
        import json as _json

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gliner_ray.queries import graph_ops as go

        # item 0: 30 users (capped out at max_item_degree=20);
        # item 1: users 0..4 (5 shared); item 2: users 0..2 (3 shared)
        users, items = [], []
        users += list(range(30)); items += [0] * 30
        users += list(range(5)); items += [1] * 5
        users += list(range(3)); items += [2] * 3
        t = pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "props": pa.array(
                    [_json.dumps({"k": i}) for i in items], pa.string()
                ),
            }
        )
        pq.write_table(t, str(tmp_path / "events.parquet"))

        for limit in (4096, 1):  # dense tier, then forced sparse
            got = go.graph_cf_pairs(
                str(tmp_path), min_shared=2, k=50,
                max_item_degree=20, dense_users_limit=limit,
            ).to_pylist()
            # without item 0, shared counts come only from items 1+2:
            # pairs within users 0..2 share 2 items, pairs 0..4 (with
            # at least one of 3..4) share 1 (< min_shared)
            want = [
                {"ua": a, "ub": b, "shared": 2}
                for a in range(3) for b in range(a + 1, 3)
            ]
            assert sorted(
                got, key=lambda r: (r["ua"], r["ub"])
            ) == want, (limit, got)
