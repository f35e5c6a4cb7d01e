"""Driver-style oracle parity: every queries() entry with an
oracle_sql() twin must match DuckDB exactly (schema + rows + values)
at sf0.001. Mirrors the driver's CORRECTNESS gate locally."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_NAMES = sorted(E.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(name, con):
    res = E.queries()[name](SF)
    rdf = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    odf = con.sql(E.oracle_sql()[name]).df()
    a, b = _norm(rdf), _norm(odf)
    assert list(a.columns) == list(b.columns), f"schema mismatch: {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"row count {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_rows_only_queries_run():
    # every non-oracle query must at least execute and return rows schema
    qs = E.queries()
    for name in set(qs) - set(E.oracle_sql()):
        if name.startswith("kg_"):
            continue  # exercised (with an exact oracle) in test_pipeline.py
        res = qs[name](SF)
        df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        assert df is not None and len(df.columns) > 0, name


class TestExactQuantilesEdgeCases:
    """_exact_int_quantiles edge cases the sf-oracle rows can't hit:
    negative domains, all-equal heavy duplicates, and n=1."""

    def _q(self, values, quantiles):
        import pyarrow as pa
        import ray.data as rd

        from gliner_ray.queries.relational import _exact_int_quantiles

        ds = rd.from_arrow(pa.table({"cents": pa.array(values, pa.int64())}))
        return _exact_int_quantiles(ds, quantiles)

    @staticmethod
    def _disc(values, q):
        # quantile_disc: element at 0-based index ceil(q*n) - 1
        import numpy as np

        s = sorted(values)
        return s[max(int(np.ceil(q * len(s))), 1) - 1]

    def test_negative_and_mixed(self, ray_session):
        vals = [-500, -3, 0, 7, 7, 12, 99_999, -500]
        got = self._q(vals, (0.25, 0.5, 0.9))
        assert got == [self._disc(vals, q) for q in (0.25, 0.5, 0.9)]

    def test_all_equal(self, ray_session):
        assert self._q([42] * 1000, (0.1, 0.99)) == [42, 42]

    def test_single_element(self, ray_session):
        assert self._q([-7], (0.5,)) == [-7]

    def test_empty(self, ray_session):
        assert self._q([], (0.5,)) is None


@pytest.mark.parametrize(
    "name", ["q3_top_orders", "q5_region_revenue", "q_segment_revenue",
             "q_top_orders_per_segment", "q_rich_idle_customers_by_nation",
             "q_nation_revenue_share"]
)
def test_dim_join_fallback_matches_broadcast(name, con):
    """dim_broadcast_limit=0 forces the guarded shuffle-join path for
    the customer/supplier dimensions — results must equal the oracle
    exactly, same as the broadcast path (round-1 watch item)."""
    from gliner_ray.queries import relational as rel

    fn = getattr(rel, name)
    res = fn(SF, dim_broadcast_limit=0)
    rdf = res.to_pandas()
    odf = con.sql(E.oracle_sql()[name]).df()
    a, b = _norm(rdf), _norm(odf)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_q3_mixed_guard_path_matches_oracle(con):
    """q3's TWO-LEVEL broadcast guard, intermediate case: the customer
    key set fits under the guard but the qualifying orderkey set does
    not — customers broadcast-filter orders, lineitem goes through the
    hash join. A limit of 500 sits between the ~300 BUILDING customers
    and the ~thousands of qualifying orders at sf0.01."""
    from gliner_ray.queries import relational as rel

    n_cust = con.sql(
        "SELECT count(*) FROM customer WHERE c_mktsegment='BUILDING'"
    ).fetchone()[0]
    limit = n_cust + 200
    rdf = rel.q3_top_orders(SF, dim_broadcast_limit=limit).to_pandas()
    odf = con.sql(E.oracle_sql()["q3_top_orders"]).df()
    a, b = _norm(rdf), _norm(odf)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_quantile_sketch_dkw_accuracy(con):
    """The one-pass sample-sketch estimates must sit within the DKW
    rank band of the exact engine: for k=4096 the true rank of each
    estimate must be within 5% of its target quantile."""
    import numpy as np

    from gliner_ray.queries import relational as rel

    est = rel.q_price_quantile_sketch(SF)
    exact_vals = np.sort(
        con.sql(
            "SELECT CAST(FLOOR(l_extendedprice * 100) AS BIGINT) c FROM lineitem"
        ).df()["c"].to_numpy()
    )
    n = len(exact_vals)
    for p, v in zip(est["p_x100"], est["cents_est"]):
        true_rank = np.searchsorted(exact_vals, v, side="right") / n
        assert abs(true_rank - p / 100.0) <= 0.05, (p, v, true_rank)


def test_approx_users_hll_tolerance(con):
    """q_approx_users_hll now ALSO has an exact SQL twin (the sketch
    is deterministic, so APPROX_USERS_HLL_SQL replays the identical
    splitmix64 + register math); this test is the independent
    STATISTICAL pin that the sketch's answer is a valid approximation
    of the true cardinality: every per-group HLL estimate must sit
    within 3σ = 3·1.04/√2^p of DuckDB's exact COUNT(DISTINCT)."""
    from gliner_ray.queries import relational as rel

    est = rel.q_approx_users_hll(SF).to_pandas()
    exact = con.sql(
        "SELECT event_type, COUNT(DISTINCT user_id) n FROM events GROUP BY event_type"
    ).df().set_index("event_type")["n"]
    sigma = 1.04 / (2 ** 12) ** 0.5  # p=12 in the query
    assert len(est) == len(exact)
    for _, r in est.iterrows():
        n = exact[r["event_type"]]
        assert abs(r["approx_distinct"] - n) / n <= 3 * sigma, (
            r["event_type"], r["approx_distinct"], n,
        )


def test_hours_intersect_cross_block(tmp_path, ray_session):
    """Regression (round-3 ADVICE): an hour whose 'purchase' and
    'error' events never co-occur in one block must still count as an
    intersection hour. The old packed-bitmask-under-Max merge lost the
    bit (Max(1,2)=2 != OR(1,2)=3); per-type 0/1 presence columns under
    Max are correct."""
    import pandas as pd

    from gliner_ray.queries import relational as rel

    d = tmp_path / "events.parquet"
    d.mkdir()
    hr = 3_600
    # hour 1000: purchase in block 0, error in block 1 (never co-batched)
    # hour 2000: purchase only
    pd.DataFrame(
        {"ts": pd.to_datetime([1000 * hr, 2000 * hr], unit="s"),
         "event_type": ["purchase", "purchase"]}
    ).to_parquet(d / "part0.parquet")
    pd.DataFrame(
        {"ts": pd.to_datetime([1000 * hr], unit="s"),
         "event_type": ["error"]}
    ).to_parquet(d / "part1.parquet")

    inter = sorted(rel.q_hours_intersect(str(tmp_path)).to_pandas()["hr"])
    exc = sorted(rel.q_hours_except(str(tmp_path)).to_pandas()["hr"])
    assert inter == [1000]
    assert exc == [2000]


def test_above_cust_avg_distributed_path_matches(con):
    """dim_broadcast_limit=0 forces the hash-join decorrelation path —
    must equal the oracle exactly, same as the broadcast path."""
    from gliner_ray.queries import relational as rel

    res = rel.q_orders_above_cust_avg(SF, dim_broadcast_limit=0)
    rdf = res.to_pandas()
    odf = con.sql(E.oracle_sql()["q_orders_above_cust_avg"]).df()
    a, b = _norm(rdf), _norm(odf)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_flag_price_corr_large_magnitude_stable(tmp_path, ray_session):
    """ADVICE-low regression: the naive n·Sxy − Sx·Sy moment formula
    cancels catastrophically when |mean| >> std. With prices shifted
    to ~1e9 the pivoted implementation must still match numpy's
    stable corrcoef to 5 dp (shift-invariance of CORR)."""
    import numpy as np

    from gliner_ray.queries import relational as rel

    rng = np.random.RandomState(11)
    n = 20_000
    q = rng.randint(1, 50, size=n).astype(np.float64)
    price = 1e9 + q * 3.0 + rng.normal(0, 5.0, size=n)  # corr ~ strong
    flags = np.array(["A", "N", "R"])[rng.randint(0, 3, size=n)]
    pd.DataFrame(
        {"l_returnflag": flags, "l_extendedprice": price, "l_quantity": q}
    ).to_parquet(tmp_path / "lineitem.parquet")

    out = rel.q_flag_price_corr(str(tmp_path)).to_pandas()
    got = dict(zip(out["l_returnflag"], out["corr_pq"]))
    for f in "ANR":
        m = flags == f
        want = round(float(np.corrcoef(price[m], q[m])[0, 1]), 5)
        assert got[f] == pytest.approx(want, abs=2e-5), (f, got[f], want)


class TestCurationPipeline:
    """Planted-duplicate coverage for doc_curation: the sf tables have
    no duplicate texts, so the dedup stage of the composition is a
    pass-through there. Plant en/high-quality duplicates assigned to
    ids on both sides of the md5 sample cut and check (a) exact oracle
    parity on the planted table and (b) the min-id owner carries the
    group's quality score."""

    GOOD = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps in the warm sun while the fox runs back to the forest "
        "and the birds sing in the trees as the day goes on and the "
        "river flows past the old stone bridge where the children play "
    ) * 2

    @staticmethod
    def _sampled(i: int) -> bool:
        import hashlib

        return hashlib.md5(f"cur:{i}".encode()).hexdigest()[0] < "4"

    def test_planted_dups_oracle_parity(self, tmp_path, ray_session):
        import hashlib  # noqa: F401

        from gliner_ray.queries import corpus_ops as co

        ids_in = [i for i in range(1, 200) if self._sampled(i)]
        ids_out = [i for i in range(1, 200) if not self._sampled(i)]
        # dup group: two sampled-in ids + one sampled-out id; plus a
        # distinct sampled-in doc and a Spanish doc that must be cut
        rows = [
            (ids_in[0], self.GOOD),
            (ids_in[1], self.GOOD),
            (ids_out[0], self.GOOD),
            (ids_in[2], self.GOOD + "and the night falls over the quiet town "),
            (ids_in[3], "el rio pasa por el puente de la ciudad y los ninos "
                        "juegan en la plaza mientras el sol brilla sobre las "
                        "casas y las calles de la ciudad vieja junto al mar " * 2),
        ]
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            tmp_path / "documents.parquet"
        )

        out = co.doc_curation(str(tmp_path)).to_pandas()
        c = duckdb.connect()
        c.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
        )
        odf = c.sql(co.CURATION_SQL).df()
        a, b = _norm(out), _norm(odf)
        assert list(a.columns) == list(b.columns)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

        # the dup group survives exactly once, owned by the min
        # sampled-in id (the sampled-out dup never reaches dedup)
        kept = set(out["doc_id"])
        assert min(ids_in[0], ids_in[1]) in kept
        assert max(ids_in[0], ids_in[1]) not in kept
        assert ids_out[0] not in kept
        assert ids_in[2] in kept          # distinct doc kept
        assert ids_in[3] not in kept      # Spanish doc filtered


def test_dense_rank_tiny_bins_matches_oracle(con):
    """n_bins=4 forces multi-value bins and straddle-free value
    partitioning — the distinct-count offsets must still compose into
    the exact global DENSE_RANK."""
    from gliner_ray.queries import relational as rel

    res = rel.q_order_dense_rank(SF, n_bins=4).to_pandas()
    odf = con.sql(__import__("__ray_entry__").oracle_sql()["q_order_dense_rank"]).df()
    a = _norm(res)
    b = _norm(odf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestUserCardinalityStress:
    """Round-4 verdict item #1: the re-keyed ``user_id % P`` windowed
    ops must stay exact AND bounded at >= 1M DISTINCT users — the
    cardinality where a raw ``groupby(user_id).map_groups`` degenerates
    (the graph_triangles 38 s -> 1 s lesson). Oracle = the SAME
    ``oracle_sql()`` twins run by DuckDB over the synthetic table."""

    N_USERS = 1_000_000

    @pytest.fixture(scope="class")
    def big_events_dir(self, tmp_path_factory, ray_session):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("events_1m")
        rng = np.random.default_rng(7)
        # 1-3 events per user => ~2M rows, every user distinct.
        reps = rng.integers(1, 4, self.N_USERS)
        uid = np.repeat(np.arange(self.N_USERS, dtype=np.int64), reps)
        n = len(uid)
        base = np.datetime64("2024-01-01T00:00:00", "us")
        ts = base + rng.integers(0, 86_400_000_000 * 3, n).astype("timedelta64[us]")
        types = np.array(["view", "click", "purchase"])
        t = pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(ts),
                "user_id": pa.array(uid),
                "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
                "event_type": pa.array(types[rng.integers(0, 3, n)]),
            }
        )
        pq.write_table(t, d / "events.parquet")
        return str(d)

    @pytest.mark.parametrize("name", ["q_user_value_ema", "q_user_sessions"])
    def test_exact_and_bounded_at_1m_users(self, name, big_events_dir):
        import time

        import duckdb

        t0 = time.perf_counter()
        res = E.queries()[name](big_events_dir).to_pandas()
        wall = time.perf_counter() - t0

        c = duckdb.connect()
        c.sql(
            f"CREATE VIEW events AS SELECT * FROM '{big_events_dir}/events.parquet'"
        )
        odf = c.sql(E.oracle_sql()[name]).df()
        a, b = _norm(res), _norm(odf)
        assert len(a) == self.N_USERS == len(b)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        # headroom evidence: bounded even at 4 test CPUs (the pre-fix
        # raw groupby path took minutes at this cardinality)
        assert wall < 120, f"{name} took {wall:.1f}s at 1M distinct users"

    def test_event_transitions_exact_and_bounded_at_1m_users(
        self, big_events_dir
    ):
        """Same cardinality bar for the re-keyed bigram op (round-5):
        1M users through ONE ``user_id % P`` shuffle + vectorized
        boundary-masked pairs — never a per-user Python call."""
        import time

        import duckdb

        t0 = time.perf_counter()
        res = E.queries()["q_event_transitions"](big_events_dir).to_pandas()
        wall = time.perf_counter() - t0

        c = duckdb.connect()
        c.sql(
            f"CREATE VIEW events AS SELECT * FROM '{big_events_dir}/events.parquet'"
        )
        odf = c.sql(E.oracle_sql()["q_event_transitions"]).df()
        a, b = _norm(res), _norm(odf)
        assert len(a) == len(b) <= 9  # |types|² bound
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert wall < 120, f"took {wall:.1f}s at 1M distinct users"

    def test_weekly_active_users_exact_and_bounded_at_1m_users(
        self, big_events_dir
    ):
        """Sliding-window COUNT(DISTINCT) at 1M distinct users (the
        round-5 WAU op): both distincts happen inside the bounded
        ``user_id % P`` parts, the ×7 window expansion is per-part
        vectorized, and only win_day-cardinality partials shuffle."""
        import time

        import duckdb

        t0 = time.perf_counter()
        res = E.queries()["q_weekly_active_users"](big_events_dir).to_pandas()
        wall = time.perf_counter() - t0

        c = duckdb.connect()
        c.sql(
            f"CREATE VIEW events AS SELECT * FROM '{big_events_dir}/events.parquet'"
        )
        odf = c.sql(E.oracle_sql()["q_weekly_active_users"]).df()
        a, b = _norm(res), _norm(odf)
        assert len(a) == len(b) <= 3 + 6  # 3 data days + 6 trailing windows
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert wall < 120, f"took {wall:.1f}s at 1M distinct users"
