"""Tests for token-mode decoding, char→word alignment, and the
pipeline-builder extension surface."""

import numpy as np
import pyarrow as pa
import pytest

from gliner_ray.kernels.align import align_reference, align_with_offsets
from gliner_ray.kernels.token_decode import decode_token_logits


def _grid(L, C, fill=-10.0):
    return np.full((L, C, 3), fill)


class TestTokenDecoder:
    # mirrors decoder.py:130-170 (start/end pairing, inside gate, min score)

    def test_basic_span(self):
        g = _grid(5, 1)
        g[1, 0, 0] = 3.0  # start at 1
        g[3, 0, 1] = 2.0  # end at 3
        g[1:4, 0, 2] = 4.0  # inside 1..3
        out = decode_token_logits(5, {1: "x"}, g)
        assert len(out) == 1
        s, e, label, score = out[0]
        assert (s, e, label) == (1, 3, "x")
        # span score = min(inside, start, end) = sigmoid(2.0)
        assert score == pytest.approx(1 / (1 + np.exp(-2.0)))

    def test_inside_gate_blocks(self):
        g = _grid(5, 1)
        g[1, 0, 0] = 3.0
        g[3, 0, 1] = 3.0
        g[1, 0, 2] = 3.0
        g[2, 0, 2] = -3.0  # inside dips below threshold → span rejected
        g[3, 0, 2] = 3.0
        assert decode_token_logits(5, {1: "x"}, g) == []

    def test_class_mismatch_no_pair(self):
        g = _grid(4, 2)
        g[0, 0, 0] = 3.0  # start class 0
        g[2, 1, 1] = 3.0  # end class 1 → never paired
        g[:, :, 2] = 3.0
        assert decode_token_logits(4, {1: "a", 2: "b"}, g) == []

    def test_end_before_start_skipped(self):
        g = _grid(4, 1)
        g[2, 0, 0] = 3.0
        g[0, 0, 1] = 3.0
        g[:, :, 2] = 3.0
        assert decode_token_logits(4, {1: "a"}, g) == []

    def test_nms_applied(self):
        g = _grid(6, 1)
        g[:, :, 2] = 5.0
        g[0, 0, 0] = 5.0
        g[1, 0, 0] = 2.0
        g[2, 0, 1] = 5.0
        g[3, 0, 1] = 2.0
        # candidates: (0,2),(0,3),(1,2),(1,3); flat NMS keeps highest first
        out = decode_token_logits(6, {1: "a"}, g, flat_ner=True)
        assert len(out) == 1
        assert out[0][:2] == (0, 2)


class TestAlign:
    def test_reference_semantics(self):
        # exact evaluate.py:30-61 behavior on space-separated text
        out = align_reference(
            "the HttpClient boots",
            [{"pos": [4, 14], "type": "Class"}],
        )
        assert out["tokenized_text"] == ["the", "HttpClient", "boots"]
        assert out["ner"] == [(1, 1, "class")]

    def test_reference_misaligned_gives_none(self):
        out = align_reference("abc def", [{"pos": [1, 3], "type": "X"}])
        assert out["ner"] == [(None, 0, "x")]  # faithful to the quirk

    def test_offsets_alignment(self):
        text = "call parse_config(x) now"
        out = align_with_offsets(text, [(5, 17, "FUNCTION")])
        i, j, label = out["ner"][0]
        assert out["tokenized_text"][i : j + 1] == ["parse_config"]
        assert label == "function"

    def test_offsets_partial_token_covered(self):
        text = "abcdef ghi"
        out = align_with_offsets(text, [(2, 5, "t")])  # mid-token span
        assert out["ner"] == [(0, 0, "t")]  # maps to the covering token


class TestPipelineBuilder:
    def test_function_and_registry_stages(self):
        import ray.data as rd

        from gliner_ray.functions.text import text_stats_batch, token_count_batch
        from gliner_ray.pipelines.builder import PipelineBuilder, register_stage

        register_stage("token_count", token_count_batch)
        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["a b c", "d"], pa.string())})
        )
        pipe = PipelineBuilder().stage("token_count").build()
        out = pipe(docs).to_pandas().sort_values("doc_id")
        assert list(out["n_tokens"]) == [3, 1]
        assert pipe.stage_names == ["token_count"]

    def test_class_stage_gets_actor_opts(self):
        import ray.data as rd

        from gliner_ray.config import DEFAULT_CONFIG
        from gliner_ray.pipelines.builder import PipelineBuilder
        from gliner_ray.pipelines.multitask import ClassificationPipeline

        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["hello world"], pa.string())})
        )
        pipe = (
            PipelineBuilder()
            .stage("clf", ClassificationPipeline, classes=["x", "y"],
                   cfg=DEFAULT_CONFIG, concurrency=2)
            .build()
        )
        out = pipe(docs).to_pandas()
        assert out.iloc[0]["predicted_class"] in {"x", "y"}

    def test_unknown_stage_raises(self):
        from gliner_ray.pipelines.builder import PipelineBuilder

        with pytest.raises(KeyError):
            PipelineBuilder().stage("definitely-not-registered")


# ---------------------------------------- round-4: editdist / chunks / tri


class TestEditDist1:
    def test_within_edit1_cases(self):
        from gliner_ray.functions.dedup import _within_edit1

        assert _within_edit1("abc", "abc")          # distance 0
        assert _within_edit1("abc", "abd")          # substitution
        assert _within_edit1("abc", "abxc")         # insertion
        assert _within_edit1("abc", "ab")           # deletion
        assert _within_edit1("", "a")
        assert not _within_edit1("abc", "axd")      # two substitutions
        assert not _within_edit1("abc", "abcde")    # gap 2
        assert not _within_edit1("abc", "xabcy")

    def test_planted_pairs_match_bruteforce(self, ray_session):
        import itertools

        import duckdb
        import ray.data as rd

        from gliner_ray.functions.dedup import editdist1_pairs

        vals = [
            "kitten", "sitten", "mitten", "kitte", "kittenx",
            "banana", "bananna", "apple", "appl", "zzz",
            "kitten",  # duplicate value must not duplicate pairs
        ]
        ds = rd.from_items([{"key": v} for v in vals])
        got = editdist1_pairs(ds, "key").to_pandas()
        got_pairs = set(zip(got["ka"], got["kb"]))

        con = duckdb.connect()
        uniq = sorted(set(vals))
        want = {
            (a, b)
            for a, b in itertools.combinations(uniq, 2)
            if con.sql(f"SELECT levenshtein('{a}','{b}')").fetchall()[0][0] <= 1
        }
        assert got_pairs == want and len(want) >= 4


class TestChunkWindows:
    def test_empty_and_short_docs(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from gliner_ray.queries.corpus_ops import doc_chunk_windows

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(["", "short", "x" * 300], pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        df = doc_chunk_windows(str(tmp_path)).to_pandas()
        by_doc = df.groupby("doc_id").size().to_dict()
        assert 1 not in by_doc          # empty text → no chunks
        assert by_doc[2] == 1           # one ragged chunk
        assert by_doc[3] == 3           # 300 chars / stride 120 → 3
        row = df[(df["doc_id"] == 3) & (df["chunk_idx"] == 2)].iloc[0]
        assert row["chunk_start"] == 240 and len(row["chunk"]) == 60


class TestTriangles:
    def test_planted_triangles(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from gliner_ray.queries.graph_ops import graph_triangles

        # order 1 = clique {1,2,3}; order 2 adds edge {3,4}; order 3
        # closes {2,3,4} via edge {2,4} → 2 triangles total
        rows = [
            (1, 1), (1, 2), (1, 3),
            (2, 3), (2, 4),
            (3, 2), (3, 4),
        ]
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                    "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                }
            ),
            str(tmp_path / "lineitem.parquet"),
        )
        out = graph_triangles(str(tmp_path))
        assert out["n_triangles"][0].as_py() == 2

    def test_id_orientation_fallback_parity(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from gliner_ray.queries.graph_ops import graph_triangles

        rng = np.random.default_rng(7)
        ok = rng.integers(1, 60, 400)
        pk = rng.integers(1, 25, 400)
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array(ok, pa.int64()),
                    "l_partkey": pa.array(pk, pa.int64()),
                }
            ),
            str(tmp_path / "lineitem.parquet"),
        )
        a = graph_triangles(str(tmp_path))["n_triangles"][0].as_py()
        b = graph_triangles(str(tmp_path), deg_broadcast_limit=0)[
            "n_triangles"
        ][0].as_py()
        assert a == b and a > 0

    def test_clustering_coeff_planted(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from gliner_ray.queries.graph_ops import graph_clustering_coeff

        # triangle {1,2,3} + pendant 4 on node 3: coeff(1)=coeff(2)=1,
        # coeff(3)=2*1/(3*2)=1/3, coeff(4)=0 (degree 1)
        rows = [(1, 1), (1, 2), (1, 3), (2, 3), (2, 4)]
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                    "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                }
            ),
            str(tmp_path / "lineitem.parquet"),
        )
        df = graph_clustering_coeff(str(tmp_path)).to_pandas()
        got = dict(zip(df["node"], df["coeff"]))
        assert got[1] == 1.0 and got[2] == 1.0
        assert got[3] == round(1 / 3, 8) and got[4] == 0.0
        degs = dict(zip(df["node"], df["degree"]))
        assert degs == {1: 2, 2: 2, 3: 3, 4: 1}


class TestFkOrphans:
    """Referential-integrity audit: planted orphans detected on BOTH
    the broadcast path and the past-guard co-shuffle fallback."""

    def _write(self, tmp_path):
        import pyarrow.parquet as pq

        # customer keys 1..10; orders reference 1..10 plus orphans
        # 99 (x2) and 100 (x1) -> 3 orphan rows of 13
        pq.write_table(
            pa.table({"c_custkey": pa.array(range(1, 11), pa.int64())}),
            str(tmp_path / "customer.parquet"),
        )
        keys = list(range(1, 11)) + [99, 99, 100]
        pq.write_table(
            pa.table({"o_custkey": pa.array(keys, pa.int64())}),
            str(tmp_path / "orders.parquet"),
        )

    @pytest.mark.parametrize("limit", [10_000, 0])
    def test_planted_orphans_both_paths(self, ray_session, tmp_path, limit):
        from gliner_ray.queries.relational import _orphan_counts, _read

        self._write(tmp_path)
        fact_rows, orphans = _orphan_counts(
            _read(str(tmp_path), "orders", ["o_custkey"]),
            "o_custkey",
            _read(str(tmp_path), "customer", ["c_custkey"]),
            "c_custkey",
            dim_broadcast_limit=limit,
        )
        assert (fact_rows, orphans) == (13, 3)

    @pytest.mark.parametrize("limit", [10_000, 0])
    def test_null_keys_match_sql_not_in(self, ray_session, tmp_path, limit):
        """NULL fact keys count into fact_rows but are never orphans;
        NULL dim keys are ignored — exactly DuckDB's NOT IN semantics
        (round-4 ADVICE: the old astype(int64) of a NULL was undefined).
        Both the broadcast and the co-shuffle path must agree."""
        import duckdb
        import pyarrow.parquet as pq

        from gliner_ray.queries.relational import _orphan_counts, _read

        fact = pa.table(
            {"o_custkey": pa.array([1, 2, None, 99, None, 3], pa.int64())}
        )
        dim = pa.table({"c_custkey": pa.array([1, 2, 3, None], pa.int64())})
        pq.write_table(fact, str(tmp_path / "orders.parquet"))
        pq.write_table(dim, str(tmp_path / "customer.parquet"))

        got = _orphan_counts(
            _read(str(tmp_path), "orders", ["o_custkey"]),
            "o_custkey",
            _read(str(tmp_path), "customer", ["c_custkey"]),
            "c_custkey",
            dim_broadcast_limit=limit,
        )
        c = duckdb.connect()
        want = c.sql(
            f"""SELECT (SELECT COUNT(*) FROM '{tmp_path}/orders.parquet'),
                  (SELECT COUNT(*) FROM '{tmp_path}/orders.parquet'
                    WHERE o_custkey IS NOT NULL AND o_custkey NOT IN
                      (SELECT c_custkey FROM '{tmp_path}/customer.parquet'
                        WHERE c_custkey IS NOT NULL))"""
        ).fetchone()
        assert got == tuple(int(x) for x in want) == (6, 1)


class TestVocabBuild:
    def test_ids_dense_and_ordered(self, ray_session):
        import ray.data as rd

        from gliner_ray.functions.text import vocab_build

        # cf ties broken by term asc; cutoff drops the hapax
        docs = [
            "beta beta alpha zulu",
            "beta alpha zulu",
            "zulu once",
        ]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                }
            )
        )
        df = vocab_build(ds, min_count=2).to_pandas()
        got = df.sort_values("vocab_id")[
            ["term", "vocab_id", "cf", "df"]
        ].values.tolist()
        # beta cf=3; alpha cf=2 df=2; zulu cf=3 df=3; once cf=1 cut
        assert got == [
            ["beta", 1, 3, 2],
            ["zulu", 2, 3, 3],
            ["alpha", 3, 2, 2],
        ]


class TestIncrementalDedup:
    def test_planted_overlap_and_inshard_dups(self, ray_session):
        import ray.data as rd

        from gliner_ray.functions.dedup import incremental_dedup

        snapshot = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(["aaa", "bbb", "ccc"], pa.string()),
                }
            )
        )
        # 10: dup of snapshot "aaa" -> dropped; 11/13: in-shard dup
        # "new1" -> min id 11 kept; 12: fresh -> kept
        new = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([13, 10, 11, 12], pa.int64()),
                    "text": pa.array(
                        ["new1", "aaa", "new1", "new2"], pa.string()
                    ),
                }
            )
        )
        got = sorted(
            incremental_dedup(new, snapshot).to_pandas()["doc_id"].tolist()
        )
        assert got == [11, 12]

    def test_empty_new_shard(self, ray_session):
        import ray.data as rd

        from gliner_ray.functions.dedup import incremental_dedup

        snapshot = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1], pa.int64()),
                    "text": pa.array(["aaa"], pa.string()),
                }
            )
        )
        new = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                }
            )
        )
        assert incremental_dedup(new, snapshot).count() == 0


class TestNewOpEmptyEdges:
    def test_vocab_build_nothing_meets_cutoff(self, ray_session):
        import ray.data as rd

        from gliner_ray.functions.text import vocab_build

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["solo words here", "all unique"], pa.string()),
                }
            )
        )
        out = vocab_build(ds, min_count=5)
        # NB: Dataset.to_pandas() drops columns on 0-row datasets (Ray
        # quirk) — the schema is the API-level guarantee
        assert out.schema().names == ["term", "vocab_id", "cf", "df"]
        assert out.count() == 0

    def test_orphans_empty_fact(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from gliner_ray.queries.relational import _orphan_counts, _read

        pq.write_table(
            pa.table({"c_custkey": pa.array([1, 2], pa.int64())}),
            str(tmp_path / "customer.parquet"),
        )
        pq.write_table(
            pa.table({"o_custkey": pa.array([], pa.int64())}),
            str(tmp_path / "orders.parquet"),
        )
        assert _orphan_counts(
            _read(str(tmp_path), "orders", ["o_custkey"]),
            "o_custkey",
            _read(str(tmp_path), "customer", ["c_custkey"]),
            "c_custkey",
        ) == (0, 0)


class TestNewOpRandomizedParity:
    """Randomized-corpus parity for the late round-4 ops: heavy dup /
    skewed-term corpora vs sequential reference semantics."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_vocab_build_random_corpus(self, ray_session, seed):
        import ray.data as rd

        from gliner_ray.functions.text import _TERM_RE, vocab_build

        rng = np.random.default_rng(seed)
        words = ["alpha", "beta", "gamma", "delta", "zz", "qq", "xray"]
        docs = [
            " ".join(rng.choice(words, size=rng.integers(1, 30)))
            for _ in range(rng.integers(5, 40))
        ]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                }
            )
        )
        got = (
            vocab_build(ds, min_count=3)
            .to_pandas()
            .sort_values("vocab_id", ignore_index=True)
        )
        # sequential reference
        from collections import Counter

        cf, df = Counter(), Counter()
        for d in docs:
            toks = [w.lower() for w in _TERM_RE.findall(d)]
            cf.update(toks)
            df.update(set(toks))
        ref = sorted(
            ((t, cf[t], df[t]) for t in cf if cf[t] >= 3),
            key=lambda x: (-x[1], x[0]),
        )
        assert [
            (r.term, r.cf, r.df, r.vocab_id) for r in got.itertuples()
        ] == [(t, c, n, i + 1) for i, (t, c, n) in enumerate(ref)]

    @pytest.mark.parametrize("seed", [0, 1])
    def test_incremental_dedup_random(self, ray_session, seed):
        import ray.data as rd

        from gliner_ray.functions.dedup import incremental_dedup

        rng = np.random.default_rng(100 + seed)
        pool = [f"text-{i}" for i in range(12)]
        snap_texts = list(rng.choice(pool, size=8))
        new_texts = list(rng.choice(pool, size=20))
        snap = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(snap_texts)), pa.int64()),
                    "text": pa.array(snap_texts, pa.string()),
                }
            )
        )
        new = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(
                        range(100, 100 + len(new_texts)), pa.int64()
                    ),
                    "text": pa.array(new_texts, pa.string()),
                }
            )
        )
        got = sorted(
            incremental_dedup(new, snap).to_pandas()["doc_id"].tolist()
        )
        seen = set(snap_texts)
        ref = {}
        for i, t in enumerate(new_texts):
            if t not in seen and t not in ref:
                ref[t] = 100 + i
        assert got == sorted(ref.values())
