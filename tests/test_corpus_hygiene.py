"""Corpus-hygiene operators: PII redaction, repetition stats,
benchmark decontamination, sequence packing."""

from __future__ import annotations

import pyarrow as pa
import pytest

from gliner_ray.functions import decontam as fdec
from gliner_ray.functions import packing as fpack
from gliner_ray.functions.text import pii_redact_batch, repetition_stats_batch


def _tbl(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


class TestPiiRedact:
    def test_planted_pii(self):
        out = pii_redact_batch(
            _tbl(["contact bob.smith+x@corp.example.COM now",
                  "server 192.168.0.255 and 8.8.8.8 up",
                  "account 9876543210123 flagged",
                  "clean text with no pii at all"])
        ).to_pylist()
        assert out[0]["redacted"] == "contact <EMAIL> now"
        assert out[0]["n_emails"] == 1
        assert out[1]["redacted"] == "server <IP> and <IP> up"
        assert out[1]["n_ips"] == 2
        assert out[2]["redacted"] == "account <ID> flagged"
        assert out[2]["n_ids"] == 1
        assert out[3]["redacted"] == "clean text with no pii at all"
        assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_ids"]) == (0, 0, 0)

    def test_digit_run_inside_email_counted_once(self):
        # the 9-digit run sits inside the email local part; sequential
        # redaction consumes it as <EMAIL>, so n_ids must be 0
        out = pii_redact_batch(_tbl(["x.123456789@y.org"])).to_pylist()[0]
        assert out["redacted"] == "<EMAIL>"
        assert out["n_emails"] == 1 and out["n_ids"] == 0

    def test_ip_not_matched_inside_longer_dotted_run(self):
        out = pii_redact_batch(_tbl(["ver 1.2.3.4 ok"])).to_pylist()[0]
        assert out["redacted"] == "ver <IP> ok"


class TestRepetitionStats:
    def test_counts(self):
        out = repetition_stats_batch(
            _tbl(["a b a b c", "x x x", "unique words only here", ""])
        ).to_pylist()
        r0 = out[0]
        assert (r0["n_words"], r0["n_dup_words"]) == (5, 2)
        # 2-grams: (a b)(b a)(a b)(b c) → 4 total, 1 dup
        assert (r0["n_2grams"], r0["n_dup_2grams"]) == (4, 1)
        r1 = out[1]
        assert (r1["n_words"], r1["n_dup_words"]) == (3, 2)
        assert (r1["n_2grams"], r1["n_dup_2grams"]) == (2, 1)
        assert out[2]["n_dup_words"] == 0 and out[2]["n_dup_2grams"] == 0
        assert out[3]["n_words"] == 0 and out[3]["n_2grams"] == 0

    def test_case_insensitive(self):
        out = repetition_stats_batch(_tbl(["Foo foo FOO"])).to_pylist()[0]
        assert out["n_dup_words"] == 2


class TestDecontam:
    def _docs(self, ray_session):
        import ray.data as rd

        bench_text = "alpha beta gamma delta epsilon zeta eta theta iota"
        clean = "one two three four five six seven eight nine ten"
        # doc 2 shares the first 8-gram of the benchmark doc
        partial = "ALPHA beta gamma delta epsilon zeta eta theta different"
        docs = rd.from_arrow(_tbl([bench_text, clean, partial], ids=[0, 1, 2]))
        bench = rd.from_arrow(_tbl([bench_text], ids=[0]))
        return docs, bench

    def test_planted_contamination(self, ray_session):
        docs, bench = self._docs(ray_session)
        out = {
            r["doc_id"]: r
            for r in fdec.ngram_contamination(docs, bench, n=8).take_all()
        }
        assert out[0]["contaminated"] == 1 and out[0]["n_hits"] == 2
        assert out[1]["contaminated"] == 0 and out[1]["n_hits"] == 0
        assert out[2]["contaminated"] == 1
        assert out[2]["n_hits"] == 1 and out[2]["n_distinct_hits"] == 1

    def test_gram_set_guard_raises(self, ray_session):
        docs, bench = self._docs(ray_session)
        with pytest.raises(ValueError, match="broadcast-small"):
            fdec.ngram_contamination(docs, bench, n=8, max_bench_grams=1).count()


class TestPacking:
    def _docs(self, n=60, seed=3):
        import numpy as np

        rng = np.random.default_rng(seed)
        texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, n)]
        return _tbl(texts, ids=list(range(n)))

    def test_invariants(self, ray_session):
        import ray.data as rd

        budget = 64
        docs = rd.from_arrow(self._docs())
        out = fpack.pack_sequences(docs, budget=budget, num_partitions=4).to_pandas()
        assert len(out) == 60 and out["doc_id"].is_unique
        fills = out[out["oversize"] == 0].groupby("seq_id")["n_tokens"].sum()
        assert (fills <= budget).all()
        # oversize docs sit alone in their sequence
        for sid in out.loc[out["oversize"] == 1, "seq_id"]:
            assert (out["seq_id"] == sid).sum() == 1

    def test_oversize_doc_flagged(self, ray_session):
        import ray.data as rd

        docs = rd.from_arrow(_tbl([" ".join(["w"] * 100), "w w"], ids=[0, 1]))
        out = fpack.pack_sequences(docs, budget=10, num_partitions=1).to_pandas()
        big = out[out["doc_id"] == 0].iloc[0]
        assert big["oversize"] == 1

    def test_deterministic_across_block_layouts(self, ray_session):
        import ray.data as rd

        docs = rd.from_arrow(self._docs())
        a = (
            fpack.pack_sequences(docs, budget=64, num_partitions=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            fpack.pack_sequences(docs.repartition(7), budget=64, num_partitions=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert a.equals(b)

    def test_precomputed_token_column(self, ray_session):
        import ray.data as rd

        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "toks": pa.array([5, 6], pa.int64())})
        out = fpack.pack_sequences(
            rd.from_arrow(t), budget=10, tokens_col="toks", num_partitions=1
        ).to_pandas()
        assert sorted(out["n_tokens"]) == [5, 6]
        assert out["seq_id"].nunique() == 2  # 5+6 > 10 → two sequences
