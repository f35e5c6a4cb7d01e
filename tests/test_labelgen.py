"""Decoder-mode label generation (``stages/labelgen.py``): the
reference's trie-constrained span labeling control flow —
``update_id_to_classes`` (decoding/decoder.py:17-29), the constrained
generation loop (modeling/decoder.py:90-180), and the span↔gen-label
alignment of ``SpanDecoder.decode`` (decoder.py:84-129)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gliner_ray.kernels.numpy_model import NumpySpanModel
from gliner_ray.stages.labelgen import (
    GenLabelExtractor,
    NumpyLabelDecoder,
    decode_with_gen_labels,
    select_span_embeddings,
    update_id_to_classes,
)

LABELS = ["person", "organization", "location"]


class TestUpdateIdToClasses:
    def test_prompt_mode_cursor_walk(self):
        """Per-example slices of gen_labels, cursor advancing by each
        example's label count (reference decoder.py:20-28)."""
        id_to_classes = [{1: "a", 2: "b"}, {1: "c"}]
        gen = ["genA", "genB", "genC"]
        out = update_id_to_classes(id_to_classes, gen, batch_size=2)
        assert out == [{1: "genA", 2: "genB"}, {1: "genC"}]

    def test_shared_dict_broadcasts(self):
        out = update_id_to_classes({1: "x", 2: "y"}, ["g1", "g2", "g3", "g4"], 2)
        assert out == [{1: "g1", 2: "g2"}, {1: "g3", 2: "g4"}]

    def test_span_mode_passthrough(self):
        src = [{1: "a"}]
        assert update_id_to_classes(src, ["g"], 1, decoder_mode="span") is src
        assert update_id_to_classes(src, ["g"], 1, has_decoder=False) is src


class TestConstrainedGeneration:
    def _decoder(self):
        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=5)
        return NumpyLabelDecoder(LABELS, m)

    def test_generated_sequences_are_trie_terminal(self):
        dec = self._decoder()
        rng = np.random.RandomState(0)
        embeds = rng.randn(20, 32)
        for seq in dec.generate(embeds):
            assert tuple(seq) in dec.seq_to_label  # complete label path

    def test_generate_labels_in_label_set_and_deterministic(self):
        dec = self._decoder()
        rng = np.random.RandomState(1)
        embeds = rng.randn(10, 32)
        labs1 = dec.generate_labels(embeds)
        labs2 = dec.generate_labels(embeds)
        assert labs1 == labs2
        assert all(l in LABELS for l in labs1)

    def test_dead_end_emits_eos(self):
        """A trie with one one-token label: after that token the trie is
        a dead end → allowed=[eos] → generation stops (decoder.py:131-136)."""
        m = NumpySpanModel(["person"], hidden_size=32, max_width=4, seed=5)
        dec = NumpyLabelDecoder(["person"], m, max_new_tokens=50)
        seqs = dec.generate(np.random.RandomState(2).randn(5, 32))
        want = dec.label_seqs["person"]
        for s in seqs:
            assert tuple(s) == want  # never longer than the only path


class TestAlignment:
    def test_gen_labels_align_to_sel_idx_row_major(self):
        """Spans get their gen label by flat_idx = s*K + k, labels are
        consumed in sel_idx row-major order with a per-example cursor."""
        B, L, K, C = 2, 3, 2, 1
        logits = np.full((B, L, K, C), -10.0)
        # ex0: spans (0,0) flat 0 and (1,1) flat 3; ex1: span (2,0) flat 4
        logits[0, 0, 0, 0] = 10.0
        logits[0, 1, 1, 0] = 10.0
        logits[1, 2, 0, 0] = 10.0
        sel_idx = np.array([[0, 3], [4, -1]])
        gen = ["g0", "g1", "g2"]
        tokens = [["a", "b", "c"], ["d", "e", "f"]]
        spans = decode_with_gen_labels(
            tokens, {1: "ent"}, logits, sel_idx=sel_idx, gen_labels=gen
        )
        assert [(s, e, g) for s, e, t, g, p in spans[0]] == [
            (0, 0, ["g0"]), (1, 2, ["g1"]),
        ]
        assert [(s, e, g) for s, e, t, g, p in spans[1]] == [(2, 2, ["g2"])]

    def test_num_gen_sequences_grouping(self):
        B, L, K, C = 1, 2, 2, 1
        logits = np.full((B, L, K, C), -10.0)
        logits[0, 0, 0, 0] = 10.0
        logits[0, 1, 0, 0] = 10.0
        sel_idx = np.array([[0, 2]])
        gen = ["s0a", "s0b", "s1a", "s1b"]  # 2 sequences per span
        spans = decode_with_gen_labels(
            [["x", "y"]], {1: "ent"}, logits,
            sel_idx=sel_idx, gen_labels=gen, num_gen_sequences=2,
        )
        gens = {(s, e): g for s, e, t, g, p in spans[0]}
        assert gens[(0, 0)] == ["s0a", "s0b"]
        assert gens[(1, 1)] == ["s1a", "s1b"]

    def test_span_not_in_map_gets_none_and_no_gen_mode(self):
        B, L, K, C = 1, 2, 1, 1
        logits = np.full((B, L, K, C), 10.0)
        # only flat 0 was selected/generated; flat 1 decodes with None
        spans = decode_with_gen_labels(
            [["x", "y"]], {1: "ent"}, logits,
            sel_idx=np.array([[0]]), gen_labels=["g"], multi_label=False,
        )
        by_flat = {s: g for s, e, t, g, p in spans[0]}
        assert by_flat.get(0) == ["g"] or by_flat.get(1) is None
        # no generation at all → gen slot always None
        spans2 = decode_with_gen_labels([["x", "y"]], {1: "ent"}, logits)
        assert all(g is None for _, _, _, g, _ in spans2[0])


class TestSelection:
    def test_select_span_embeddings_contract(self):
        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=5)
        toks = [["alpha", "beta", "gamma"], ["delta"]]
        logits, tl = m.forward(toks)
        flat, sel_idx = select_span_embeddings(
            logits, m.last_span_rep, tl, m.max_width, threshold=0.0
        )
        # threshold 0 keeps every VALID span: sum over examples of
        # n_valid = sum_k (len - k floors)
        def n_valid(n):
            return sum(max(0, n - k) for k in range(m.max_width))

        total = n_valid(3) + n_valid(1)
        assert flat.shape == (total, 32)
        assert (sel_idx[1] != -1).sum() == n_valid(1)
        # padded tail is -1
        assert sel_idx[1, (sel_idx[1] != -1).sum():].tolist() == [-1] * (
            sel_idx.shape[1] - n_valid(1)
        )


class TestExtractorStage:
    def test_batch_stage_runs_and_is_deterministic(self):
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    ["the quick brown fox jumps", "over a lazy dog"], pa.string()
                ),
            }
        )
        ex1 = GenLabelExtractor(LABELS, hidden_size=32, max_width=4, threshold=0.5)
        ex2 = GenLabelExtractor(LABELS, hidden_size=32, max_width=4, threshold=0.5)
        t1, t2 = ex1(batch), ex2(batch)
        assert t1.equals(t2)
        gl = [g for g in t1["gen_label"].to_pylist() if g is not None]
        assert all(g in LABELS for g in gl)


class TestGenMentionExtractor:
    """kg_mentions_gen e2e: decoder-mode mentions mirror GLiNER.run's
    decoder mode (model.py:405-413) with the prompt-mode mentions
    schema + gen_label."""

    def test_parity_vs_prompt_mode_and_label_set(self, ray_session):
        """On a planted corpus the decoder-mode span SET (s, e, label,
        score) must equal prompt-mode decode with the same model and
        threshold — generation adds gen_label, it must not change span
        selection. Every gen_label is a member of the allowed set (the
        trie admits nothing else)."""
        import pyarrow as pa
        import ray.data as rd

        from gliner_ray.kernels.decode import decode_logits
        from gliner_ray.stages.labelgen import GenMentionExtractor

        labels = ["person", "organization", "location"]
        texts = [
            "Ada Lovelace joined Acme Corp in London last spring",
            "short text",
            "Grace Hopper visited Paris with the Navy team",
        ]
        ext = GenMentionExtractor(labels, hidden_size=48, max_width=4,
                                  threshold=0.5)
        batch = pa.table({"content": pa.array(texts, pa.large_string())})
        out = ext(batch).to_pylist()
        assert out, "planted corpus produced no decoder-mode mentions"

        # prompt-mode oracle: same model, dense decode + NMS
        token_lists = [t.split() for t in texts]
        logits, tl = ext.model.forward(token_lists)
        id_to_class = {i + 1: lab for i, lab in enumerate(labels)}
        want = set()
        import hashlib
        shas = [hashlib.sha256(t.encode()).hexdigest() for t in texts]
        for i in range(len(texts)):
            for s, e, lab, p in decode_logits(
                int(tl[i]), id_to_class, logits[i], threshold=0.5
            ):
                want.add((shas[i], s, e, lab, round(p, 9)))
        got = {
            (r["doc_sha256"], r["tok_start"], r["tok_end"], r["label"],
             round(r["score"], 9))
            for r in out
        }
        assert got == want
        for r in out:
            assert r["gen_label"] in labels
            # char offsets really slice the mention text
            assert r["text"] == texts[shas.index(r["doc_sha256"])][r["start"]:r["end"]]

    def test_ray_pipeline_deterministic(self, ray_session, tmp_path):
        import ray.data as rd

        from gliner_ray.config import DEFAULT_CONFIG
        from gliner_ray.corpus import write_corpus
        from gliner_ray.pipelines.kg import read_files
        from gliner_ray.stages.labelgen import GenMentionExtractor

        d = str(tmp_path / "files")
        write_corpus(d, n_files=20, n_repos=4, seed=5)

        def run():
            m = read_files(d, DEFAULT_CONFIG).map_batches(
                GenMentionExtractor,
                fn_constructor_kwargs={
                    "labels": ["function", "class", "library"],
                    "max_width": 4,
                },
                batch_format="pyarrow", batch_size=16, concurrency=(1, 4),
            )
            df = m.select_columns(
                ["doc_sha256", "start", "end", "label", "gen_label"]
            ).to_pandas()
            return sorted(map(tuple, df.values.tolist()))

        a = run()
        assert a and run() == a
