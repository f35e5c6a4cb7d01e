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
