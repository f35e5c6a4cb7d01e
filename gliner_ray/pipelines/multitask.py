"""Multitask pipelines — the reference's task API re-expressed on Ray Data.

Mirrors the template-method surface of ``gliner/multitask/base.py:8-112``
(``GLiNERBasePipeline``: prepare_texts → model.run → process_predictions)
as batch transforms: each task is a callable class whose ``__call__``
processes one Arrow batch of a ``documents``-shaped table, run via
``ds.map_batches(TaskCls, fn_constructor_kwargs=..., concurrency=N)``.

Task semantics mirrored (file:line into /root/reference):

- **prompt prepend + char-offset shift-back**: every task prepends its
  prompt to the text (``classification.py:142-158``,
  ``question_answering.py:68-80``, ``summarization.py:68-75``,
  ``relation_extraction.py:49-64``, ``open_extraction.py:59-74``) and
  un-shifts predicted char offsets by ``len(prompt) + 1``
  (``relation_extraction.py:85-105``).
- **classification**: candidate label scores → softmax → top-1 (or
  multi-label threshold), ``classification.py:107-140``.
- **question answering**: label ``"answer"``, keep the highest-scoring
  span, sort by score (``question_answering.py:60-64``).
- **summarization**: label ``"summarize"``, keep top spans by score and
  join their texts (``summarization.py:59-75``).
- **relation extraction**: per document, candidate labels are the
  cross product ``entity × relation`` formatted ``"ent <> rel"``
  (``relation_extraction.py:66-75``); predictions parse the composite
  label back into ``{"source", "relation", "target", "score"}``
  (``relation_extraction.py:88-109``) with triple string identity
  ``"s <> r <> o"`` (``:236``).
- **open extraction**: generic ``"match"`` label
  (``open_extraction.py:59-74``).

The model backend is the deterministic scorer kernel (CI contract,
FIXTURES.md §5); a torch GLiNER backend would slot in via
``stages/scorer.py`` with identical batch plumbing.
"""

from __future__ import annotations

import math
from typing import Sequence

import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..kernels.decode import decode_candidates
from ..kernels.scoring import DeterministicScorerKernel, _hash_frac
from ..kernels.tokenize import tokenize_with_offsets


class BaseTaskPipeline:
    """Template method: prompt build → tokenize → score → decode →
    task-specific postprocess (mirrors ``multitask/base.py:86-112``)."""

    prompt: str = ""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.kernel = DeterministicScorerKernel(cfg.vocab, cfg.labels)

    # -- template steps ------------------------------------------------
    def prepare_text(self, text: str) -> str:
        """Prompt prepend (``base.py`` prepare_texts analog)."""
        return f"{self.prompt}\n{text}" if self.prompt else text

    def spans_for(self, text: str, doc_key: str) -> list[dict]:
        """Run the scorer on the prompted text; shift char offsets back
        by the prompt length (``relation_extraction.py:85-105``)."""
        full = self.prepare_text(text)
        shift = len(full) - len(text)
        tokens, starts, ends = tokenize_with_offsets(full)
        cands = self.kernel.score_tokens(tokens, doc_key, 0)
        spans = decode_candidates(
            cands, len(tokens), flat_ner=self.cfg.flat_ner,
            threshold=self.cfg.threshold, multi_label=self.cfg.multi_label,
        )
        out = []
        for s, e, label, score in spans:
            cs, ce = starts[s] - shift, ends[e] - shift
            if cs < 0:  # span inside the prompt — not part of the document
                continue
            out.append(
                {"start": cs, "end": ce, "text": text[cs:ce],
                 "label": label, "score": float(score)}
            )
        return out


class ClassificationPipeline(BaseTaskPipeline):
    """Softmax top-1 (or multi-label) over candidate label scores —
    ``classification.py:107-140`` semantics with deterministic
    per-(text, label) scores."""

    prompt = "Classify the following text:"

    def __init__(self, classes: Sequence[str], multi_label: bool = False,
                 cfg: PipelineConfig = DEFAULT_CONFIG):
        super().__init__(cfg)
        self.classes = list(classes)
        self.multi = multi_label

    def _scores(self, text: str) -> list[float]:
        return [_hash_frac("clf", text[:256], c) for c in self.classes]

    def __call__(self, batch: pa.Table) -> pa.Table:
        labels, confidences = [], []
        for text in batch["text"].to_pylist():
            raw = self._scores(text)
            exp = [math.exp(v) for v in raw]
            z = sum(exp)
            probs = [v / z for v in exp]
            best = max(range(len(probs)), key=lambda i: (probs[i], -i))
            labels.append(self.classes[best])
            confidences.append(probs[best])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "predicted_class": pa.array(labels, pa.string()),
                "confidence": pa.array(confidences, pa.float64()),
            }
        )


class QuestionAnsweringPipeline(BaseTaskPipeline):
    """Highest-scoring span is the answer (``question_answering.py:60-80``)."""

    def __init__(self, question: str, cfg: PipelineConfig = DEFAULT_CONFIG):
        super().__init__(cfg)
        self.prompt = f"Answer the following question: {question}"

    def __call__(self, batch: pa.Table) -> pa.Table:
        answers, scores, starts = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            spans = sorted(
                self.spans_for(text, str(doc_id)),
                key=lambda s: (-s["score"], s["start"]),
            )
            top = spans[0] if spans else None
            answers.append(top["text"] if top else None)
            scores.append(top["score"] if top else None)
            starts.append(top["start"] if top else None)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "answer": pa.array(answers, pa.string()),
                "answer_start": pa.array(starts, pa.int32()),
                "score": pa.array(scores, pa.float64()),
            }
        )


class SummarizationPipeline(BaseTaskPipeline):
    """Join the top-k spans by score in document order
    (``summarization.py:59-75``)."""

    prompt = "Summarize the given text, highlighting the most important information:"

    def __init__(self, top_k: int = 3, cfg: PipelineConfig = DEFAULT_CONFIG):
        super().__init__(cfg)
        self.top_k = top_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        summaries = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            spans = sorted(
                self.spans_for(text, str(doc_id)),
                key=lambda s: (-s["score"], s["start"]),
            )[: self.top_k]
            spans.sort(key=lambda s: s["start"])  # document order
            summaries.append(" ".join(s["text"] for s in spans))
        return pa.table(
            {"doc_id": batch["doc_id"], "summary": pa.array(summaries, pa.string())}
        )


class RelationExtractionPipeline(BaseTaskPipeline):
    """Entity × relation cross-product labels → (source, relation,
    target) records (``relation_extraction.py:49-109``).

    Deterministic semantics: a document's candidate sources are its
    detected entity surfaces; for each (source, relation) composite
    label, every OTHER detected span in the document is a candidate
    target with probability from the hash contract — co-occurrence
    relations, the reference's extraction shape.
    """

    prompt = "Extract relationships between entities from the text:"

    def __init__(self, relations: Sequence[str], cfg: PipelineConfig = DEFAULT_CONFIG,
                 pair_rate: float = 0.25):
        super().__init__(cfg)
        self.relations = list(relations)
        self.pair_rate = pair_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, sources, rels, targets, scores = [], [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            spans = self.spans_for(text, str(doc_id))
            # unique entity surfaces, order-preserving (model.py:202 idiom)
            ents = list(dict.fromkeys(s["text"] for s in spans))
            for src in ents:
                for rel in self.relations:
                    composite = f"{src} <> {rel}"  # relation_extraction.py:69
                    for tgt in ents:
                        if tgt == src:
                            continue
                        p = _hash_frac("re", doc_id, composite, tgt)
                        if p < self.pair_rate:
                            # parse-back: label splits into source+relation,
                            # span text is the target (relation_extraction.py:88-109)
                            doc_ids.append(doc_id)
                            sources.append(src)
                            rels.append(rel)
                            targets.append(tgt)
                            scores.append(0.5 + p)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "source": pa.array(sources, pa.string()),
                "relation": pa.array(rels, pa.string()),
                "target": pa.array(targets, pa.string()),
                "score": pa.array(scores, pa.float64()),
            }
        )

    @staticmethod
    def triple_strings(table: pa.Table) -> list[str]:
        """``"source <> relation <> target"`` identity strings
        (``relation_extraction.py:236``)."""
        return [
            f"{s} <> {r} <> {t}"
            for s, r, t in zip(
                table["source"].to_pylist(),
                table["relation"].to_pylist(),
                table["target"].to_pylist(),
            )
        ]


def prepare_docred_records(
    records: list[dict],
    text_column: str = "sents",
    rel_column: str = "labels",
) -> tuple[list[str], list[list[str]], list[str]]:
    """DocRED-format relation gold preparation
    (``multitask/relation_extraction.py:185-218``): each record has a
    ``vertexSet`` (list of coref clusters, each a list of mention
    dicts), sentence lists, and ``labels`` with parallel
    ``head``/``tail``/``relation_text`` arrays. head/tail ids index
    into ``vertexSet``; the FIRST mention's ``name`` represents the
    cluster. Returns (texts_by_line, grouped ``"head <> rel"`` labels
    per record, flat ``"head <> rel <> tail"`` true triples)."""
    texts_by_line: list[str] = []
    grouped_labels: list[list[str]] = []
    true_labels: list[str] = []
    for item in records:
        vertex_set = item.get("vertexSet") or []
        sents = item.get(text_column, [])
        labels = item.get(rel_column) or {"head": [], "tail": [], "relation_text": []}
        current_labels: list[str] = []
        for head_id, tail_id, relation in zip(
            labels["head"], labels["tail"], labels["relation_text"]
        ):
            head_data = vertex_set[head_id] if 0 <= head_id < len(vertex_set) else None
            tail_data = vertex_set[tail_id] if 0 <= tail_id < len(vertex_set) else None
            head_name = head_data[0]["name"] if head_data else None
            tail_name = tail_data[0]["name"] if tail_data else None
            true_labels.append(f"{head_name} <> {relation} <> {tail_name}")
            current_labels.append(f"{head_name} <> {relation}")
        grouped_labels.append(current_labels)
        texts_by_line.append(
            " ".join(string for sublist in sents for string in sublist)
        )
    return texts_by_line, grouped_labels, true_labels


def docred_to_examples_batch(batch: pa.Table) -> pa.Table:
    """Batch form for ``map_batches``: DocRED rows → (text,
    prompt_labels, true_triples) rows, one per document — the
    distributed shape of the reference's driver loop."""
    records = batch.to_pylist()
    texts, grouped, _ = prepare_docred_records(records)
    # per-record true triples (the flat list re-grouped)
    per_rec_true = []
    for item in records:
        _, _, t = prepare_docred_records([item])
        per_rec_true.append(t)
    return pa.table(
        {
            "text": pa.array(texts, pa.string()),
            "prompt_labels": pa.array(grouped, pa.list_(pa.string())),
            "true_triples": pa.array(per_rec_true, pa.list_(pa.string())),
        }
    )


class OpenExtractionPipeline(BaseTaskPipeline):
    """Generic open extraction with a custom prompt and the ``match``
    label (``open_extraction.py:59-74``) — here: all vocab spans."""

    def __init__(self, prompt: str, cfg: PipelineConfig = DEFAULT_CONFIG):
        super().__init__(cfg)
        self.prompt = prompt

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, texts, starts, ends, scores = [], [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for s in self.spans_for(text, str(doc_id)):
                doc_ids.append(doc_id)
                texts.append(s["text"])
                starts.append(s["start"])
                ends.append(s["end"])
                scores.append(s["score"])
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "match": pa.array(texts, pa.string()),
                "start": pa.array(starts, pa.int32()),
                "end": pa.array(ends, pa.int32()),
                "score": pa.array(scores, pa.float64()),
            }
        )


def run_task(ds, task_cls, concurrency=(1, 4), batch_size: int = 512, **kwargs):
    """Run a task pipeline over a documents Dataset (actor pool — the
    kernel/vocab index is per-actor state)."""
    return ds.map_batches(
        task_cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
