"""Stage [C] — decode + explode to mentions rows (stateless map_batches).

Applies reference decode semantics (``decoder.py:54-128``: threshold +
greedy NMS, ``kernels/decode.py``) per chunk, maps token spans back to
absolute char offsets (``model.py:428-447`` semantics), slices surface
text, and explodes to one row per mention.

Cross-chunk dedup uses a deterministic OWNERSHIP RULE instead of a
global shuffle: a mention discovered in chunk ``[cs, ce)`` is emitted
only by the first chunk that fully contains it — i.e. kept iff
``cs == 0`` or ``tok_end >= cs + overlap`` (a span ending inside the
lookback overlap is fully covered by, and already emitted from, the
previous chunk). This removes the ``groupby(doc, start, end, label)``
all-to-all that naive dedup would need at 10^12-file scale. The oracle
applies the identical rule, so parity is exact.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..kernels.decode import decode_candidates
from ..kernels.normalize import variants

#: label tag for rows routed to quarantine instead of being dropped
QUARANTINE_LABEL = "__quarantine__"



MENTION_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("bucket", pa.int32()),
        ("doc_sha256", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("tok_start", pa.int32()),
        ("tok_end", pa.int32()),
        ("text", pa.string()),
        ("label", pa.string()),
        ("score", pa.float64()),
        # normalization variants precomputed here (single regex pass);
        # the linking stage consumes these columns instead of
        # re-normalizing every mention a second and third time
        ("variant0", pa.string()),
        ("variant1", pa.string()),  # null when it equals variant0
    ]
)


def mention_owned_by_chunk(chunk_start: int, overlap: int, abs_tok_end: int) -> bool:
    """Ownership rule shared with the oracle (see module docstring)."""
    return chunk_start == 0 or abs_tok_end >= chunk_start + overlap


def make_decoder(cfg: PipelineConfig):
    """Build the [C] map_batches function."""

    def decode_batch(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in MENTION_SCHEMA.names}
        n = batch.num_rows
        get = lambda name: batch[name].to_pylist()  # noqa: E731
        repos, paths, commits = get("repo"), get("path"), get("commit")
        buckets, shas = get("bucket"), get("doc_sha256")
        offs, toks_col = get("tok_offset"), get("tokens")
        cs_col, ce_col = get("char_starts"), get("char_ends")
        texts, ccs_col = get("chunk_text"), get("chunk_char_start")
        cands_s, cands_k = get("cand_s"), get("cand_k")
        cands_lab, cands_sc = get("cand_label"), get("cand_score")
        chunk_ids = get("chunk_id")
        for i in range(n):
            if chunk_ids[i] == -1:
                # quarantined input row (see stages/normalize.py): keep
                # it as a tagged row so nothing is silently dropped
                cols["repo"].append(repos[i])
                cols["path"].append(paths[i])
                cols["commit"].append(commits[i])
                cols["bucket"].append(buckets[i])
                cols["doc_sha256"].append(shas[i])
                cols["start"].append(-1)
                cols["end"].append(-1)
                cols["tok_start"].append(-1)
                cols["tok_end"].append(-1)
                cols["text"].append(texts[i])  # the error message
                cols["label"].append(QUARANTINE_LABEL)
                cols["score"].append(0.0)
                cols["variant0"].append(None)
                cols["variant1"].append(None)
                continue
            cands = list(zip(cands_s[i], cands_k[i], cands_lab[i], cands_sc[i]))
            spans = decode_candidates(
                cands,
                n_tokens=len(toks_col[i]),
                flat_ner=cfg.flat_ner,
                threshold=cfg.threshold,
                multi_label=cfg.multi_label,
            )
            off, ccs = offs[i], ccs_col[i]
            starts_i, ends_i, chunk_text = cs_col[i], ce_col[i], texts[i]
            for s_rel, e_rel, label, score in spans:
                abs_te = off + e_rel
                if not mention_owned_by_chunk(off, cfg.chunk_overlap, abs_te):
                    continue
                start = starts_i[s_rel]
                end = ends_i[e_rel]
                cols["repo"].append(repos[i])
                cols["path"].append(paths[i])
                cols["commit"].append(commits[i])
                cols["bucket"].append(buckets[i])
                cols["doc_sha256"].append(shas[i])
                cols["start"].append(start)
                cols["end"].append(end)
                cols["tok_start"].append(off + s_rel)
                cols["tok_end"].append(abs_te)
                text = chunk_text[start - ccs : end - ccs]
                vs = variants(text)
                cols["text"].append(text)
                cols["label"].append(label)
                cols["score"].append(float(score))
                cols["variant0"].append(vs[0] if vs else None)
                cols["variant1"].append(vs[1] if len(vs) > 1 else None)
        return pa.table(
            {name: pa.array(cols[name], type=MENTION_SCHEMA.field(name).type)
             for name in MENTION_SCHEMA.names}
        )
        # NOTE: dictionary-encoding the repetitive string columns here
        # was tried and HURT (123 s vs 84 s at 640k files): Ray's
        # shuffle pays dictionary unification on every block concat.

    return decode_batch
