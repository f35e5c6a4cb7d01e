"""Sources / sinks (SURVEY.md §2.1).

Reference analogs:

- ``open_content`` (``gliner/evaluation/evaluate.py:11-27``): glob a
  dataset dir of JSON splits → :func:`read_gliner_json` per split.
- JSONL corpus reader (``create_confidence_splits.py:68-72``) →
  :func:`read_jsonl_corpus`.
- ``save_data_to_file`` (``data/process_nuner.py:39-41``) →
  :func:`write_json_records` (small record sets; big tables go through
  ``ds.write_parquet``).
- The primary corpus source is Parquet (:func:`read_files_parquet`),
  column-pruned at the read.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def read_files_parquet(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Primary corpus reader: Parquet with column pruning."""
    import ray.data as rd

    return rd.read_parquet(
        path,
        columns=columns or ["repo", "path", "commit", "lang", "content"],
    )


def read_gliner_json(path: str) -> "ray.data.Dataset":
    """Read a reference-format JSON array of records
    ``{"tokenized_text": [...], "ner": [[s, e, label], ...]}``.

    The reference loads these with ``json.load`` into memory
    (``evaluate.py:11-27``); here the parsed records become a Dataset
    with normalized columns (``ner`` exploded to three list columns so
    the Arrow schema is concrete, not a ragged object column).
    """
    import pyarrow as pa
    import ray.data as rd

    with open(path) as f:
        records = json.load(f)
    toks, ner_s, ner_e, ner_l = [], [], [], []
    for r in records:
        toks.append(list(r.get("tokenized_text", [])))
        spans = r.get("ner", [])
        ner_s.append([int(s[0]) for s in spans])
        ner_e.append([int(s[1]) for s in spans])
        ner_l.append([str(s[2]) for s in spans])
    table = pa.table(
        {
            "tokenized_text": pa.array(toks, pa.list_(pa.string())),
            "ner_start": pa.array(ner_s, pa.list_(pa.int32())),
            "ner_end": pa.array(ner_e, pa.list_(pa.int32())),
            "ner_label": pa.array(ner_l, pa.list_(pa.string())),
        }
    )
    return rd.from_arrow(table)


def open_content(dataset_dir: str):
    """Glob a reference-layout dataset dir → (train, dev, test, labels).

    Mirrors ``gliner/evaluation/evaluate.py:11-27``: the dir holds
    ``*train*.json`` / ``*dev*.json`` / ``*test*.json`` record files
    plus a ``*labels*.json`` label list. Splits come back as Datasets
    (via :func:`read_gliner_json`), labels as a driver-side list —
    the label vocabulary is broadcast config, never a Dataset.
    Missing splits return None.
    """
    import glob as _glob

    out: dict[str, object] = {"train": None, "dev": None, "test": None}
    labels: list[str] | None = None
    for p in sorted(_glob.glob(os.path.join(dataset_dir, "*.json"))):
        name = os.path.basename(p).lower()
        if "label" in name:
            with open(p) as f:
                labels = json.load(f)
        else:
            for split in out:
                if split in name:
                    out[split] = read_gliner_json(p)
    return out["train"], out["dev"], out["test"], labels


def read_jsonl_corpus(path_or_dir: str) -> "ray.data.Dataset":
    """Read JSONL documents (one JSON object per line) — distributed
    (``ray.data.read_json``), unlike the reference's in-memory loop."""
    import ray.data as rd

    return rd.read_json(path_or_dir, file_extensions=["jsonl", "json"])


def write_json_records(records: list[dict], filepath: str) -> None:
    """Small-record JSON sink (``save_data_to_file`` analog). Atomic
    via tmp+rename; use ``ds.write_parquet`` for anything large."""
    os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
    tmp = filepath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(records, f)
    os.replace(tmp, filepath)
