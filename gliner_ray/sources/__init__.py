from .io import (  # noqa: F401
    read_files_parquet,
    read_gliner_json,
    read_jsonl_corpus,
    write_json_records,
)
