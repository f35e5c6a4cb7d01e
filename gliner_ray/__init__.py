"""gliner_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch engine with the query/data-processing capabilities of the
reference GLiNER tree (span-based zero-shot NER → entity linking →
(subj, pred, obj) triple materialization), re-expressed as idiomatic
Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful scorer stages,
``groupby``/``map_groups`` for the entity-linking shuffle, and
partitioned, manifest-tracked Parquet sinks for checkpoint resume.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
session is owned by the caller (driver, bench.py, or test fixture).
"""

__version__ = "0.1.0"
