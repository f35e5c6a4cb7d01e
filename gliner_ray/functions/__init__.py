"""Large-scale training-data-pipeline operators (beyond the reference).

Text analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), similarity search, and multimodal-column
plumbing — the operations a 100 TB corpus pipeline needs around the KG
extraction core. All are ``map_batches``-first with
partial-aggregation before any shuffle.
"""
