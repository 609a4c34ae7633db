"""jobspark — a PySpark-native incremental ETL & analytics engine.

A brand-new engine with the query and data-processing capabilities of the
public ``filmozolevskiy/job-etl`` reference, re-expressed as idiomatic Spark:
StructType schemas, DataFrame transforms, broadcast joins, window-function
dedup, merge-upserts with watermark incrementality, and native column
expressions instead of per-row Python loops — plus LLM-data-pipeline
operators (near-dup detection, similarity search, text analysis) designed
for 100 TB scale.

Package layout:
    functions/  — scalar/column expression helpers (identity hash, text, time)
    operators/  — relational operator library (merge, dedup, topk, watermark, DQ)
    sources/    — source adapters (mock, jsearch-shaped), registry, readers
    pipeline/   — the reference pipeline stages (normalize, enrich, rank, marts)
    ml/         — LLM-data ops (dedup, ANN similarity, text stats, multimodal)
    streaming/  — Structured Streaming wrappers (foreachBatch merge)
    queries/    — the declared query inventory + DuckDB oracle twins
"""

__version__ = "0.1.0"
