"""Physical-layout operators: clustered writes for scan pruning.

At 100 TB the fastest scan is the one that never reads the file: parquet
readers prune whole files/row-groups whose column min/max statistics
exclude the predicate. That only works if the writer CLUSTERS rows so
per-file ranges are disjoint — the Spark-native equivalent of
Delta/Iceberg ``CLUSTER BY`` (Z-order-lite for a single sort axis):

    repartitionByRange(cols)        → range-disjoint output partitions
    .sortWithinPartitions(cols)     → monotone row-groups inside each file

``files_matching_predicate`` counts, from the parquet footers alone, how
many files a ``[lo, hi]`` predicate must open — the exact pruning logic
a reader applies, usable as a layout-quality metric and in tests.

The reference has no analog (single Postgres heap + btree indexes); this
replaces its `idx_fact_jobs_rank_score`-style index tuning
(scripts/bootstrap_db.sql:156-159) for immutable columnar storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``: file
    k holds the k-th contiguous range of the sort key, each file's
    row-groups internally sorted — min/max footers become an index."""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    cluster_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet table into
    ``ceil(total_bytes / target_bytes)`` files (optionally re-clustered).
    Incremental pipelines (foreachBatch merges, streaming sinks) accrete
    small files; at scale the fix is periodic rewrite toward the HDFS/S3
    sweet spot (~128 MB), not more executors. Returns the new file count.

    Rewrite goes through a temp dir then an atomic-ish swap so a crashed
    compaction never leaves the table truncated."""
    import glob
    import os
    import shutil

    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        subdirs = [
            e.name
            for e in os.scandir(path)
            if e.is_dir() and not e.name.startswith("_")
        ]
        if subdirs:
            # a hive-partitioned table has no top-level files; a naive
            # rewrite here would silently flatten the partition layout
            raise ValueError(
                f"compact() supports unpartitioned tables; {path!r} has "
                f"partition dirs ({subdirs[:3]}...) — compact each "
                "partition dir, or rewrite via TableStore.overwrite_partitions"
            )
    df = spark.read.parquet(path)
    total = sum(os.path.getsize(f) for f in files)
    n = max(1, -(-total // target_bytes))
    tmp = path.rstrip("/") + "._compact_tmp"
    compacted = (
        df.repartitionByRange(n, *cluster_cols).sortWithinPartitions(*cluster_cols)
        if cluster_cols
        else df.repartition(n)
    )
    compacted.write.mode("overwrite").parquet(tmp)
    # two renames instead of rmtree-then-rename: a crash leaves either the
    # old or the new table fully intact (the only loss window is between
    # the renames, where the path is briefly absent — single-writer op)
    old = path.rstrip("/") + "._compact_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(glob.glob(os.path.join(path, "*.parquet")))


def files_matching_predicate(path: str, column: str, lo, hi) -> tuple[int, int]:
    """(files whose [min,max] intersects [lo,hi], total files) — computed
    from parquet footer statistics exactly as a pruning reader would."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    hits = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    if s.has_min_max:
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            hits += 1  # unknown stats → must read
    return hits, len(files)


def zorder_key(bucket_cols: list, bits: int = 8):
    """Morton (Z-order) interleave of pre-bucketed dimensions — the
    multi-axis generalization of the single-axis clustering above. Each
    input column must already be an integer bucket in [0, 2^bits); the
    key interleaves their bits (dim 0 gets the higher bit of each pair),
    so sorting by it gives every dimension locality ~2^(bits/ndims) —
    a 2-D predicate then prunes files on BOTH axes, where a plain sort
    prunes only its leading axis (Morton 1966; Delta/Iceberg ZORDER BY).
    Pure integer bit arithmetic → engine-exact, pushdown-friendly."""
    from pyspark.sql import functions as F

    ndims = len(bucket_cols)
    key = F.lit(0).cast("bigint")
    for d, col in enumerate(bucket_cols):
        c = F.col(col) if isinstance(col, str) else col
        for b in range(bits):
            # bit b of dim d lands at position b*ndims + (ndims-1-d)
            key = key + F.shiftleft(
                F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1)),
                b * ndims + (ndims - 1 - d),
            )
    return key


def sql_zorder_key(bucket_exprs: list, bits: int = 8) -> str:
    """DuckDB twin of ``zorder_key`` (bit-identical)."""
    ndims = len(bucket_exprs)
    terms = []
    for d, expr in enumerate(bucket_exprs):
        for b in range(bits):
            terms.append(
                f"(((CAST({expr} AS BIGINT) >> {b}) & 1) << {b * ndims + (ndims - 1 - d)})"
            )
    return "(" + " + ".join(terms) + ")"


def scan_pruned(spark, path: str, column: str, lo, hi):
    """Planner-side file skipping made actionable: read ONLY the files
    whose footer [min,max] for ``column`` intersects [lo, hi] (the exact
    logic ``files_matching_predicate`` measures), then re-apply the
    predicate for row-level exactness. On a clustered/Z-ordered layout
    this turns a full-table scan into an O(selectivity) scan BEFORE the
    reader even opens the skipped files — the engine-side equivalent of
    Delta/Iceberg data skipping, usable on plain parquet directories.
    Result ≡ full scan + filter (stats are conservative: unknown → read)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    keep = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    if s.has_min_max:
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            keep.append(f)
    if not keep:
        return (
            spark.read.parquet(path)
            .where(F.col(column).between(lo, hi))
            .limit(0)
        )
    return spark.read.parquet(*keep).where(F.col(column).between(lo, hi))
