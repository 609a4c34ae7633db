"""Pipeline runner + stage CLIs (reference parity: §3.1 DAG + §3.2 CLIs).

Replaces Airflow for single-process runs: extract → normalize → enrich →
marts → rank → dq → report, with tables persisted as parquet between
stages (a storage layer with atomic overwrite-rewrite; Delta MERGE drops
in behind ``TableStore`` when available).

CLI contract mirrors the reference services: ``--limit --source --dry-run
--verbose``, stats dict printed as JSON, exit codes 0 (ok), 1 (partial —
some rows rejected), 2 (fatal).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys
import tempfile
from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from job_etl_spark.operators import dq
from job_etl_spark.pipeline import report as report_mod
from job_etl_spark.pipeline.enrich import (
    SkillsDictionary,
    enrich_seniority,
    enrich_skills,
    seed_company_records,
)
from job_etl_spark.pipeline.marts import build_dim_companies, build_fact_jobs
from job_etl_spark.pipeline.normalize import merge_into_staging, normalize_common
from job_etl_spark.pipeline.rank import RankingConfig, rank_jobs
from job_etl_spark.schema import (
    STAGING_SCHEMA,
    VALID_CONTRACT_TYPES,
    VALID_REMOTE_TYPES,
    VALID_SENIORITY_LEVELS,
)
from job_etl_spark.sources.base import SourceAdapter, common_from_raw, land_raw
from job_etl_spark.sources.mock_adapter import MockAdapter


class TableStore:
    """Parquet-backed tables with read-modify-overwrite semantics.

    At 100 TB the overwrite becomes partition-scoped (partitionBy source/
    ingest-date + dynamic partition overwrite) or a Delta MERGE; the runner
    only touches this seam.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # per-run merged-view memo: (table, delta-seq tuple, base stamp) →
        # lazily-checkpointed merged frame (see mor_read)
        self._merged_memo: dict[tuple, DataFrame] = {}

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        import glob

        return (
            self.mor_exists(name)
            or bool(glob.glob(os.path.join(self.path(name), "*.parquet")))
            or bool(glob.glob(os.path.join(self.path(name), "_SUCCESS")))
        )

    def read(self, name: str, schema=None, merge_schema: bool = False) -> DataFrame:
        """``merge_schema=True`` unions the footer schemas of every file
        (parquet schema evolution): rows written before a column existed
        read as NULL. Off by default — the merge pass reads every footer,
        which is a real cost on a 100 TB table; flip it only for tables
        that actually evolve.

        A table migrated to the merge-on-read layout is read through
        ``mor_read`` — every stage (marts/dq/publish/report) sees the
        merged view automatically, so a ``--mor`` write-back is never
        invisible to downstream readers."""
        if self.mor_exists(name):
            return self.mor_read(name)
        if not self.exists(name):
            if schema is None:
                raise FileNotFoundError(self.path(name))
            return self.spark.createDataFrame([], schema)
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(self.path(name))

    def write(
        self,
        name: str,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: Sequence[str] = (),
    ) -> None:
        """At 100 TB, pass partition_by=('source',) (or ingest date): writes
        become partition-scoped, incremental scans prune partitions, and
        with spark.sql.sources.partitionOverwriteMode=dynamic a merge
        rewrites only the partitions it touched."""
        if self.mor_exists(name):
            # a plain parquet write next to a MOR layout would be INVISIBLE
            # (read() prefers the merged view) — route or refuse, never fork
            if mode == "overwrite" and not partition_by:
                self.rewrite(name, df)
                return
            raise ValueError(
                f"table {name!r} uses the merge-on-read layout: use "
                "mor_upsert (append) or rewrite/mor_compact (rewrite); a "
                "direct parquet write would be invisible to readers"
            )
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))
        self.spark.catalog.refreshByPath(self.path(name))

    def overwrite_partitions(
        self, name: str, df: DataFrame, partition_by: Sequence[str]
    ) -> None:
        """Dynamic partition overwrite: replace ONLY the partitions present
        in ``df``, leaving every other partition's files untouched.

        This is the 100 TB incremental-write path (reference:
        services/normalizer/db_operations.py:414 batch upsert, re-expressed
        as partition-scoped file replacement): a daily merge that touches 1
        of 1000 date partitions rewrites ~0.1% of the table instead of all
        of it, and concurrent readers of other partitions are unaffected.
        The conf is saved/restored so the session-wide STATIC default (the
        safe mode for full overwrites) still applies elsewhere."""
        if self.mor_exists(name):
            raise ValueError(
                f"table {name!r} uses the merge-on-read layout: partition-"
                "scoped overwrite would fork an invisible COW copy — land "
                "the patch as a delta (mor_upsert) instead"
            )
        conf = self.spark.conf
        prev = conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
        conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(*partition_by).parquet(
                self.path(name)
            )
        finally:
            conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        self.spark.catalog.refreshByPath(self.path(name))

    def _swap_in(self, name: str, tmp: str) -> None:
        """Promote a fully-written temp dir via rename-rename: a crash
        leaves either the old or the new table fully intact (overwrite
        would delete the destination before committing — the non-atomic
        window compact() was fixed for). Local-FS renames; an object-store
        deployment swaps this seam for a commit protocol / Delta."""
        import os
        import shutil

        path = self.path(name)
        old = path + "._old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
        self.spark.catalog.refreshByPath(path)

    def rewrite(self, name: str, df: DataFrame) -> None:
        """Safe read-modify-write: materialize to a temp dir first (the
        plan reads the files being replaced), then swap by rename.
        refreshByPath invalidates Spark's cached file listing — without it
        later scans chase deleted part files.

        A merge-on-read table stays MOR: the rewrite becomes a base
        replacement (the new frame already incorporates the deltas — it
        was read through the merged view) and the deltas are cleared, so
        a stage-level rewrite (marts, enrich) never forks the table back
        into a COW layout the MOR readers would miss."""
        if self.mor_exists(name):
            with self._mor_writer_lock(name):
                tmp = self._mor_dir(name, "base._tmp")
                self._mor_write_base(name, df, tmp, self._mor_meta(name))
                self._mor_swap_base(name, tmp)
                self._mor_update_columns(name, df)
            return
        tmp = self.path(f"__tmp_{name}")
        df.write.mode("overwrite").parquet(tmp)
        self.spark.catalog.refreshByPath(tmp)
        self._swap_in(name, tmp)

    def rewrite_many(self, updates: dict[str, DataFrame]) -> None:
        """Two-phase multi-table rewrite: materialize every plan to a temp
        dir FIRST, then swap — required when one table's new plan reads
        another table being replaced in the same stage. MOR tables swap
        their base (and clear deltas) instead of the COW dir."""
        tmps = {}
        for name, df in updates.items():
            if self.mor_exists(name):
                tmp = self._mor_dir(name, "base._tmp")
                self._mor_write_base(name, df, tmp, self._mor_meta(name))
            else:
                tmp = self.path(f"__tmp_{name}")
                df.write.mode("overwrite").parquet(tmp)
                self.spark.catalog.refreshByPath(tmp)
            tmps[name] = tmp
        for name, tmp in tmps.items():
            if self.mor_exists(name):
                with self._mor_writer_lock(name):
                    self._mor_swap_base(name, tmp)
                    self._mor_update_columns(name, updates[name])
            else:
                self._swap_in(name, tmp)

    # -- snapshot versioning (Delta-lite time travel) ----------------------
    # Each write lands in an immutable {table}/_v/{N}/ dir; a one-line
    # _LATEST pointer file flips atomically (os.replace). Readers resolve
    # the pointer (or an explicit version) so writers never disturb a
    # running read, rollback is a pointer flip, and audits can re-read any
    # retained snapshot — the file-layout core of what Delta/Iceberg
    # transaction logs provide, without a new dependency.

    def _vdir(self, name: str, version: int) -> str:
        return os.path.join(self.path(name), "_v", str(version))

    def _pointer(self, name: str) -> str:
        return os.path.join(self.path(name), "_LATEST")

    def snapshots(self, name: str) -> list[int]:
        import glob

        return sorted(
            int(os.path.basename(d))
            for d in glob.glob(os.path.join(self.path(name), "_v", "*"))
            if os.path.basename(d).isdigit()
        )

    def latest_snapshot(self, name: str) -> int | None:
        try:
            with open(self._pointer(name)) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def write_snapshot(self, name: str, df: DataFrame) -> int:
        version = (self.latest_snapshot(name) or 0) + 1
        df.write.mode("overwrite").parquet(self._vdir(name, version))
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer(name))  # atomic pointer flip
        return version

    def read_snapshot(self, name: str, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.latest_snapshot(name)
        if v is None:
            raise FileNotFoundError(f"no snapshots for table {name!r}")
        return self.spark.read.parquet(self._vdir(name, v))

    def rollback(self, name: str, version: int) -> None:
        if version not in self.snapshots(name):
            raise ValueError(f"version {version} not retained for {name!r}")
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer(name))

    def vacuum_snapshots(self, name: str, keep: int = 2) -> list[int]:
        """Drop all but the newest ``keep`` snapshots (never the pointer
        target). Returns the removed versions."""
        import shutil

        current = self.latest_snapshot(name)
        vs = self.snapshots(name)
        removable = [v for v in vs[:-keep] if v != current] if keep > 0 else []
        for v in removable:
            shutil.rmtree(self._vdir(name, v), ignore_errors=True)
        return removable

    # -- merge-on-read upserts (LSM-lite) ----------------------------------
    # A keyed upsert against a 100 TB base must not rewrite the base per
    # batch. Merge-on-read (the Hudi MOR / LSM pattern) lands each batch as
    # an immutable delta file and defers the merge to READ time:
    #   read = latest-wins over (deltas by descending sequence) ∪ (base
    #          minus keys present in any delta)
    # so a write costs O(batch), reads cost one broadcast-able anti-join
    # (delta keys ≪ base), and compaction — folding deltas into a new base
    # — is an offline rewrite on its own schedule. Tombstones (a true
    # ``_deleted`` column) delete keys at read time. Reference twin:
    # services/normalizer/db_operations.py batch upsert, decoupled from
    # write amplification.

    def _mor_dir(self, name: str, *parts: str) -> str:
        return os.path.join(self.path(name), "_mor", *parts)

    def _mor_meta(self, name: str) -> dict:
        import json

        with open(self._mor_dir(name, "_META")) as f:
            return json.load(f)

    def mor_exists(self, name: str) -> bool:
        return os.path.exists(self._mor_dir(name, "_META"))

    @contextmanager
    def _mor_writer_lock(self, name: str):
        """Enforce the single-writer contract on a MOR table's mutating
        surface (init / upsert / compact / base rewrite). The reference's
        orchestration runs each table's writer with ``max_active_runs=1``
        (airflow/dags/jobs_etl_daily.py), so a second concurrent writer is
        a deployment error — it must FAIL LOUDLY, not queue and not
        silently sweep the first writer's in-flight tmp dirs. ``flock`` on
        ``_mor/_LOCK``, non-blocking: the OS releases it if the holder
        dies, so a crashed writer never wedges the table. Local-FS
        semantics; an object-store deployment swaps this seam for a lease
        (the same seam note as ``_swap_in``). Readers never take the lock:
        ``mor_read`` is safe against a concurrent upsert (delta register
        is one atomic rename) — only compaction/base-swaps additionally
        assume no concurrent reader mid-swap (see ``mor_compact``)."""
        import fcntl

        os.makedirs(self._mor_dir(name), exist_ok=True)
        fd = os.open(self._mor_dir(name, "_LOCK"), os.O_CREAT | os.O_RDWR)
        try:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except OSError:
                raise ValueError(
                    f"MOR table {name!r} has a concurrent writer (lock "
                    "_mor/_LOCK is held); MOR tables are single-writer — "
                    "serialize the callers (max_active_runs=1)"
                )
            yield
        finally:
            os.close(fd)  # closing the fd releases the flock

    def _mor_bucket_expr(self, meta: dict):
        """Stable key→bucket assignment (xxhash64 is a fixed algorithm, so
        the mapping survives restarts and Spark upgrades)."""
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in meta["keys"]]), F.lit(meta["buckets"])
        )

    def _mor_write_base(self, name: str, df: DataFrame, dest: str, meta: dict) -> None:
        """Materialize a (new) base under the table's layout: bucketed
        tables hash-partition by ``_bucket`` (one dir per touched bucket,
        repartitioned so each bucket lands as ~one file), plain tables
        write flat.

        The authoritative column list + schema ride INSIDE the base dir
        as a ``_SCHEMA.json`` sidecar (underscore prefix — invisible to
        Spark's file listing), so the single base-swap rename publishes
        data and schema atomically: a crash between the swap and the
        _META convenience update can no longer leave new base files read
        under a stale explicit schema (added columns vanishing, dropped
        columns reading as null)."""
        import json

        if meta.get("buckets"):
            (
                df.withColumn("_bucket", self._mor_bucket_expr(meta))
                .repartition(meta["buckets"], F.col("_bucket"))
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(dest)
            )
        else:
            df.write.mode("overwrite").parquet(dest)
        with open(os.path.join(dest, "_SCHEMA.json"), "w") as f:
            json.dump({"columns": list(df.columns), "schema": df.schema.json()}, f)
        self.spark.catalog.refreshByPath(dest)

    def _mor_base_info(self, name: str, meta: dict) -> dict:
        """Resolve the base's authoritative ``{"columns", "schema"}``: the
        in-base ``_SCHEMA.json`` sidecar when present (committed atomically
        WITH the data by the base-swap rename), else the _META copy
        (pre-sidecar tables)."""
        import json

        side = self._mor_dir(name, "base", "_SCHEMA.json")
        try:
            with open(side) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"columns": meta.get("columns"), "schema": meta.get("schema")}

    def _mor_repair_buckets(self, name: str) -> None:
        """Finish or roll back a bucket swap interrupted mid-rename: a
        ``._old_bucket=N`` dir whose ``_bucket=N`` twin is missing is the
        pre-swap content (crash between rename-away and rename-in) —
        restore it; one whose twin exists is already-swapped debris —
        drop it. Dot-prefixed dirs are invisible to Spark's partition
        discovery, so a half-finished swap never double-counts."""
        import shutil

        basedir = self._mor_dir(name, "base")
        try:
            entries = os.listdir(basedir)
        except FileNotFoundError:
            return
        for e in entries:
            if not e.startswith("._old_bucket="):
                continue
            live = os.path.join(basedir, e[len("._old") :])
            old = os.path.join(basedir, e)
            if os.path.exists(live):
                shutil.rmtree(old, ignore_errors=True)
            else:
                os.rename(old, live)

    def mor_init(
        self,
        name: str,
        df: DataFrame,
        keys: Sequence[str],
        policy: dict | None = None,
        buckets: int | None = None,
    ) -> None:
        """Single-writer-locked entry point for ``_mor_init_locked``
        (the concurrency contract lives on ``_mor_writer_lock``)."""
        with self._mor_writer_lock(name):
            self._mor_init_locked(name, df, keys, policy, buckets)

    def _mor_init_locked(
        self,
        name: str,
        df: DataFrame,
        keys: Sequence[str],
        policy: dict | None = None,
        buckets: int | None = None,
    ) -> None:
        """Write the base and record the key columns. An initial batch may
        carry the ``_deleted`` tombstone column (a CDC feed's first batch
        often does): deleted rows are dropped and the marker stripped —
        the base stores only live rows in the user schema.

        ``policy`` selects the delta-resolution semantics recorded in the
        table's _META and applied by every subsequent ``mor_read``:

        - ``None`` (default): latest-wins — a delta row replaces the key's
          row wholesale (the rank write-back, CDC row images).
        - ``{"overwrite": [...], "coalesce": [...], "keep_first": [...]}``:
          per-column COALESCE-merge fold — each delta is a J3
          ``merge_upsert`` statement, and the read folds the delta stack
          through the same semantics (the staging upsert's contract,
          reference services/normalizer/db_operations.py:427-460).

        ``buckets=N`` hash-partitions the base by key into N stable bucket
        dirs (``_bucket=i/``) — the table-lifetime layout decision that
        makes ``mor_compact`` partition-scoped: compaction rewrites only
        the buckets the delta keys touch, so an amortized compaction costs
        O(touched buckets), not O(table). This is the MOR twin of the
        partitioned-COW ``overwrite_partitions`` path. Choose N so a
        bucket is a few GB at the table's target size; None (default)
        keeps the flat single-dir base for dimension-sized tables.

        Migrating a COW table (the usual first call passes
        ``store.read(name)``) deletes the stale top-level COW files after
        the base materializes, so nothing can silently read pre-migration
        data through a direct parquet path."""
        import json

        if "_deleted" in df.columns:
            df = df.where(~F.coalesce(F.col("_deleted"), F.lit(False))).drop(
                "_deleted"
            )
        meta: dict = {
            "keys": list(keys),
            "columns": list(df.columns),
            # the authoritative base schema: bucketed bases NEED it (an
            # empty partitionBy write leaves no footer to infer from) and
            # every read skips footer inference with it
            "schema": df.schema.json(),
        }
        if policy is not None:
            meta["policy"] = {
                "overwrite": list(policy.get("overwrite", ())),
                "coalesce": list(policy.get("coalesce", ())),
                "keep_first": list(policy.get("keep_first", ())),
            }
        if buckets:
            if "_bucket" in df.columns:
                raise ValueError("'_bucket' is reserved for the bucketed MOR layout")
            meta["buckets"] = int(buckets)
        self._mor_write_base(name, df, self._mor_dir(name, "base"), meta)
        os.makedirs(self._mor_dir(name, "delta"), exist_ok=True)
        tmp = self._mor_dir(name, "_META.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._mor_dir(name, "_META"))
        # the base write above already materialized everything it read.
        # Remove EVERY stale COW artifact — including partition
        # subdirectories from a partition_by write — keeping only the MOR
        # layout and the snapshot store (_v/_LATEST): anything else left
        # behind would let a direct parquet read of the table path see
        # pre-migration data.
        import shutil as _shutil

        keep = {"_mor", "_v", "_LATEST", "_LATEST.tmp"}
        for entry in os.listdir(self.path(name)):
            if entry in keep:
                continue
            full = os.path.join(self.path(name), entry)
            if os.path.isdir(full):
                _shutil.rmtree(full)
            else:
                os.remove(full)
        self.spark.catalog.refreshByPath(self.path(name))

    def mor_set_policy(self, name: str, policy: dict) -> None:
        """Upgrade a latest-wins MOR table to a policy table (e.g. a
        fact_jobs migrated before the marts stage learned MOR). The
        existing delta stack folds into the base FIRST, under the
        semantics it was written with (latest-wins), so the policy only
        ever governs deltas landed after the upgrade — no historical
        statement is reinterpreted. Changing an EXISTING policy is
        refused: old deltas' classes would silently change meaning
        (per-statement overrides are the supported path for that)."""
        import json

        with self._mor_writer_lock(name):
            meta = self._mor_meta(name)
            if meta.get("policy") is not None:
                if meta["policy"] == {
                    k: list(policy.get(k, ())) for k in ("overwrite", "coalesce", "keep_first")
                }:
                    return
                raise ValueError(
                    f"MOR table {name!r} already has a different policy; "
                    "reinterpreting landed deltas is not supported"
                )
            self._mor_compact_locked(name)
            meta["policy"] = {
                "overwrite": list(policy.get("overwrite", ())),
                "coalesce": list(policy.get("coalesce", ())),
                "keep_first": list(policy.get("keep_first", ())),
            }
            tmp = self._mor_dir(name, "_META.tmp")
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, self._mor_dir(name, "_META"))

    def mor_deltas(self, name: str) -> list[int]:
        import glob

        return sorted(
            int(os.path.basename(d))
            for d in glob.glob(self._mor_dir(name, "delta", "*"))
            if os.path.basename(d).isdigit()
        )

    def mor_upsert(self, name: str, df: DataFrame, classes: dict | None = None) -> int:
        """Single-writer-locked entry point for ``_mor_upsert_locked``
        (the concurrency contract lives on ``_mor_writer_lock``)."""
        with self._mor_writer_lock(name):
            return self._mor_upsert_locked(name, df, classes)

    def _mor_upsert_locked(
        self, name: str, df: DataFrame, classes: dict | None = None
    ) -> int:
        """Land one batch as the next delta. Rows may carry a boolean
        ``_deleted`` tombstone column; within a batch the caller provides
        at most one row per key (the batch is a statement, not a log) —
        ENFORCED after the delta materializes: duplicate keys would make
        the fold's per-key windows tie on ``_seq`` and silently break the
        COW-parity guarantee, so a duplicate batch fails loudly instead.

        ``classes`` overrides the table policy's column classes FOR THIS
        STATEMENT only (``{"overwrite": [...], "coalesce": [...],
        "keep_first": [...]}``) — the enricher's keyed UPDATE overwrites
        columns the normalize policy keeps-first (reference:
        services/enricher/db_operations.py:140-176 vs the normalizer's ON
        CONFLICT list). A statement may also carry a SUBSET of the table's
        columns: uncarried columns are a no-op (never nulled out). Only
        policy tables accept overrides; columns not named keep the table
        policy's class.

        Crash contract: the batch lands in ``delta/<seq>.tmp.<pid>``
        (invisible to ``mor_deltas``), is validated, gets its
        ``_CLASSES.json`` sidecar, and registers via one atomic rename —
        a crash anywhere before the rename leaves no half-visible delta,
        and the next writer sweeps the debris (own-pid-dead check only;
        see the sweep comment below). Concurrency: single-writer, lock-
        enforced (``_mor_writer_lock``)."""
        meta = self._mor_meta(name)
        keys = meta["keys"]
        if classes is not None:
            if meta.get("policy") is None:
                raise ValueError(
                    f"mor_upsert({name!r}): per-statement classes require a "
                    "policy table (latest-wins deltas replace rows wholesale)"
                )
            good = {"overwrite", "coalesce", "keep_first"}
            if set(classes) - good:
                raise ValueError(f"unknown class(es): {sorted(set(classes) - good)}")
            named = [c for k in good for c in classes.get(k, ())]
            if len(named) != len(set(named)):
                raise ValueError("a column may appear in only one class")
            missing = set(named) - set(df.columns)
            if missing:
                raise ValueError(f"classes name columns absent from the batch: {sorted(missing)}")
            if set(named) & set(keys):
                raise ValueError("key columns cannot be classified")
        seq = (self.mor_deltas(name) or [0])[-1] + 1
        final = self._mor_dir(name, "delta", str(seq))
        # pid-stamped tmp: defense-in-depth under the writer lock — even a
        # writer that bypasses the lock (older code, operator error) can't
        # have its in-flight dir swept, because the sweep only removes tmp
        # dirs whose stamped owner process is DEAD (plus pre-r11 unstamped
        # ones, which no live writer can own under this code).
        tmp = f"{final}.tmp.{os.getpid()}"
        import glob as _glob
        import shutil

        for stale in _glob.glob(self._mor_dir(name, "delta", "*.tmp*")):
            suffix = stale.rsplit(".tmp", 1)[1]
            pid = int(suffix[1:]) if suffix.startswith(".") and suffix[1:].isdigit() else None
            if pid is not None and pid != os.getpid():
                try:
                    os.kill(pid, 0)  # signal 0: existence probe only
                    continue  # owner alive — never sweep a live writer
                except ProcessLookupError:
                    pass
                except PermissionError:
                    continue  # exists under another uid — leave it
            shutil.rmtree(stale, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        # check the LANDED files, not df's lineage: one cheap key-column
        # scan (column pruning) instead of recomputing an arbitrary plan.
        # Distinct over a STRUCT of the keys: the struct is non-null even
        # when a key field is null, so null-keyed rows count too.
        landed = self.spark.read.parquet(tmp)
        null_key = None
        for k in keys:
            c = F.col(k).isNull()
            null_key = c if null_key is None else (null_key | c)
        checks = landed.agg(
            (
                F.count(F.lit(1))
                - F.count_distinct(F.struct(*[F.col(k) for k in keys]))
            ).alias("d"),
            F.count(F.when(null_key, 1)).alias("nk"),
        ).collect()[0]
        if checks["d"] or checks["nk"]:
            shutil.rmtree(tmp, ignore_errors=True)
            if checks["nk"]:
                # the reference's conflict target is a PRIMARY KEY — null
                # keys can't exist there, and the fold would group them
                # while a sequential COW chain inserts one row per batch
                raise ValueError(
                    f"mor_upsert({name!r}): batch has {checks['nk']} "
                    "null-keyed row(s); delta statements require non-null keys"
                )
            raise ValueError(
                f"mor_upsert({name!r}): batch has {checks['d']} duplicate key "
                "row(s); a delta is a statement (at most one row per key per batch)"
            )
        if classes is not None:
            import json

            with open(os.path.join(tmp, "_CLASSES.json"), "w") as f:
                json.dump({k: sorted(v) for k, v in classes.items() if v}, f)
        os.rename(tmp, final)
        return seq

    def mor_read(self, name: str) -> DataFrame:
        """Merged view over base + delta stack.

        Latest-wins tables (no policy): newer deltas beat older beat base;
        a tombstone suppresses the key. The per-key window runs over DELTA
        rows only (≪ base); the base is filtered by a left-anti join on
        the delta key set — broadcast-able whenever deltas are batch-sized.

        Policy tables: the delta stack folds into one equivalent updates
        frame (``fold_upsert_batches`` — the COALESCE-merge is
        associative, so one window over the delta rows replaces a
        per-delta join chain), then merges onto the base through
        ``merge_upsert_onto`` — the broadcast-shaped twin of the COW
        path's ``merge_upsert``, so the read is bit-identical to having
        applied each batch as a COW merge, without ever shuffling the
        base.

        Mixed statements: when any delta carries a per-statement class
        override (``mor_upsert(classes=...)``) or a partial column set,
        the read dispatches to ``fold_upsert_statements`` /
        ``merge_statements_onto`` — still one window pass over the delta
        rows and one broadcast-shaped base merge, but with the
        (column, statement)-level class resolution the enricher's keyed
        UPDATE needs against the normalize policy."""
        meta = self._mor_meta(name)
        base = self._mor_read_base(name, meta)
        if meta.get("buckets"):
            # the partition column is a layout detail, not table schema
            base = base.select(*self._mor_base_info(name, meta)["columns"])
        seqs = self.mor_deltas(name)
        if not seqs:
            return base
        # Per-run merged-view memo (guide §5, VERDICT r11 #4): a composed
        # DAG run reads the same merged view from several stages (marts,
        # rank, dq, report, publish all read fact_jobs), and every ACTION
        # on a fresh merged plan re-runs the full base scan + delta fold —
        # measured ~5× read amplification per DAG run (SCALING.md r11).
        # The memo key is exact: the delta-seq tuple changes on every
        # upsert, the base stamp on every swap/compaction, so a hit can
        # only serve a view bit-identical to a fresh fold. The value is a
        # LAZY localCheckpoint: first consumer materializes, later ones
        # read the blocks. Intra-TableStore only (runner builds one store
        # per run) — nothing persists across runs. At cluster scale the
        # same seam is a durable checkpoint / persist(DISK) decision;
        # JOBSPARK_MOR_READ_MEMO=0 opts out.
        if os.environ.get("JOBSPARK_MOR_READ_MEMO", "1") == "0":
            return self._mor_apply_deltas(name, meta, base, seqs)
        try:
            base_stamp = os.stat(self._mor_dir(name, "base")).st_mtime_ns
        except OSError:
            return self._mor_apply_deltas(name, meta, base, seqs)
        key = (name, tuple(seqs), base_stamp)
        hit = self._merged_memo.get(key)
        if hit is not None:
            return hit
        # evict superseded entries for this table (older seq/base states
        # can never hit again; dropping the ref lets ContextCleaner free
        # any materialized checkpoint blocks)
        for stale in [k for k in self._merged_memo if k[0] == name]:
            del self._merged_memo[stale]
        merged = self._mor_apply_deltas(name, meta, base, seqs).localCheckpoint(
            eager=False
        )
        self._merged_memo[key] = merged
        return merged

    def _mor_apply_deltas(
        self, name: str, meta: dict, base: DataFrame, seqs: list[int]
    ) -> DataFrame:
        """Resolve the delta stack against ``base`` (the full base for
        reads; a bucket-filtered base for partition-scoped compaction —
        valid because every delta key hashes into the touched buckets)."""
        import json

        keys = meta["keys"]
        policy = meta.get("policy")
        deltas = None
        carried: dict[int, list[str]] = {}  # seq -> data columns the statement carries
        overrides: dict[int, dict] = {}  # seq -> per-statement class overrides
        for s in seqs:
            d = self.spark.read.parquet(self._mor_dir(name, "delta", str(s)))
            carried[s] = [c for c in d.columns if c not in keys and c != "_deleted"]
            side = self._mor_dir(name, "delta", str(s), "_CLASSES.json")
            if os.path.exists(side):
                with open(side) as f:
                    overrides[s] = json.load(f)
            if "_deleted" not in d.columns:
                d = d.withColumn("_deleted", F.lit(False))
            d = d.withColumn("_seq", F.lit(s))
            deltas = d if deltas is None else deltas.unionByName(
                d, allowMissingColumns=True
            )
        if policy is not None:
            from job_etl_spark.operators.merge import (
                fold_upsert_batches,
                fold_upsert_statements,
                merge_statements_onto,
                merge_upsert_onto,
            )

            base_data_cols = [c for c in base.columns if c not in keys]
            uniform = not overrides and all(
                set(cs) == set(base_data_cols) for cs in carried.values()
            )
            if not uniform:
                # mixed statements (per-statement classes and/or partial
                # column sets — e.g. enricher deltas interleaved with
                # normalize deltas): the generalized one-pass fold
                def _cls(c: str, s: int) -> str:
                    ov = overrides.get(s, {})
                    for k in ("overwrite", "coalesce", "keep_first"):
                        if c in ov.get(k, ()):
                            return k
                    for k in ("overwrite", "coalesce", "keep_first"):
                        if c in policy.get(k, ()):
                            return k
                    return "keep_first"  # the unclassified default

                column_classes = {
                    c: {s: _cls(c, s) for s in seqs if c in carried[s]}
                    for c in base_data_cols
                    if any(c in carried[s] for s in seqs)
                }
                framed, reset = fold_upsert_statements(deltas, keys, column_classes)
                survivors = base.join(F.broadcast(reset), list(keys), "left_anti")
                return merge_statements_onto(survivors, framed, keys)

            # anti-join on RESET keys (any tombstone in the stack), not just
            # latest-tombstone keys: a delete-then-revive must insert fresh
            # from the folded frame, never coalesce pre-delete base values
            # into the revived row (the sequential-COW contract).
            folded, reset = fold_upsert_batches(
                deltas, keys, policy["overwrite"], policy["coalesce"]
            )
            survivors = base.join(F.broadcast(reset), list(keys), "left_anti")
            return merge_upsert_onto(
                survivors,
                folded,
                keys,
                overwrite_cols=policy["overwrite"],
                coalesce_cols=policy["coalesce"],
                keep_first_cols=policy["keep_first"],
            )
        w = Window.partitionBy(*keys).orderBy(F.desc("_seq"))
        latest = (
            deltas.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_seq")
        )
        live = latest.where(~F.col("_deleted")).drop("_deleted")
        delta_keys = latest.select(*keys)
        survivors = base.join(F.broadcast(delta_keys), list(keys), "left_anti")
        return survivors.unionByName(live)

    def _mor_swap_base(self, name: str, tmp: str) -> None:
        """Promote a fully-written replacement base and clear the delta
        stack (the replacement was computed FROM the merged view, so the
        deltas are now folded in). Same rename-rename crash contract as
        ``_swap_in``."""
        import shutil

        old = self._mor_dir(name, "base._old")
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(self._mor_dir(name, "base"), old)
        os.rename(tmp, self._mor_dir(name, "base"))
        for s in self.mor_deltas(name):
            shutil.rmtree(self._mor_dir(name, "delta", str(s)), ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        self.spark.catalog.refreshByPath(self._mor_dir(name, "base"))

    def _mor_update_columns(self, name: str, df: DataFrame) -> None:
        """Record a base schema change (a stage-level rewrite may add or
        drop columns); atomic pointer-style _META replace."""
        import json

        meta = self._mor_meta(name)
        schema_json = df.schema.json()
        if meta.get("columns") == list(df.columns) and meta.get("schema") == schema_json:
            return
        meta["columns"] = list(df.columns)
        meta["schema"] = schema_json
        tmp = self._mor_dir(name, "_META.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._mor_dir(name, "_META"))

    def _mor_read_base(self, name: str, meta: dict) -> DataFrame:
        """Base scan under the table's layout. The explicit schema is
        authoritative when present (the in-base ``_SCHEMA.json`` sidecar,
        falling back to _META for pre-sidecar tables): an EMPTY bucketed
        base has no parquet footer to infer from (partitionBy writes no
        files for zero rows), and explicit schemas skip footer inference
        everywhere else. The ``_bucket`` partition column is appended for
        bucketed layouts so compaction can prune on it; plain reads
        select it away."""
        import json as _json

        from pyspark.sql.types import LongType, StructField, StructType

        if meta.get("buckets"):
            self._mor_repair_buckets(name)
        schema_json = self._mor_base_info(name, meta).get("schema")
        if schema_json is None:  # pre-r10 table: infer as before
            return self.spark.read.parquet(self._mor_dir(name, "base"))
        st = StructType.fromJson(_json.loads(schema_json))
        if meta.get("buckets"):
            st = StructType(st.fields + [StructField("_bucket", LongType())])
        return self.spark.read.schema(st).parquet(self._mor_dir(name, "base"))

    def mor_compact(self, name: str) -> int:
        """Single-writer-locked entry point for ``_mor_compact_locked``
        (the concurrency contract lives on ``_mor_writer_lock``)."""
        with self._mor_writer_lock(name):
            return self._mor_compact_locked(name)

    def _mor_compact_locked(self, name: str) -> int:
        """Fold the delta stack into the base; returns the number of
        deltas folded. Readers before the swap see the old base+deltas,
        after it the new base — both are the same merged view.

        Flat tables rewrite the whole base (temp-dir + atomic swap, same
        crash contract as rewrite()). BUCKETED tables rewrite ONLY the
        buckets the delta keys hash into — at 100 TB an amortized full
        rewrite is the dominant write cost, while touched buckets track
        the delta key set, not the table. The per-bucket swap is
        rename-away → rename-in with dot-prefixed backups; a crash at any
        point is repaired by ``_mor_repair_buckets`` (run before every
        read), and because each delta is a merge STATEMENT the fold is
        idempotent over its own result — re-applying the surviving deltas
        to an already-compacted bucket reproduces the same rows.

        Concurrency contract (matches the enrich-stage ordering comment
        for the flat path): compaction is CRASH-safe but not concurrent-
        READER-safe — between a bucket's rename-away and rename-in a plan
        built at that instant sees the bucket missing, and the delta dirs
        are removed while a plan built before the compaction may still
        list them. Run compaction only from the single writer, ordered
        strictly after any same-process reads have executed (the DAG's
        stage ordering guarantees this; ad-hoc readers must not overlap a
        compaction). Cross-process mutual exclusion of WRITERS is
        enforced by ``_mor_writer_lock``; reader fencing at 100 TB is the
        snapshot-isolation seam a Delta/Iceberg commit log would fill."""
        seqs = self.mor_deltas(name)
        if not seqs:
            return 0
        meta = self._mor_meta(name)
        if not meta.get("buckets"):
            merged = self.mor_read(name)
            tmp = self._mor_dir(name, "base._tmp")
            merged.write.mode("overwrite").parquet(tmp)
            self.spark.catalog.refreshByPath(tmp)
            self._mor_swap_base(name, tmp)
            return len(seqs)

        import shutil

        self._mor_repair_buckets(name)
        keys = meta["keys"]
        # touched buckets = hash of every delta key (tombstones included);
        # the collect is bounded by the bucket count, never by data size
        dk = None
        for s in seqs:
            d = self.spark.read.parquet(self._mor_dir(name, "delta", str(s))).select(*keys)
            dk = d if dk is None else dk.unionByName(d)
        touched = sorted(
            r["b"]
            for r in dk.select(self._mor_bucket_expr(meta).alias("b"))
            .distinct()
            .collect()
        )
        # merged view restricted to the touched buckets: every delta key
        # hashes into one of them, so the full delta stack applies cleanly
        # to the filtered base and untouched buckets need no work at all
        base = self._mor_read_base(name, meta)
        base = base.where(F.col("_bucket").isin([int(b) for b in touched])).select(
            *self._mor_base_info(name, meta)["columns"]
        )
        merged = self._mor_apply_deltas(name, meta, base, seqs)
        tmp = self._mor_dir(name, "base._tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            merged.withColumn("_bucket", self._mor_bucket_expr(meta))
            .repartition(max(len(touched), 1), F.col("_bucket"))
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(tmp)
        )
        for b in touched:
            live = self._mor_dir(name, "base", f"_bucket={b}")
            old = self._mor_dir(name, "base", f"._old_bucket={b}")
            new = os.path.join(tmp, f"_bucket={b}")
            shutil.rmtree(old, ignore_errors=True)
            if os.path.exists(live):
                os.rename(live, old)
            if os.path.exists(new):  # a bucket whose rows all died has no dir
                os.rename(new, live)
            shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        for s in seqs:
            shutil.rmtree(self._mor_dir(name, "delta", str(s)), ignore_errors=True)
        self.spark.catalog.refreshByPath(self._mor_dir(name, "base"))
        return len(seqs)


def run_extract(
    store: TableStore, adapter: SourceAdapter, max_jobs: int | None = None, run_ts=None
) -> dict:
    run_ts = run_ts or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    jobs = adapter.fetch_all(max_jobs=max_jobs)
    raw_df = land_raw(store.spark, jobs, run_ts)
    store.write("raw_job_postings", raw_df, mode="append")
    return {"extracted_count": len(jobs), "source": adapter.source_name}


def run_normalize(
    store: TableStore,
    adapter: SourceAdapter,
    min_collected_at=None,
    limit: int | None = None,
    dry_run: bool = False,
    run_ts=None,
    mor: bool = False,
    compact_every: int = 16,
    mor_buckets: int | None = None,
) -> dict:
    """S5 scan (+watermark) → U3/U2 → J3 merge. Exit-code semantics via
    'rejected' in the stats dict (main.py:289-354).

    Write-back strategy follows the COW/MOR decision rule (COVERAGE.md
    "Choosing COW vs MOR"). Default COW: full-outer COALESCE merge + full
    staging rewrite — O(staging table) per batch, the write amplification
    the r7 soak measured (COW p50 tracks table size; MOR stays flat).
    ``mor=True`` is the 100 TB path: the normalized batch lands as ONE
    merge-on-read delta — O(batch) per run — and reads fold the delta
    stack through the SAME per-column policy (``staging_merge_policy``,
    recorded in the table's _META at migration), so ``store.read`` of
    either layout is bit-identical (pinned by test_pipeline_e2e +
    randomized fold-parity tests). First ``mor=True`` call migrates the
    COW files into the MOR layout. ``compact_every`` bounds the delta
    chain: once that many deltas accumulate, the run folds them into a
    new base (same knob as the streaming twin's ``compact_every``) —
    read-side fan-in stays O(compact_every), write cost stays O(batch)
    for every run except the 1-in-N compaction."""
    run_ts = run_ts or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    raw = store.read("raw_job_postings")
    if min_collected_at is not None:
        raw = raw.where(F.col("collected_at") >= F.lit(min_collected_at))
    if limit:
        raw = raw.orderBy(F.desc("collected_at"), F.asc("raw_id")).limit(limit)
    common = common_from_raw(raw, adapter)
    res = normalize_common(common, run_ts)
    # the batch plan is executed twice (row count for the stats/exit-code
    # contract, then the write) — pin it so the raw scan + normalize
    # expressions run once, not per action
    normalized = res.normalized.persist()
    # try/finally: mor_upsert can raise (duplicate/null keys) — the cached
    # blocks must not outlive the stage on the error path
    try:
        n_ok = normalized.count()
        n_bad = res.rejected.count()
        if not dry_run:
            if mor:
                from job_etl_spark.pipeline.normalize import staging_merge_policy

                if not store.mor_exists("staging_job_postings"):
                    store.mor_init(
                        "staging_job_postings",
                        store.read("staging_job_postings", STAGING_SCHEMA),
                        ["hash_key"],
                        policy=staging_merge_policy(),
                        buckets=mor_buckets,
                    )
                if n_ok:  # an empty batch must not grow the delta chain
                    store.mor_upsert("staging_job_postings", normalized)
                    if compact_every and len(
                        store.mor_deltas("staging_job_postings")
                    ) >= compact_every:
                        store.mor_compact("staging_job_postings")
            else:
                staging = store.read("staging_job_postings", STAGING_SCHEMA)
                merged = merge_into_staging(staging, normalized)
                store.rewrite("staging_job_postings", merged)
    finally:
        normalized.unpersist()
    return {"normalized": n_ok, "rejected": n_bad, "dry_run": dry_run}


def run_enrich(
    store: TableStore,
    dictionary_path: str | None = None,
    sources: list[str] | None = None,
    include_existing: bool = False,
    dry_run: bool = False,
    run_ts=None,
    mor: bool = False,
    compact_every: int = 16,
    mor_buckets: int | None = None,
) -> dict:
    """S6/S7 scans → U4/U5 → J6 write-back.

    Write-back strategy follows the COW/MOR decision rule (COVERAGE.md
    "Choosing COW vs MOR"). Default COW: full-table withColumn stages +
    staging rewrite — O(table) per enrich run. ``mor=True`` is the 100 TB
    path and matches the reference's ACTUAL shape — its enricher is a
    keyed point-UPDATE of the PENDING rows only (S6/S7 select the pending
    subset, services/enricher/db_operations.py:140-176,244-282): compute
    skills/seniority for the pending subset and land it as ONE
    merge-on-read delta carrying just (hash_key, skills_raw,
    seniority_level, seniority_enrichment_status) with OVERWRITE
    per-statement classes — the staging policy keeps those columns
    keep-first for normalize statements, so the delta's _CLASSES sidecar
    overrides them for this statement only. Write cost O(pending), never
    O(table); the read folds mixed normalize/enrich statements through
    ``fold_upsert_statements`` bit-identically to the COW chain."""
    run_ts = run_ts or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    # a dry run must not mutate ANYTHING, the layout included
    if mor and not dry_run and not store.mor_exists("staging_job_postings"):
        from job_etl_spark.pipeline.normalize import staging_merge_policy

        store.mor_init(
            "staging_job_postings",
            store.read("staging_job_postings", STAGING_SCHEMA),
            ["hash_key"],
            policy=staging_merge_policy(),
            buckets=mor_buckets,
        )
    staging = store.read("staging_job_postings", STAGING_SCHEMA)
    dictionary = SkillsDictionary.load(dictionary_path)
    pending_rows = None
    # try/finally: mor_upsert can raise (duplicate/null keys) — the cached
    # pending subset must not outlive the stage on the error path
    try:
        if mor:
            # the pending subset: exactly the rows either enrichment phase
            # would touch (S6 skills predicate ∪ S7 seniority-pending).
            # Materialize it ONCE — the before_pending stat, the enrich
            # expressions, the delta count, and the delta write all run over
            # the pinned subset instead of re-scanning the table per action
            # (the probe showed the stat scan costing as much as the write
            # savings at 3M rows).
            skills_cond = F.col("description").isNotNull()
            if not include_existing:
                skills_cond = skills_cond & (
                    F.col("skills_raw").isNull() | (F.size("skills_raw") == 0)
                )
            if sources:
                skills_cond = skills_cond & F.col("source").isin(sources)
            pending_rows = staging.where(
                skills_cond | (F.col("seniority_enrichment_status") == "not_tried")
            ).persist()
            before_pending = pending_rows.where(
                F.col("seniority_enrichment_status") == "not_tried"
            ).count()
            enriched = enrich_skills(pending_rows, dictionary, sources, include_existing)
            enriched = enrich_seniority(enriched)
        else:
            before_pending = staging.where(
                F.col("seniority_enrichment_status") == "not_tried"
            ).count()
            enriched = enrich_skills(staging, dictionary, sources, include_existing)
            enriched = enrich_seniority(enriched)
        from job_etl_spark.schema import StructType  # noqa: F401

        companies_schema = (
            "company_id string, name string, source_first_seen string, "
            "enriched_at timestamp, created_at timestamp, updated_at timestamp"
        )
        companies = store.read("staging_companies", companies_schema)
        # company seeding scans ALL distinct staging companies (J4 over the
        # whole table), not just the pending rows — in MOR mode `enriched` is
        # pending-only, so seed from the full merged view
        companies2 = seed_company_records(companies, staging if mor else enriched, run_ts)
        stats = {
            "seniority_pending_before": before_pending,
            "dry_run": dry_run,
        }
        # company enrichment sub-phase (U6/J5/S13): runs when a cached
        # candidates table exists (offline snapshot of per-name API results);
        # matched + unmatched pending rows both get enriched_at stamped
        if store.exists("company_candidates"):
            from job_etl_spark.pipeline.company_match import (
                apply_company_matches,
                match_companies,
            )

            candidates = store.read("company_candidates")
            matches = match_companies(companies2, candidates)
            n_matched = matches.where(F.col("candidate_name").isNotNull()).count()
            stats["companies_matched"] = n_matched
            companies2 = apply_company_matches(companies2, matches, run_ts)
        if not dry_run:
            if mor:
                # O(pending) delta: keys + the three enricher-owned columns,
                # OVERWRITE per-statement classes (the table policy keeps them
                # keep-first for normalize statements). Empty pending must not
                # grow the delta chain.
                # (count + write both run over the pinned pending subset)
                delta = enriched.select(
                    "hash_key",
                    "skills_raw",
                    "seniority_level",
                    "seniority_enrichment_status",
                )
                n_pending = delta.count()
                stats["enriched_rows"] = n_pending
                if n_pending:
                    store.mor_upsert(
                        "staging_job_postings",
                        delta,
                        classes={
                            "overwrite": [
                                "skills_raw",
                                "seniority_level",
                                "seniority_enrichment_status",
                            ]
                        },
                    )
                # companies2's plan reads the staging view lazily, but a delta
                # APPEND never invalidates already-listed files — only the
                # 1-in-N compaction swaps the base, so compact strictly last
                store.rewrite("staging_companies", companies2)
                stats["companies_total"] = store.read("staging_companies").count()
                if compact_every and len(
                    store.mor_deltas("staging_job_postings")
                ) >= compact_every:
                    store.mor_compact("staging_job_postings")
            else:
                # companies2's plan reads staging; two-phase swap avoids reading
                # files deleted by the staging rewrite
                store.rewrite_many(
                    {"staging_job_postings": enriched, "staging_companies": companies2}
                )
                stats["companies_total"] = store.read("staging_companies").count()
        return stats
    finally:
        if pending_rows is not None:
            pending_rows.unpersist()


def _ensure_fact_mor(store: TableStore, buckets: int | None) -> None:
    """One shared fact_jobs MOR table spec for every writer (marts
    increment + rank write-back): keyed on hash_key under
    ``fact_merge_policy`` — data columns overwrite, the rank pair
    coalesces (the J2 carry). A table migrated latest-wins by pre-r11
    code is upgraded in place (compact-then-set-policy), so a marts
    delta with NULL rank columns can never be resolved wholesale and
    silently null out landed scores."""
    from job_etl_spark.pipeline.marts import fact_merge_policy

    if not store.mor_exists("fact_jobs"):
        store.mor_init(
            "fact_jobs",
            store.read("fact_jobs"),
            ["hash_key"],
            policy=fact_merge_policy(),
            buckets=buckets,
        )
    elif store._mor_meta("fact_jobs").get("policy") is None:
        store.mor_set_policy("fact_jobs", fact_merge_policy())


def run_marts(
    store: TableStore,
    run_ts=None,
    mor: bool = False,
    mor_buckets: int | None = None,
    compact_every: int = 16,
) -> dict:
    """Marts stage: the two dbt models (dim_companies SCD1, fact_jobs
    incremental + rank carry).

    Write-back strategy follows the COW/MOR decision rule (COVERAGE.md
    "Choosing COW vs MOR"). Default COW: rebuild-and-rewrite both marts
    — O(table) per run even when the watermark admits zero rows, the
    write amplification the dbt full-refresh model pays. ``mor=True`` is
    the 100 TB path and matches the dbt INCREMENTAL semantics the models
    declare (``fact_jobs.sql:23-31``, ``dim_companies.sql:38-44``): the
    increment past each watermark lands as ONE merge-on-read delta —
    O(new rows) per run, a no-op run touches no base file —

    - fact_jobs: ``fact_increment`` rows (NULL rank columns) under
      ``fact_merge_policy`` — the fold's COALESCE on the rank pair IS
      the J2 rank carry, so the COW self-join disappears;
    - dim_companies: latest-wins keyed on company_id; the delta is the
      rows past the created_at watermark (every dim attribute is
      immutable post-seed — company_id is a function of the name — so
      the created_at watermark is exact, not approximate).

    First ``mor=True`` call migrates COW marts into the MOR layout;
    ``compact_every`` bounds the fact delta chain as in the other
    stages. Both layouts read bit-identically through ``store.read``
    (dual-mode parity test)."""
    run_ts = run_ts or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    staging = store.read("staging_job_postings", STAGING_SCHEMA)
    companies = store.read(
        "staging_companies",
        "company_id string, name string, source_first_seen string, "
        "enriched_at timestamp, created_at timestamp, updated_at timestamp",
    )
    if mor:
        return _run_marts_mor(
            store, staging, companies, run_ts, mor_buckets, compact_every
        )
    existing_fact = store.read("fact_jobs") if store.exists("fact_jobs") else None
    dim = build_dim_companies(companies, None)
    fact = build_fact_jobs(staging, existing_fact, run_ts)
    store.rewrite("dim_companies", dim)
    store.rewrite("fact_jobs", fact)
    return {"dim_rows": store.read("dim_companies").count(), "fact_rows": store.read("fact_jobs").count()}


def _run_marts_mor(
    store: TableStore,
    staging: DataFrame,
    companies: DataFrame,
    run_ts,
    mor_buckets: int | None,
    compact_every: int,
) -> dict:
    from job_etl_spark.operators.watermark import high_watermark
    from job_etl_spark.pipeline.marts import fact_increment, fact_merge_policy

    stats: dict = {}
    # -- dim_companies: latest-wins deltas past the created_at watermark.
    # The COW build is a stateless projection of staging_companies, so
    # migration and first build share one init frame. Dimension-sized →
    # flat base (no buckets).
    if not store.mor_exists("dim_companies"):
        store.mor_init(
            "dim_companies", build_dim_companies(companies, None), ["company_id"]
        )
        stats["dim_new"] = None  # init run: the whole projection is the base
    else:
        wm = high_watermark(store.read("dim_companies"), "created_at")
        fresh = build_dim_companies(companies, None)
        if wm is not None:
            fresh = fresh.where(F.col("created_at") > F.lit(wm))
        fresh = fresh.persist()  # count + delta write: one execution
        try:
            n_dim = fresh.count()
            stats["dim_new"] = n_dim
            if n_dim:  # an empty increment must not grow the delta chain
                store.mor_upsert("dim_companies", fresh)
        finally:
            fresh.unpersist()
    # -- fact_jobs: the increment as ONE delta under fact_merge_policy
    # (rank carry via the fold's COALESCE — no self-join, no base write)
    had_fact = store.exists("fact_jobs")
    if not store.mor_exists("fact_jobs") and not had_fact:
        # first build: the full projection IS the base
        store.mor_init(
            "fact_jobs",
            fact_increment(staging, None, run_ts),
            ["hash_key"],
            policy=fact_merge_policy(),
            buckets=mor_buckets,
        )
        stats["fact_new"] = None
    else:
        _ensure_fact_mor(store, mor_buckets)  # migrate/upgrade if needed
        existing = store.read("fact_jobs")
        inc = fact_increment(staging, existing, run_ts).persist()
        try:
            n_fact = inc.count()
            stats["fact_new"] = n_fact
            if n_fact:
                store.mor_upsert("fact_jobs", inc)
        finally:
            inc.unpersist()
        if compact_every and len(store.mor_deltas("fact_jobs")) >= compact_every:
            store.mor_compact("fact_jobs")
    stats["dim_rows"] = store.read("dim_companies").count()
    stats["fact_rows"] = store.read("fact_jobs").count()
    return stats


def run_rank(
    store: TableStore,
    config: RankingConfig | None = None,
    rank_all: bool = False,
    min_ingested_at=None,
    limit: int | None = None,
    dry_run: bool = False,
    mor: bool = False,
    mor_buckets: int | None = None,
) -> dict:
    """Rank unranked fact rows and write the scores back.

    Write-back strategy follows the COW/MOR decision rule (COVERAGE.md
    "Choosing COW vs MOR"): the default COW path rewrites the whole fact
    table — O(table) per run, fine while fact_jobs is dimension-sized.
    ``mor=True`` is the fact-sized path: the ranked rows land as ONE
    merge-on-read delta (``TableStore.mor_upsert``) and the rewrite is
    deferred to ``mor_compact`` on its own schedule — write cost O(ranked
    batch), never O(table). The r7 stream soak measured exactly this gap:
    COW merge p50 tracks table size (684→907 ms across a 10× seed) while
    MOR stays flat (464→507 ms); see ``streaming/pipeline.py::
    foreach_batch_mor`` for the streaming twin of this path. First
    ``mor=True`` call migrates the COW files into the MOR layout.
    """
    cfg = config or RankingConfig()
    # a dry run must not mutate ANYTHING, the layout included
    if mor and not dry_run:
        _ensure_fact_mor(store, mor_buckets)
    fact = store.read("fact_jobs")  # MOR-aware: merged view either way
    target = F.lit(True) if rank_all else F.col("rank_score").isNull()
    if min_ingested_at is not None and not rank_all:
        target = target & (F.col("ingested_at") >= F.lit(min_ingested_at))
    to_rank = fact.where(target)
    if limit:
        to_rank = to_rank.orderBy(F.desc("ingested_at"), F.asc("hash_key")).limit(limit)
    # count + write(s) re-execute the scoring plan otherwise (the COW arm
    # reads it twice more: key anti-join + the union) — pin it once
    ranked = rank_jobs(to_rank, None, cfg).persist()
    # try/finally: mor_upsert can raise (duplicate/null keys) — the cached
    # ranked batch must not outlive the stage on the error path
    try:
        n = ranked.count()
        if not dry_run:
            if mor:
                if n:  # an empty batch must not grow the delta chain
                    store.mor_upsert("fact_jobs", ranked.select(*fact.columns))
            else:
                untouched = fact.join(
                    ranked.select("hash_key"), "hash_key", "left_anti"
                )
                store.rewrite(
                    "fact_jobs", untouched.unionByName(ranked.select(*fact.columns))
                )
        if dry_run:
            stats = {}
        else:
            # store.read is MOR-aware, so downstream stages and these stats
            # see the merged view regardless of write-back strategy
            stats = report_mod.ranking_stats(store.read("fact_jobs"))
        return {"ranked_now": n, "dry_run": dry_run, **stats}
    finally:
        ranked.unpersist()


def run_dq(store: TableStore) -> list[dq.DQResult]:
    """dbt-test equivalents over the marts (schema.yml parity)."""
    fact = store.read("fact_jobs")
    dim = store.read("dim_companies")
    checks = {
        "fact_jobs.hash_key.unique": dq.check_unique(fact, ["hash_key"]),
        "fact_jobs.hash_key.not_null": dq.check_not_null(fact, "hash_key"),
        "fact_jobs.remote_type.accepted": dq.check_accepted_values(
            fact, "remote_type", VALID_REMOTE_TYPES
        ),
        "fact_jobs.contract_type.accepted": dq.check_accepted_values(
            fact, "contract_type", VALID_CONTRACT_TYPES
        ),
        "fact_jobs.seniority_level.accepted": dq.check_accepted_values(
            fact, "seniority_level", VALID_SENIORITY_LEVELS
        ),
        "dim_companies.company_id.unique": dq.check_unique(dim, ["company_id"]),
        "fact_jobs.company_id.relationship": dq.check_relationships(
            fact, "company_id", dim, "company_id"
        ),
    }
    return dq.run_checks(checks)


def run_dedupe_report(store: TableStore) -> dict:
    """The reference's ``dedupe_consolidate`` DAG task is a placeholder
    echo (`airflow/dags/jobs_etl_daily.py:1624-1640` — exact dedup already
    happened in the hash-key merge). Here the stage earns its place:
    MinHash-LSH near-dup candidates over staging descriptions, clustered
    by connected components — surfacing postings that hash-key identity
    (company|title|location) treats as distinct but whose text is a
    near-copy (cross-company reposts, template spam)."""
    from job_etl_spark.ml.cluster import connected_components
    from job_etl_spark.ml.dedup import minhash_lsh_candidates

    staging = store.read("staging_job_postings").where(
        F.col("description").isNotNull()
    )
    pairs = minhash_lsh_candidates(staging, "hash_key", "description")
    n_pairs = pairs.count()
    if n_pairs == 0:
        return {"near_dup_pairs": 0, "near_dup_clusters": 0, "docs_in_clusters": 0}
    cc = connected_components(pairs)
    per_cluster = cc.groupBy("cluster_id").count()
    agg = per_cluster.agg(
        F.count(F.lit(1)).alias("clusters"), F.sum("count").alias("docs")
    ).first()
    return {
        "near_dup_pairs": n_pairs,
        "near_dup_clusters": agg["clusters"],
        "docs_in_clusters": agg["docs"],
    }


def run_pipeline(
    spark: SparkSession,
    warehouse: str | None = None,
    num_jobs: int = 100,
    run_ts=None,
    mor: bool = False,
    mor_buckets: int | None = None,
) -> dict:
    """The full DAG slice on the mock source — SURVEY.md §7.1's 'one real
    query' end-to-end. ``mor=True`` runs every mutable write-back
    (normalize/enrich/rank) through the merge-on-read layout — the 100 TB
    configuration — with ``mor_buckets`` selecting the bucketed base."""
    warehouse = warehouse or tempfile.mkdtemp(prefix="jobspark_wh_")
    run_ts = run_ts or dt.datetime(2026, 1, 1, 7, 0, 0)
    store = TableStore(spark, warehouse)
    adapter = MockAdapter(num_jobs=num_jobs)
    stats: dict = {"warehouse": warehouse}
    stats["extract"] = run_extract(store, adapter, run_ts=run_ts)
    stats["normalize"] = run_normalize(
        store, adapter, run_ts=run_ts, mor=mor, mor_buckets=mor_buckets
    )
    stats["enrich"] = run_enrich(store, run_ts=run_ts, mor=mor, mor_buckets=mor_buckets)
    stats["marts"] = run_marts(store, run_ts=run_ts, mor=mor, mor_buckets=mor_buckets)
    stats["dedupe"] = run_dedupe_report(store)
    stats["rank"] = run_rank(store, RankingConfig(), mor=mor, mor_buckets=mor_buckets)
    stats["dq"] = {r.name: r.violations for r in run_dq(store)}
    digest = report_mod.daily_digest(store.read("fact_jobs"), store.read("dim_companies"))
    stats["digest_unique_jobs"] = digest["unique_jobs"]
    stats["digest_top"] = [r["hash_key"] for r in digest["top_jobs"][:5]]
    # S12 notify: dry-run by default (no SMTP in this environment); failures
    # never fail the pipeline, matching the reference's all_done semantics
    from job_etl_spark.pipeline.notifier import send_digest

    notify = send_digest(
        "jobspark daily digest",
        {k: v for k, v in stats.items() if isinstance(v, (int, str))},
        digest["top_jobs"],
        dry_run=True,
    )
    stats["notify"] = {k: notify[k] for k in ("sent", "n_top", "error")}
    return stats


def run_publish(store: TableStore, out_dir: str) -> dict:
    """S11 stage: capped export of both mart tables
    (reference CLI surface ``services/publisher_hyper/main.py:18-22``)."""
    from job_etl_spark.pipeline import report as report_mod

    fact = store.read("fact_jobs")
    dim = store.read("dim_companies")
    return report_mod.export_tables(fact, dim, out_dir)


def run_notify(
    subject: str, text: str, html: str | None = None, metadata: str | None = None,
    dry_run: bool = True,
) -> dict:
    """S12 stage: standalone message send (reference CLI surface
    ``services/notifier/main.py:32-55`` — --subject --text [--html
    --metadata]); metadata is appended to the text body."""
    from job_etl_spark.pipeline.notifier import send_message

    body = text
    if metadata:
        meta = json.loads(metadata)
        if not isinstance(meta, dict):
            raise ValueError("--metadata must be a JSON object")
        body += "\n\n" + "\n".join(f"- {k}: {v}" for k, v in meta.items())
    return send_message(subject, body, html, dry_run=dry_run)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="jobspark", description="jobspark pipeline CLI")
    parser.add_argument(
        "stage",
        choices=[
            "pipeline", "extract", "normalize", "enrich", "marts", "rank",
            "dq", "publish", "notify", "query",
        ],
    )
    parser.add_argument(
        "name", nargs="?", default=None,
        help="query stage: declared query name (or unique prefix, e.g. q29)",
    )
    parser.add_argument("--sf", default="/root/testdata/sf0.01", help="query stage: table dir")
    parser.add_argument("--explain", action="store_true", help="query stage: print the physical plan")
    parser.add_argument("--max-rows", type=int, default=100, help="query stage: output row cap")
    parser.add_argument("--warehouse", default=None)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--num-jobs", type=int, default=100)
    parser.add_argument("--dictionary-path", default=None)
    parser.add_argument("--config", default=None, help="ranking.yml path")
    parser.add_argument("--source", action="append", default=None)
    parser.add_argument("--all", action="store_true", help="re-rank everything")
    parser.add_argument(
        "--mor",
        action="store_true",
        help="rank/normalize/enrich/marts stage: land the write-back as a "
        "merge-on-read delta instead of a table rewrite (fact-sized tables; "
        "COVERAGE.md 'Choosing COW vs MOR')",
    )
    parser.add_argument(
        "--mor-buckets",
        type=int,
        default=None,
        help="with --mor: hash-bucket the base into N stable dirs at "
        "migration so compaction rewrites only delta-touched buckets "
        "(table-lifetime layout; pick N so a bucket is a few GB at scale)",
    )
    parser.add_argument("--include-existing", action="store_true")
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument(
        "--min-collected-at",
        default=None,
        help="normalize watermark (ISO timestamp): only raw rows collected at/after",
    )
    parser.add_argument("--output-dir", default=None, help="publish export dir")
    parser.add_argument("--subject", default=None, help="notify subject")
    parser.add_argument("--text", default=None, help="notify text body")
    parser.add_argument("--html", default=None, help="notify html body")
    parser.add_argument("--metadata", default=None, help="notify metadata JSON")
    args = parser.parse_args(argv)

    if args.stage == "notify":
        # driver-side only — no SparkSession needed
        if not args.subject or args.text is None:
            print(json.dumps({"error": "--subject and --text required"}), file=sys.stderr)
            return 2
        try:
            stats = run_notify(
                args.subject, args.text, args.html, args.metadata,
                dry_run=True,  # no SMTP in this environment; flag-gated later
            )
        except KeyboardInterrupt:
            return 130
        except ValueError as e:
            print(json.dumps({"error": f"bad --metadata: {e}"}), file=sys.stderr)
            return 2
        print(json.dumps(stats, default=str))
        return 0

    from job_etl_spark.session import get_spark

    spark = get_spark("jobspark-cli")
    if not args.verbose:
        spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.stage == "query":
            # ad-hoc access to the declared inventory: run any query by
            # name (or unique prefix) against a table dir — the "switch
            # from the reference and run what you ran today" surface
            from job_etl_spark.queries import registry

            reg = registry()
            matches = (
                [args.name] if args.name in reg
                else [n for n in sorted(reg) if args.name and n.startswith(args.name)]
            )
            if len(matches) != 1:
                print(
                    json.dumps(
                        {
                            "error": f"{args.name!r} matches {len(matches)} queries",
                            "candidates": matches[:10],
                        }
                    ),
                    file=sys.stderr,
                )
                return 2
            df = reg[matches[0]].fn(spark, args.sf)
            if args.explain:
                print(df._jdf.queryExecution().executedPlan().toString())
            for row in df.limit(args.max_rows).collect():
                print(json.dumps(row.asDict(), default=str))
            return 0
        if args.stage == "pipeline":
            stats = run_pipeline(
                spark, args.warehouse, num_jobs=args.num_jobs,
                mor=args.mor, mor_buckets=args.mor_buckets,
            )
        else:
            if not args.warehouse:
                print(json.dumps({"error": "--warehouse required"}), file=sys.stderr)
                return 2
            store = TableStore(spark, args.warehouse)
            if args.stage == "extract":
                stats = run_extract(store, MockAdapter(num_jobs=args.num_jobs))
            elif args.stage == "marts":
                stats = run_marts(store, mor=args.mor, mor_buckets=args.mor_buckets)
            elif args.stage == "normalize":
                import datetime as _dt

                wm = (
                    _dt.datetime.fromisoformat(args.min_collected_at)
                    if args.min_collected_at
                    else None
                )
                stats = run_normalize(
                    store, MockAdapter(), limit=args.limit, dry_run=args.dry_run,
                    min_collected_at=wm, mor=args.mor, mor_buckets=args.mor_buckets,
                )
            elif args.stage == "enrich":
                stats = run_enrich(
                    store,
                    args.dictionary_path,
                    args.source,
                    args.include_existing,
                    args.dry_run,
                    mor=args.mor,
                    mor_buckets=args.mor_buckets,
                )
            elif args.stage == "rank":
                cfg = RankingConfig.load(args.config) if args.config else RankingConfig()
                stats = run_rank(store, cfg, rank_all=args.all, limit=args.limit,
                                 dry_run=args.dry_run, mor=args.mor,
                                 mor_buckets=args.mor_buckets)
            elif args.stage == "publish":
                if not args.output_dir:
                    print(json.dumps({"error": "--output-dir required"}), file=sys.stderr)
                    return 2
                stats = run_publish(store, args.output_dir)
            else:
                results = run_dq(store)
                stats = {r.name: r.violations for r in results}
                print(json.dumps(stats, default=str))
                return 0 if all(r.passed for r in results) else 1
        print(json.dumps(stats, default=str))
        rejected = stats.get("normalize", stats).get("rejected", 0) if isinstance(stats, dict) else 0
        return 1 if rejected else 0
    except FileNotFoundError as e:
        print(json.dumps({"error": f"missing table: {e}"}), file=sys.stderr)
        return 2
    except KeyboardInterrupt:
        # SIGINT exit contract (reference: services/normalizer/main.py:289-354)
        return 130
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
