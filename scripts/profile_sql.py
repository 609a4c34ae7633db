"""Per-operator metrics for one query execution (UI REST /sql endpoint).

Usage: python scripts/profile_sql.py q122 [--sf DIR]
Prints each physical node with its key metrics (rows, time) for the
LAST execution of the query — maps wall-clock to operators when the
stage view is ambiguous.
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import os

    from pyspark.sql import SparkSession

    from job_etl_spark.queries import registry
    from job_etl_spark.session import _default_driver_mem

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("jobspark-profile-sql")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", os.environ.get("JOBSPARK_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("JOBSPARK_DRIVER_MEM") or _default_driver_mem())
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    from _resolve import resolve_query

    name = resolve_query(reg, args.query)
    for _ in range(2):
        reg[name].fn(spark, args.sf).write.format("noop").mode("overwrite").save()

    base = "http://localhost:4040/api/v1"
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/applications/{app_id}/sql?details=true&planDescription=false&length=200",
        timeout=20,
    ) as r:
        execs = json.loads(r.read())
    ex = max((e for e in execs if e.get("nodes")), key=lambda e: e["id"])
    print(f"execution {ex['id']}: duration {ex['duration']} ms, status {ex['status']}")
    for node in ex["nodes"]:
        mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
        keep = {
            k: v
            for k, v in mets.items()
            if any(s in k for s in ("time", "rows", "build", "collect"))
        }
        if keep:
            print(f"  [{node['nodeId']:>3}] {node['nodeName'][:45]:45} {keep}")
    spark.stop()


if __name__ == "__main__":
    main()
