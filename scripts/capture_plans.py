"""Capture .explain("formatted") for headline queries into plans/<tag>/.

Usage: python scripts/capture_plans.py --tag r11 --suffix before [--sf DIR] [queries...]

Writes plans/<tag>/<query>_<suffix>.txt and prints a one-line shape audit
per query: #Exchange, join strategies, #BatchEvalPython/ArrowEvalPython,
scan PushedFilters presence. With no query args, captures the whole
bench HEADLINE set.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r11")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from bench import HEADLINE
    from job_etl_spark.queries import registry
    from job_etl_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    names = args.queries or HEADLINE
    outdir = Path(__file__).resolve().parents[1] / "plans" / args.tag
    outdir.mkdir(parents=True, exist_ok=True)

    for prefix in names:
        from _resolve import resolve_query

        name = resolve_query(reg, prefix)
        try:
            df = reg[name].fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:  # noqa: BLE001 - audit tool; report and move on
            print(f"{name}: ERROR {e}")
            continue
        (outdir / f"{name}_{args.suffix}.txt").write_text(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan)))
        n_py = len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)", plan))
        pushed = "pushed" if re.search(r"PushedFilters: \[[^\]]", plan) else "nopush"
        print(f"{name}: exch={n_ex} joins={','.join(joins) or '-'} py={n_py} {pushed}")
    spark.stop()


if __name__ == "__main__":
    main()
