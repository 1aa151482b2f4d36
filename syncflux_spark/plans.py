"""Plan audit tooling: the scale properties this engine claims
(SCALE.md, tests/test_plans.py) extracted from any registry query's
physical plan as a machine-readable report.

Usage::

    python -m syncflux_spark.plans q6_revenue_forecast ts_scan_range
    python -m syncflux_spark.plans --all          # summary over registry

The report is the development loop the 100 TB design discipline runs
on: before an operator ships, its exchanges / broadcasts / Python
stages / pushed filters are READ, not guessed. tests/test_plans.py
pins the conclusions; this module is the interactive form.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession


def plan_text(spark: SparkSession, sf_dir: str, name: str) -> str:
    from syncflux_spark import queries as q

    df = q.REGISTRY[name].spark(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def plan_report(spark: SparkSession, sf_dir: str, name: str) -> dict:
    """Structured audit of one registry query's physical plan:
    exchange / join / aggregate / generator counts, Python stage and
    cartesian flags, scans with their pushed filters, and codegen
    stage count. Every field is derived from the executedPlan text —
    the same evidence the plan tests assert on."""
    plan = plan_text(spark, sf_dir, name)
    scans = []
    for ln in plan.splitlines():
        if "FileScan" in ln:
            m = re.search(r"FileScan (\w+)", ln)
            fmt = m.group(1) if m else "?"
            pushed = "PushedFilters: [" in ln and not re.search(
                r"PushedFilters: \[\s*\]", ln
            )
            partf = "PartitionFilters: [" in ln and not re.search(
                r"PartitionFilters: \[\s*\]", ln
            )
            scans.append(
                {"format": fmt, "pushed_filters": pushed, "partition_filters": partf}
            )
    return {
        "query": name,
        "exchanges": plan.count("Exchange"),
        "range_exchanges": len(re.findall(r"rangepartitioning", plan, re.I)),
        "single_partition": "SinglePartition" in plan,
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": "CartesianProduct" in plan,
        "python_stages": plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython"),
        "arrow_map_stages": plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("FlatMapGroupsInPandasWithState"),
        "hash_aggregates": plan.count("HashAggregate"),
        "window_ops": plan.count("Window"),
        "generators": plan.count("Generate"),
        "top_k_heaps": plan.count("TakeOrderedAndProject"),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "cached_reads": plan.count("InMemoryTableScan"),
        "scans": scans,
    }


def _fmt_row(r: dict) -> str:
    flags = []
    if r["cartesian"]:
        flags.append("CARTESIAN!")
    if r["python_stages"]:
        flags.append(f"py={r['python_stages']}")
    if r["single_partition"]:
        flags.append("1-part!")
    if r["nested_loop_joins"]:
        flags.append(f"bnlj={r['nested_loop_joins']}")
    return (
        f"{r['query']:34s} ex={r['exchanges']:2d} "
        f"bc={r['broadcast_joins']} smj={r['sortmerge_joins']} "
        f"agg={r['hash_aggregates']:2d} win={r['window_ops']} "
        f"gen={r['generators']} wsc={r['codegen_stages']:2d} "
        f"{' '.join(flags)}"
    )


def main(argv: list[str]) -> int:
    import os

    from syncflux_spark import queries as q
    from syncflux_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("syncflux-plans")
    spark.sparkContext.setLogLevel("ERROR")
    names = (
        sorted(q.REGISTRY)
        if argv and argv[0] == "--all"
        else argv
    )
    if not names:
        print("usage: python -m syncflux_spark.plans <query>... | --all")
        return 2
    for name in names:
        if name not in q.REGISTRY:
            print(f"{name}: not in registry")
            continue
        try:
            print(_fmt_row(plan_report(spark, sf_dir, name)))
        except Exception as exc:  # surface, keep sweeping
            print(f"{name:34s} ERROR {type(exc).__name__}: {exc}")
    spark.stop()
    return 0


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv[1:]))
