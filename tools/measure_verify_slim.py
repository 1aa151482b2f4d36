"""A/B the near-dup VERIFY-STAGE payload slimming (r12).

r11 closed the candidate-COUNT wall (auto bucket cap); the verdict's
next-narrowest bottleneck was candidate WIDTH: every candidate pair
row carried both full payloads (two 64-double vectors / two
fingerprint arrays, ~1 KB) through the pair-dedup exchange and the
sort-merge verify joins — at x100 embeddings, 98M pairs × 1 KB of
shuffle (SCALE.md r11, the alpha-1.4 residual). r12 makes candidates
carry (id_a, id_b) ONLY until after dropDuplicates, joins the payload
back from the cached corpus projection, and SHUFFLE_HASH-hints the
payload joins so the pair×payload stream is never sorted.

This harness times the exact wall-shaped kernels at scale and records
TOTAL SHUFFLE WRITE BYTES per case from the Spark status REST API —
the direct evidence the verdict asked for ("the verify exchange bytes
drop"). Point SYNCFLUX_TREE at a checkout to A/B two kernel versions
on the same box in the same session:

    SYNCFLUX_TREE=/tmp/r11tree python tools/measure_verify_slim.py ...
    SYNCFLUX_TREE=/root/repo   python tools/measure_verify_slim.py ...

Usage: python tools/measure_verify_slim.py [--data /tmp/syncflux_scale]
         [--emb-scales 30,100] [--text-scales 30,100] [--label r12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request


def _shuffle_write_bytes(spark) -> int:
    """Cumulative shuffle write bytes across all completed stages of
    the app, via the status REST API (driver-local, no extra jobs)."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return -1
    with urllib.request.urlopen(f"{base}/api/v1/applications") as r:
        apps = json.load(r)
    app_id = apps[0]["id"]
    total = 0
    for status in ("complete", "failed"):
        url = f"{base}/api/v1/applications/{app_id}/stages?status={status}"
        with urllib.request.urlopen(url) as r:
            for st in json.load(r):
                total += st.get("shuffleWriteBytes", 0)
    return total


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/tmp/syncflux_scale")
    ap.add_argument("--emb-scales", default="30,100")
    ap.add_argument("--text-scales", default="30,100")
    ap.add_argument("--label", default="current")
    ns = ap.parse_args()

    tree = os.environ.get(
        "SYNCFLUX_TREE",
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    sys.path.insert(0, tree)

    from pyspark.sql import functions as F

    from syncflux_spark.operators import dedup as dd
    from syncflux_spark.operators.similarity import near_dup_pairs

    # the r11 tree's get_spark has no conf parameter — pre-create the
    # session here so both A/B trees run with the UI (and its REST
    # stage metrics) enabled
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("syncflux-verify-slim")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.sql.autoBroadcastJoinThreshold", "10m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"tree={tree} label={ns.label}", flush=True)
    results = []

    def run(label, fn):
        spark.catalog.clearCache()
        sw0 = _shuffle_write_bytes(spark)
        t0 = time.monotonic()
        out = fn()
        s = round(time.monotonic() - t0, 1)
        sw = _shuffle_write_bytes(spark) - sw0
        print(
            f"{label}: {s}s shuffle_write={sw / 1e9:.2f}GB {out}",
            flush=True,
        )
        results.append(
            {"case": label, "s": s, "shuffle_write_bytes": sw, "out": out}
        )

    for scale in [int(s) for s in ns.emb_scales.split(",") if s]:
        emb = spark.read.parquet(
            os.path.join(ns.data, f"x{scale}", "embeddings.parquet")
        )

        def emb_pairs():
            out = near_dup_pairs(emb, threshold=0.3, n_planes=4, dim=64)
            row = out.agg(
                F.count(F.lit(1)), F.sum(F.col("id_a") + F.col("id_b"))
            ).collect()[0]
            return {"pairs": row[0], "id_sum": int(row[1] or 0)}

        run(f"x{scale} emb_near_dup_pairs", emb_pairs)

    for scale in [int(s) for s in ns.text_scales.split(",") if s]:
        docs = spark.read.parquet(
            os.path.join(ns.data, f"x{scale}", "documents.parquet")
        )

        def text_pairs():
            out = dd.ngram_jaccard_pairs(docs, threshold=0.5)
            row = out.agg(
                F.count(F.lit(1)), F.sum(F.col("id_a") + F.col("id_b"))
            ).collect()[0]
            return {"pairs": row[0], "id_sum": int(row[1] or 0)}

        run(f"x{scale} ngram_jaccard_pairs", text_pairs)

    print(json.dumps({"tool": "measure_verify_slim", "label": ns.label,
                      "rows": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
