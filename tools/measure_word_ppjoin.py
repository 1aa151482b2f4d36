"""A/B the word-family candidate filters (r13, VERDICT tasks 1-2) on
the NON-DEGENERATE zipfian word corpora.

The r12 round could not settle the word-family scale claims: the
x-scale generator's 44-word vocabulary makes word-set similarity
degenerate (at t=0.8 essentially all C(n,2) pairs qualify — the
output itself is Θ(n²), so every run times the answer, not the
algorithm). ``tools/gen_scale_data.py --zipf-vocab 50000`` now writes
realistic corpora (50k-word zipfian draw, ~5%% near-dup tail,
candidate selectivity ~0.3%% of all pairs at x10); this harness times
``word_jaccard_all_pairs`` (t=0.8) and ``containment_pairs_exact``
(k=12, t=0.8 — the registry's parameters) against them and records
total shuffle-write bytes (status REST API) plus output checksums
(pair count, Σ id_a+id_b, Σ n_inter) so A/B legs prove identical
answers.

Point SYNCFLUX_TREE at a checkout to A/B two kernel versions on the
same box in the same session:

    SYNCFLUX_TREE=/tmp/r12tree python tools/measure_word_ppjoin.py --label r12
    SYNCFLUX_TREE=/root/repo   python tools/measure_word_ppjoin.py --label r13

Usage: python tools/measure_word_ppjoin.py
         [--data /tmp/syncflux_scale_zipf] [--scales 10,30]
         [--cases word,containment] [--label current]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request


def _shuffle_write_bytes(spark) -> int:
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
    ap.add_argument("--data", default="/tmp/syncflux_scale_zipf")
    ap.add_argument("--scales", default="10,30")
    ap.add_argument("--cases", default="word,containment")
    ap.add_argument("--label", default="current")
    ns = ap.parse_args()

    tree = os.environ.get(
        "SYNCFLUX_TREE",
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    sys.path.insert(0, tree)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from syncflux_spark.operators import dedup as dd

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("syncflux-word-ppjoin")
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
    cases = {c.strip() for c in ns.cases.split(",") if c.strip()}

    def run(label, fn):
        spark.catalog.clearCache()
        sw0 = _shuffle_write_bytes(spark)
        t0 = time.monotonic()
        out = fn()
        s = round(time.monotonic() - t0, 1)
        sw = _shuffle_write_bytes(spark) - sw0
        print(f"{label}: {s}s shuffle_write={sw / 1e9:.2f}GB {out}", flush=True)
        results.append(
            {"case": label, "s": s, "shuffle_write_bytes": sw, "out": out}
        )

    def checksums(out):
        row = out.agg(
            F.count(F.lit(1)),
            F.sum(F.col("id_a") + F.col("id_b")),
            F.sum("n_inter"),
        ).collect()[0]
        return {
            "pairs": row[0],
            "id_sum": int(row[1] or 0),
            "inter_sum": int(row[2] or 0),
        }

    for scale in [int(s) for s in ns.scales.split(",") if s]:
        docs = spark.read.parquet(
            os.path.join(ns.data, f"x{scale}", "documents.parquet")
        )
        if "word" in cases:
            run(
                f"x{scale} word_jaccard_all_pairs t=0.8",
                lambda: checksums(
                    dd.word_jaccard_all_pairs(docs, threshold=0.8)
                ),
            )
        if "containment" in cases:
            run(
                f"x{scale} containment_pairs_exact k=12 t=0.8",
                lambda: checksums(
                    dd.containment_pairs_exact(
                        docs, k_shingle=12, threshold=0.8
                    )
                ),
            )

    print(json.dumps({"tool": "measure_word_ppjoin", "label": ns.label,
                      "rows": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
