"""Prove the r11 auto-cap DEFAULTS survive the r10 walls — no opt-in.

r10 found two disk walls running registered defaults at scale and
shipped `bucket_cap` as an opt-in dial; the verdict's top task was to
make survival the DEFAULT. This harness runs the exact wall-hitting
kernels with NO cap argument at the scales that killed them:

- text:   duplicate_components / dedup_near_keep shape and the
          doc_pagerank pipeline at x100 (500k docs; r10: >78 GB
          verify-shuffle spill, disk death)
- embed:  near_dup_pairs / embedding_components at x30 and x100
          (60k/200k vectors, 16 sign-LSH buckets; r10: disk wall at
          x30 from ~112M candidate pairs x two 64-double payloads)

For each case it prints the census the auto rule saw (n_buckets, max,
p99, resolved cap — recomputed via operators/dedup.py::auto_cap_stats
on the same histogram the operator collects) plus wall seconds and
output cardinality.

Usage: python tools/measure_auto_cap_scale.py [--data /tmp/syncflux_scale]
         [--text-scales 100] [--emb-scales 30,100] [--skip-pagerank]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def text_census(spark, docs):
    from pyspark.sql import functions as F

    from syncflux_spark.operators import dedup as dd

    bands = dd.band_keys(docs)
    hist = [
        (int(r["_c"]), int(r["_f"]))
        for r in bands.groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("_c")
        .agg(F.count(F.lit(1)).alias("_f"))
        .collect()
    ]
    return dd.auto_cap_stats(hist)


def emb_census(spark, emb):
    from pyspark.sql import functions as F

    from syncflux_spark.operators import dedup as dd
    from syncflux_spark.operators.similarity import sign_lsh_bucket

    hist = [
        (int(r["_c"]), int(r["_f"]))
        for r in emb.select(sign_lsh_bucket("embedding", 4, 64).alias("bk"))
        .groupBy("bk")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("_c")
        .agg(F.count(F.lit(1)).alias("_f"))
        .collect()
    ]
    return dd.auto_cap_stats(hist, dd.AUTO_CAP_FLOOR, 2 * 1024)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/tmp/syncflux_scale")
    ap.add_argument("--text-scales", default="100")
    ap.add_argument("--emb-scales", default="30,100")
    ap.add_argument("--skip-pagerank", action="store_true")
    ns = ap.parse_args()

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from syncflux_spark.operators import dedup as dd
    from syncflux_spark.session import get_spark

    spark = get_spark("syncflux-auto-cap-scale")
    spark.sparkContext.setLogLevel("ERROR")
    results = []

    def run(label, fn):
        t0 = time.monotonic()
        out = fn()
        s = round(time.monotonic() - t0, 1)
        print(f"{label}: {s}s {out}", flush=True)
        results.append({"case": label, "s": s, "out": out})

    for scale in [int(s) for s in ns.text_scales.split(",") if s]:
        docs = spark.read.parquet(
            os.path.join(ns.data, f"x{scale}", "documents.parquet")
        )
        print(f"x{scale} text census (n,max,p99,cap):",
              text_census(spark, docs), flush=True)

        def near_keep():
            comp = dd.duplicate_components(docs, threshold=0.5)  # DEFAULTS
            keep = comp.groupBy("component").agg(
                F.count(F.lit(1)).alias("group_size")
            )
            row = keep.agg(
                F.count(F.lit(1)), F.max("group_size")
            ).collect()[0]
            return {"groups": row[0], "max_group": row[1]}

        run(f"x{scale} dedup_near_keep DEFAULTS", near_keep)

        if not ns.skip_pagerank:
            def pagerank():
                from syncflux_spark.operators.graph import (
                    pagerank_fixedpoint,
                )

                pairs = dd.ngram_jaccard_pairs(docs, threshold=0.5)
                pr = pagerank_fixedpoint(
                    docs.select("doc_id"), pairs.select("id_a", "id_b")
                )
                row = pr.agg(F.count(F.lit(1)), F.sum("rank_fp")).collect()[0]
                return {"rows": row[0], "rank_sum": int(row[1])}

            run(f"x{scale} doc_pagerank DEFAULTS", pagerank)

    for scale in [int(s) for s in ns.emb_scales.split(",") if s]:
        emb = spark.read.parquet(
            os.path.join(ns.data, f"x{scale}", "embeddings.parquet")
        )
        print(f"x{scale} emb census (n,max,p99,cap):",
              emb_census(spark, emb), flush=True)

        def pairs_default():
            from syncflux_spark.operators.similarity import near_dup_pairs

            out = near_dup_pairs(emb, threshold=0.3, n_planes=4, dim=64)
            return {"pairs": out.count()}

        run(f"x{scale} emb_near_dup_pairs DEFAULTS", pairs_default)

        def components_default():
            comp = dd.embedding_components(
                emb, threshold=0.3, n_planes=4, dim=64
            )
            row = comp.agg(
                F.count(F.lit(1)),
                F.count_distinct("component"),
            ).collect()[0]
            return {"rows": row[0], "components": row[1]}

        run(f"x{scale} emb_dedup_components DEFAULTS", components_default)

    print(json.dumps({"tool": "measure_auto_cap_scale", "rows": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
