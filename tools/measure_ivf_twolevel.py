"""Slope of two-level vs flat IVF assignment (VERDICT r11 #3).

Flat assignment costs n×k dots; two-level costs n×(√k + E[k/√k]).
This times both on the scaled embedding corpora at a production-like
centroid count, checks the routing agreement (fraction of vectors
whose fine cell matches flat's — two-level is approximate by design),
and reports the per-vector dot budget each paid.

Usage: python tools/measure_ivf_twolevel.py [--data /tmp/syncflux_scale]
         [--scales 30,100] [--k 1024]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/tmp/syncflux_scale")
    ap.add_argument("--scales", default="30,100")
    ap.add_argument("--k", type=int, default=1024)
    ns = ap.parse_args()

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from syncflux_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_twolevel,
        seed_centroids,
    )
    from syncflux_spark.session import get_spark

    spark = get_spark("syncflux-ivf-twolevel")
    spark.sparkContext.setLogLevel("ERROR")
    results = []

    from syncflux_spark.utils import spread_for_cpu

    for scale in [int(s) for s in ns.scales.split(",") if s]:
        # small-bytes big-CPU input: without the spread the n×k dot
        # stage runs on the parquet's 4 scan partitions (utils.
        # spread_for_cpu's documented trap)
        emb = spread_for_cpu(
            spark.read.parquet(
                os.path.join(ns.data, f"x{scale}", "embeddings.parquet")
            )
        ).persist()
        n = emb.count()
        k = min(ns.k, n)
        cents = seed_centroids(emb, k).persist()
        cents.count()

        def timed(fn):
            t0 = time.monotonic()
            out = fn()
            return round(time.monotonic() - t0, 1), out

        def agg_of(assigned):
            row = assigned.agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct("cid").alias("cells"),
            ).collect()[0]
            return {"rows": row.n, "cells": row.cells}

        s_flat, flat_out = timed(
            lambda: agg_of(ivf_assign(emb, k, centroids=cents))
        )
        s_two, two_out = timed(
            lambda: agg_of(ivf_assign_twolevel(emb, k, centroids=cents))
        )
        # routing agreement: approximate by design — report, don't gate
        flat_a = ivf_assign(emb, k, centroids=cents).select(
            "vec_id", F.col("cid").alias("cf")
        )
        two_a = ivf_assign_twolevel(emb, k, centroids=cents).select(
            "vec_id", F.col("cid").alias("ct")
        )
        agree = (
            flat_a.join(two_a, "vec_id")
            .agg(F.avg((F.col("cf") == F.col("ct")).cast("double")))
            .collect()[0][0]
        )
        rec = {
            "scale": scale,
            "n": n,
            "k": k,
            "flat_s": s_flat,
            "twolevel_s": s_two,
            "flat_dots_per_vec": k,
            "twolevel_dots_per_vec": math.ceil(math.sqrt(k)) + k // math.ceil(math.sqrt(k)),
            "agreement": round(float(agree), 4),
            "flat": flat_out,
            "twolevel": two_out,
        }
        print(rec, flush=True)
        results.append(rec)
        cents.unpersist()
        emb.unpersist()

    print(json.dumps({"tool": "measure_ivf_twolevel", "rows": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
