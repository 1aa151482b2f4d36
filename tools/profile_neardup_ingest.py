"""Decompose the streaming LSH index's INGEST constant (VERDICT r11
#5): after the r11 ingested-bands probe, x30 ingest still pays
~132.7 s of the 134.2 s total (SCALE.md r11). Where does it go —
shingle explode, md5-per-shingle, or the Arrow state fold?

The banding pipeline is a chain of narrow stages, so each prefix is
timed as a BATCH job on the same corpus (the stream runs the same
expressions per micro-batch):

  scan        read + repartition + count
  shingle     + distinct k-shingle explode
  md5         + md5 per shingle (forced via array_join length sum)
  band_keys   + 8 lane mins + band-key concat + explode
  (stream)    full streaming ingest, from measure_lsh_decisions

It also times the DUAL-LANE candidate (xxhash64(shingle, lane) per
lane instead of one md5 + 8 substring mins) and checks whether the
one-hop DECISION VALUES survive the hash swap on this corpus — the
hash changes bucket contents, so identical decisions are a corpus
property, not a guarantee; if they differ the dual lane needs its own
oracle and the swap is not free.

Usage: python tools/profile_neardup_ingest.py [--data /tmp/syncflux_scale]
         [--scales 30] [--n-hashes 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/tmp/syncflux_scale")
    ap.add_argument("--scales", default="30")
    ap.add_argument("--n-hashes", type=int, default=8)
    ns = ap.parse_args()

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from syncflux_spark.operators.dedup import (
        BAND_SIZE,
        band_keys,
        shingle_sets,
    )
    from syncflux_spark.session import get_spark

    spark = get_spark("syncflux-ingest-profile")
    spark.sparkContext.setLogLevel("ERROR")
    results = []

    def run(label, fn, repeats=2):
        best = None
        out = None
        for _ in range(repeats):
            t0 = time.monotonic()
            out = fn()
            s = time.monotonic() - t0
            best = s if best is None or s < best else best
        best = round(best, 1)
        print(f"{label}: {best}s {out}", flush=True)
        results.append({"case": label, "s": best, "out": out})

    for scale in [int(s) for s in ns.scales.split(",") if s]:
        docs0 = spark.read.parquet(
            os.path.join(ns.data, f"x{scale}", "documents.parquet")
        )
        docs = docs0.repartition(
            spark.sparkContext.defaultParallelism
        )

        run(f"x{scale} scan", lambda: {"rows": docs.count()})

        def shingle_only():
            sh = shingle_sets(docs)
            row = sh.agg(F.sum(F.size("_sh"))).collect()[0]
            return {"shingles": int(row[0])}

        run(f"x{scale} +shingle", shingle_only)

        def shingle_nodistinct():
            from syncflux_spark.functions.text import char_shingles

            sh = docs.select(
                F.col("doc_id"),
                char_shingles("text", 5).alias("_sh"),
            ).where(F.size("_sh") > 0)
            row = sh.agg(F.sum(F.size("_sh"))).collect()[0]
            return {"shingles_with_dups": int(row[0])}

        run(f"x{scale} +shingle-nodistinct (alt)", shingle_nodistinct)

        def with_md5():
            sh = shingle_sets(docs).select(
                F.transform("_sh", F.md5).alias("_hs")
            )
            # array_join forces every md5 to evaluate (size() alone
            # would fold to size(_sh) — transform preserves length)
            row = sh.agg(
                F.sum(F.length(F.array_join("_hs", "")))
            ).collect()[0]
            return {"md5_chars": int(row[0])}

        run(f"x{scale} +md5", with_md5)

        def with_xxhash():
            sh = shingle_sets(docs)
            lanes = [
                F.array_min(
                    F.transform("_sh", lambda s, i=i: F.xxhash64(s, F.lit(i)))
                ).alias(f"mh{i}")
                for i in range(ns.n_hashes)
            ]
            row = (
                sh.select(*lanes)
                # modulo before summing: raw xxhash64 longs overflow
                # an ANSI int64 sum
                .agg(
                    *[
                        F.sum(F.pmod(f"mh{i}", F.lit(1_000_003)))
                        for i in range(ns.n_hashes)
                    ]
                )
                .collect()[0]
            )
            return {"lane0_sum": int(row[0])}

        run(f"x{scale} +xxhash64-lanes (alt)", with_xxhash)

        def full_bands():
            b = band_keys(docs)
            row = b.agg(
                F.count(F.lit(1)), F.min("band_key")
            ).collect()[0]
            return {"band_rows": row[0]}

        run(f"x{scale} +band_keys(md5)", full_bands)

        # dual-lane decision-value check: one-hop canonical ids from
        # xxhash64 banding vs md5 banding over the same corpus
        def decisions_of(bands):
            idx = bands.groupBy("band_id", "band_key").agg(
                F.min("doc_id").alias("min_doc_id")
            )
            dec = (
                bands.join(idx, ["band_id", "band_key"])
                .groupBy("doc_id")
                .agg(F.min("min_doc_id").alias("canonical_id"))
            )
            row = dec.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("canonical_id").alias("s"),
                F.sum(
                    (F.col("canonical_id") < F.col("doc_id")).cast("long")
                ).alias("dups"),
            ).collect()[0]
            return (row.n, int(row.s), int(row.dups))

        def xx_bands():
            sh = shingle_sets(docs)
            lanes = [
                F.array_min(
                    F.transform("_sh", lambda s, i=i: F.xxhash64(s, F.lit(i)))
                ).alias(f"mh{i}")
                for i in range(ns.n_hashes)
            ]
            sig = sh.select(F.col("doc_id"), *lanes)
            n_bands = ns.n_hashes // BAND_SIZE
            structs = [
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh{b * BAND_SIZE + j}").cast("string")
                            for j in range(BAND_SIZE)
                        ],
                    ).alias("band_key"),
                )
                for b in range(n_bands)
            ]
            return sig.select(
                "doc_id", F.explode(F.array(*structs)).alias("bd")
            ).select("doc_id", "bd.band_id", "bd.band_key")

        md5_dec = decisions_of(band_keys(docs))
        xx_dec = decisions_of(xx_bands())
        same = md5_dec == xx_dec
        print(
            f"x{scale} decisions md5={md5_dec} xxhash64={xx_dec} "
            f"identical={same}",
            flush=True,
        )
        results.append(
            {
                "case": f"x{scale} decision_values",
                "md5": list(md5_dec),
                "xxhash64": list(xx_dec),
                "identical": same,
            }
        )

    print(
        json.dumps({"tool": "profile_neardup_ingest", "rows": results})
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
