"""A/B the streaming LSH index's decisions() probe side at scale.

The registered query's cost at x100 (632.9 s, alpha 0.99 — SCALE.md
r10) is dominated by full-corpus md5/banding scans: two are inherent
(each delivery must be banded to fold into state), but the THIRD —
decisions() re-banding the whole corpus as its probe side — is not:
the band rows it recomputes were already computed and Arrow-shipped
through the stateful kernel at ingest. ``persist_bands=True`` writes
them per batch as a by-product (one narrow parquet per micro-batch)
and ``decisions_ingested()`` probes those instead.

This tool measures both shapes end-to-end on the
``tools/gen_scale_data.py`` corpora — (bulk ingest of two full
deliveries) + (decision pass) — asserts the decision sets are
IDENTICAL (they are the same rows by construction: the persisted
bands are exactly band_keys(delivered docs), and duplicates across
deliveries collapse in the min), and reports ingest/decide/total wall
seconds. The winner becomes the registered query's shape.

Usage: python tools/measure_lsh_decisions.py [--data /tmp/syncflux_scale]
         [--scales 1,10,30]
Prints a markdown table (for SCALE.md) plus one JSON line.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time


def stage_file(src_dir: str, path: str, name: str, seq: int) -> None:
    dst = os.path.join(src_dir, name)
    shutil.copy(path, dst)
    os.utime(dst, (1_700_000_000 + seq, 1_700_000_000 + seq))


def decisions_fingerprint(df) -> tuple:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("canonical_id").alias("s"),
        F.expr("bit_xor(xxhash64(doc_id, canonical_id, is_dup))").alias("h"),
    ).collect()[0]
    return (row.n, int(row.s), int(row.h))


def drive(spark, docs_path: str, persist_bands: bool) -> dict:
    from syncflux_spark.streaming.neardup import StreamingLshIndex

    mode = "ingested" if persist_bands else "reban"
    root = tempfile.mkdtemp(prefix=f"sf_lshdec_{mode}_")
    try:
        src = os.path.join(root, "src")
        os.makedirs(src)
        stage_file(src, docs_path, "docs_a.parquet", 0)
        stage_file(src, docs_path, "docs_b.parquet", 1)
        op = StreamingLshIndex(
            spark,
            src,
            os.path.join(root, "dst"),
            os.path.join(root, "ckpt"),
            max_files_per_trigger=1,
            state_partitions=4,
            persist_bands=persist_bands,
        )
        t0 = time.monotonic()
        op.run_available()
        ingest_s = time.monotonic() - t0

        t0 = time.monotonic()
        if persist_bands:
            dec = op.decisions_ingested()
        else:
            dec = op.decisions(spark.read.parquet(docs_path))
        fp = decisions_fingerprint(dec)
        decide_s = time.monotonic() - t0
        return {
            "mode": mode,
            "ingest_s": round(ingest_s, 2),
            "decide_s": round(decide_s, 2),
            "total_s": round(ingest_s + decide_s, 2),
            "fingerprint": fp,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/tmp/syncflux_scale")
    ap.add_argument("--scales", default="1,10,30")
    ns = ap.parse_args()
    scales = [int(s) for s in ns.scales.split(",")]

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from syncflux_spark.session import get_spark

    spark = get_spark("syncflux-lsh-decisions")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for scale in scales:
        docs = os.path.join(ns.data, f"x{scale}", "documents.parquet")
        if not os.path.isfile(docs):
            raise SystemExit(f"{docs} missing — run tools/gen_scale_data.py")
        prints = set()
        for persist in (False, True):
            r = drive(spark, docs, persist)
            r["scale"] = scale
            prints.add(r.pop("fingerprint"))
            rows.append(r)
            print(
                f"x{scale} {r['mode']}: ingest {r['ingest_s']}s "
                f"decide {r['decide_s']}s total {r['total_s']}s",
                flush=True,
            )
        assert len(prints) == 1, (
            f"decision sets diverged at x{scale}: {prints}"
        )

    print("\n| scale | mode | ingest s | decide s | total s |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| x{r['scale']} | {r['mode']} | {r['ingest_s']} "
            f"| {r['decide_s']} | {r['total_s']} |"
        )
    print(json.dumps({"tool": "measure_lsh_decisions", "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
