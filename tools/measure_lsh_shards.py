"""A/B the streaming LSH index's ``n_shards`` dial at scale.

Each touched shard serializes its FULL bucket→min map through Arrow
every micro-batch (``state.update`` rewrites the whole value), so the
per-batch state cost is O(total buckets / n_shards × touched shards),
not O(touched buckets). Two deployment shapes pull the dial in
opposite directions:

- BULK (the registered query's shape: the corpus delivered as two
  full-file batches): every batch touches every shard, rewrite is
  O(total buckets) regardless of the dial, and Python dispatch count
  grows with n_shards — fewer shards should win, mildly.
- INCR (steady-state ingestion: full corpus first, then a 1% tail
  file): the tail touches few buckets; with few shards the rewrite
  amplification is buckets/n_shards per touched bucket — more shards
  should win until dispatch re-dominates.

This tool measures both shapes across shard counts on the
``tools/gen_scale_data.py`` corpora, asserts the resulting index is
IDENTICAL across shard counts (count + id-sum + row-hash — min-wins
state cannot depend on where a bucket lives), and reports wall time
plus checkpointed state bytes. The winner parameterizes
``streaming/neardup.py::shards_for_buckets`` — the sizing rule the
VERDICT r9 asked to replace the hand rule.

Usage: python tools/measure_lsh_shards.py [--data /tmp/syncflux_scale]
         [--scales 10,30] [--shards 16,64,256,1024] [--tail-frac 0.01]
Prints a markdown table (for SCALE.md) plus one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def index_fingerprint(op) -> tuple:
    """Shard-placement-independent identity of the built index."""
    from pyspark.sql import functions as F

    row = (
        op.current_index()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("min_doc_id").alias("s"),
            F.expr(
                "bit_xor(xxhash64(band_id, band_key, min_doc_id))"
            ).alias("h"),
        )
        .collect()[0]
    )
    return (row.n, int(row.s), int(row.h))


def stage_file(src_dir: str, path: str, name: str, seq: int) -> None:
    dst = os.path.join(src_dir, name)
    shutil.copy(path, dst)
    os.utime(dst, (1_700_000_000 + seq, 1_700_000_000 + seq))


def drive(spark, docs_path: str, tail_path: str, n_shards: int) -> dict:
    """One (scale, n_shards) cell: bulk build (two full copies), then
    the incremental tail batch on the same checkpoint."""
    from syncflux_spark.streaming.neardup import StreamingLshIndex

    root = tempfile.mkdtemp(prefix=f"sf_lshab_{n_shards}_")
    try:
        src = os.path.join(root, "src")
        os.makedirs(src)
        stage_file(src, docs_path, "docs_a.parquet", 0)
        stage_file(src, docs_path, "docs_b.parquet", 1)

        def mk():
            return StreamingLshIndex(
                spark,
                src,
                os.path.join(root, "dst"),
                os.path.join(root, "ckpt"),
                max_files_per_trigger=1,
                state_partitions=4,
                n_shards=n_shards,
            )

        t0 = time.monotonic()
        op = mk()
        op.run_available()
        bulk_s = time.monotonic() - t0

        stage_file(src, tail_path, "docs_tail.parquet", 2)
        t0 = time.monotonic()
        op2 = mk()  # fresh operator, same checkpoint: restart + 1 batch
        op2.run_available()
        incr_s = time.monotonic() - t0

        return {
            "n_shards": n_shards,
            "bulk_s": round(bulk_s, 2),
            "incr_s": round(incr_s, 2),
            "state_bytes": dir_bytes(os.path.join(root, "ckpt", "state")),
            "fingerprint": index_fingerprint(op2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/tmp/syncflux_scale")
    ap.add_argument("--scales", default="10,30")
    ap.add_argument("--shards", default="16,64,256,1024")
    ap.add_argument("--tail-frac", type=float, default=0.01)
    ns = ap.parse_args()
    scales = [int(s) for s in ns.scales.split(",")]
    shard_counts = [int(s) for s in ns.shards.split(",")]

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from syncflux_spark.session import get_spark

    spark = get_spark("syncflux-lsh-shards")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for scale in scales:
        docs = os.path.join(ns.data, f"x{scale}", "documents.parquet")
        if not os.path.isfile(docs):
            raise SystemExit(f"{docs} missing — run tools/gen_scale_data.py")
        # deterministic 1% tail: the first docs by id order, re-written
        # as one file (content overlap with the corpus is fine — the
        # point is a SMALL batch against a big standing index)
        tail_dir = tempfile.mkdtemp(prefix="sf_lshab_tail_")
        df = spark.read.parquet(docs)
        n_tail = max(1, int(df.count() * ns.tail_frac))
        df.orderBy("doc_id").limit(n_tail).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tail_dir)
        tail = glob.glob(os.path.join(tail_dir, "part-*.parquet"))[0]

        prints = set()
        for n_shards in shard_counts:
            r = drive(spark, docs, tail, n_shards)
            r["scale"] = scale
            prints.add(r.pop("fingerprint"))
            rows.append(r)
            print(
                f"x{scale} shards={n_shards}: bulk {r['bulk_s']}s "
                f"incr {r['incr_s']}s state {r['state_bytes']>>10} KiB",
                flush=True,
            )
        assert len(prints) == 1, (
            f"index fingerprint diverged across shard counts at x{scale}: "
            f"{prints}"
        )
        shutil.rmtree(tail_dir, ignore_errors=True)

    print("\n| scale | n_shards | bulk 2-copy | incr 1% tail | state bytes |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| x{r['scale']} | {r['n_shards']} | {r['bulk_s']}s "
            f"| {r['incr_s']}s | {r['state_bytes']:,} |"
        )
    print(json.dumps({"metric": "lsh_shard_ab", "rows": rows}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
