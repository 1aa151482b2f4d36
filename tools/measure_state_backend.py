"""Measure the streaming state-backend dial: HDFS (in-heap map) vs
RocksDB (off-heap, local-disk) on the heaviest stateful query — the
stream-stream LEFT OUTER interval join — across the x1/x3/x10 scale
fixtures from ``tools/gen_scale_data.py``.

TestStateBackendKnob proves the two backends are RESULT-identical;
this tool adds the scale evidence the 100 TB claim needs: wall time
per scale and the checkpointed state footprint (bytes under
``<ckpt>/state`` after the run), so "off-heap state is the backend at
scale" carries a measurement like every other SCALE.md claim. Result
identity is re-asserted on every run (unmatched-row count must agree
across backends at each scale) so a timing table can never ship from
diverging results.

Usage: python tools/measure_state_backend.py [--data /tmp/syncflux_scale]
         [--scales 1,3,10] [--backends hdfs,rocksdb]
Prints a markdown table (for SCALE.md) plus one JSON line.
"""

from __future__ import annotations

import argparse
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


def drive(spark, events_path: str, backend: str) -> dict:
    from pyspark.sql import functions as F

    from syncflux_spark.streaming.joins import ClickAttributionStream

    # "rocksdb+changelog" (r13): RocksDB provider with changelog
    # checkpointing — per-batch uploads become the changed keys only,
    # not zipped full snapshots; the conf is session-scoped here and
    # restored after the run (it must be set before the checkpoint's
    # FIRST batch, like the provider itself).
    chlog_key = (
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    )
    changelog = backend.endswith("+changelog")
    if changelog:
        backend = backend.split("+", 1)[0]
        prev_chlog = spark.conf.get(chlog_key, "false")
        spark.conf.set(chlog_key, "true")
    root = tempfile.mkdtemp(prefix=f"sf_sb_{backend}_")
    try:
        src = os.path.join(root, "src")
        os.makedirs(src)
        shutil.copy(events_path, os.path.join(src, "a_events.parquet"))
        st = ClickAttributionStream(
            spark,
            src,
            os.path.join(root, "dst"),
            os.path.join(root, "ckpt"),
            join_type="left_outer",
            max_files_per_trigger=1,
            state_partitions=4,
            state_backend=backend,
        )
        st.emit_flush_sentinel()
        st.emit_flush_sentinel()
        t0 = time.monotonic()
        st.run_available()
        wall = time.monotonic() - t0
        n_unmatched = (
            st.read_pairs()
            .where(F.col("click_us").isNull() & (F.col("user_id") >= 0))
            .count()
        )
        state_b = dir_bytes(os.path.join(root, "ckpt", "state"))
        return {
            "wall_sec": round(wall, 2),
            "unmatched": n_unmatched,
            "state_mb": round(state_b / 1e6, 2),
        }
    finally:
        if changelog:
            spark.conf.set(chlog_key, prev_chlog)
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/tmp/syncflux_scale")
    ap.add_argument("--scales", default="1,3,10")
    ap.add_argument("--backends", default="hdfs,rocksdb")
    ns = ap.parse_args()
    scales = [int(s) for s in ns.scales.split(",")]
    backends = ns.backends.split(",")
    for s in scales:
        p = os.path.join(ns.data, f"x{s}", "events.parquet")
        if not os.path.exists(p):
            raise SystemExit(f"{p} missing — run tools/gen_scale_data.py")

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from syncflux_spark.session import get_spark

    spark = get_spark("syncflux-state-backend")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for s in scales:
        events = os.path.join(ns.data, f"x{s}", "events.parquet")
        row: dict[str, dict] = {}
        for b in backends:
            row[b] = drive(spark, events, b)
            print(f"# x{s} {b}: {row[b]}", file=sys.stderr)
        counts = {r["unmatched"] for r in row.values()}
        if len(counts) > 1:
            raise SystemExit(
                f"x{s}: backends disagree on unmatched counts {row} — "
                "timing table withheld; fix correctness first"
            )
        results[f"x{s}"] = row

    hdr = [
        f"{b} {c}" for b in backends for c in ("wall", "state")
    ]
    print("| scale | rows | " + " | ".join(hdr) + " |")
    print("|---|" + "---|" * (len(hdr) + 1))
    for s in scales:
        row = results[f"x{s}"]
        any_b = row[backends[0]]
        cells = []
        for b in backends:
            cells += [f"{row[b]['wall_sec']}s", f"{row[b]['state_mb']}MB"]
        print(
            f"| x{s} | {any_b['unmatched']} unmatched | "
            + " | ".join(cells)
            + " |"
        )
    print(json.dumps({"metric": "state_backend_scale", "results": results}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
