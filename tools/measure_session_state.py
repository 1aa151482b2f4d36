"""A/B the session closer's two state contracts at scale:
``numbering=True`` (batch-identical per-user session ids; a drained
key keeps one counter row forever) vs ``numbering=False`` (facts keyed
by (user, start_us); drained keys are REMOVED from the store).

The numbering residue is documented prose in streaming/sessions.py —
this tool turns it into a measurement: run both modes over the same
scaled event corpus (tools/gen_scale_data.py), flush every island
with a single PUMP-key wave (so real keys actually drain — per-user
sentinels would hold every key open in both modes), then read the
state store back with Spark's statestore data source and count rows,
alongside checkpoint bytes and wall time. Expected shape: numbering
retains one row per user ever seen; facts retains only the pump key.
Closed-session facts must agree between the modes (numbering's output
minus session_id == facts' output) — asserted on every run.

Usage: python tools/measure_session_state.py [--data /tmp/syncflux_scale]
         [--scales 1,3,10]
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


def drive(spark, events_path: str, numbering: bool) -> dict:
    from pyspark.sql import functions as F

    from syncflux_spark.streaming.sessions import StreamingSessionCloser

    root = tempfile.mkdtemp(prefix=f"sf_sess_{int(numbering)}_")
    try:
        src = os.path.join(root, "src")
        os.makedirs(src)
        ev = spark.read.parquet(events_path).select("user_id", "ts")
        waves = [
            ("a_data", ev),
            # one pump key advances the watermark past every island's
            # close point; every REAL key drains
            (
                "b_flush",
                spark.createDataFrame(
                    [(-1,)], "user_id long"
                ).select(
                    "user_id",
                    F.to_timestamp(F.lit("2030-01-01")).alias("ts"),
                ),
            ),
        ]
        for i, (name, df) in enumerate(waves):
            stage = os.path.join(root, f"stage_{name}")
            df.coalesce(1).write.mode("overwrite").parquet(stage)
            part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            dst = os.path.join(src, f"{name}.parquet")
            shutil.copy(part, dst)
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        t0 = time.monotonic()
        op = StreamingSessionCloser(
            spark,
            src,
            os.path.join(root, "dst"),
            os.path.join(root, "ckpt"),
            max_files_per_trigger=1,
            state_partitions=16,
            numbering=numbering,
        )
        op.run_available()
        wall = time.monotonic() - t0
        state_rows = (
            spark.read.format("statestore")
            .load(os.path.join(root, "ckpt"))
            .count()
        )
        facts = sorted(
            tuple(r)
            for r in op.closed_sessions()
            .select("user_id", "start_us", "end_us", "n_events")
            .collect()
        )
        return {
            "numbering": numbering,
            "wall_s": round(wall, 2),
            "state_rows": state_rows,
            "state_bytes": dir_bytes(os.path.join(root, "ckpt", "state")),
            "n_closed": len(facts),
            "_facts": facts,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default="/tmp/syncflux_scale")
    ap.add_argument("--scales", default="1,3,10")
    ns = ap.parse_args()
    scales = [int(s) for s in ns.scales.split(",")]

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from syncflux_spark.session import get_spark

    spark = get_spark("syncflux-session-state")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for scale in scales:
        events = os.path.join(ns.data, f"x{scale}", "events.parquet")
        if not os.path.isfile(events):
            raise SystemExit(f"{events} missing — run tools/gen_scale_data.py")
        n_users = (
            spark.read.parquet(events).select("user_id").distinct().count()
        )
        cell = {}
        for numbering in (True, False):
            r = drive(spark, events, numbering)
            r["scale"], r["n_users"] = scale, n_users
            cell[numbering] = r
            print(
                f"x{scale} numbering={numbering}: {r['wall_s']}s, "
                f"{r['state_rows']} state rows / {n_users} users, "
                f"{r['state_bytes']>>10} KiB, {r['n_closed']} closed",
                flush=True,
            )
        assert cell[True].pop("_facts") == cell[False].pop("_facts"), (
            f"x{scale}: closed-session facts diverged between modes"
        )
        rows.extend(cell.values())

    print("\n| scale | users | mode | wall | state rows | state bytes |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        mode = "numbering" if r["numbering"] else "facts-only"
        print(
            f"| x{r['scale']} | {r['n_users']:,} | {mode} | {r['wall_s']}s "
            f"| {r['state_rows']:,} | {r['state_bytes']:,} |"
        )
    print(json.dumps({"metric": "session_state_ab", "rows": rows}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
