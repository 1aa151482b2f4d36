"""InfluxDB 1.x Continuous Queries: incremental rollup materialization.

InfluxDB's CQs (``CREATE CONTINUOUS QUERY .. BEGIN SELECT <agg> INTO
<target> FROM m GROUP BY time(iv) END``) re-run a ``GROUP BY time``
aggregate each interval and write newly-complete buckets into a target
measurement — the downsample-into-table workflow every Influx 1.x
deployment runs for retention tiering. The reference replicates the
*results* of such tables; a user switching to this engine needs the
mechanism itself.

Spark-first this is an incrementally-maintained materialized view:

* each :meth:`run` materializes only buckets that are (a) COMPLETE at
  the supplied ``now`` (bucket_end ≤ now — Influx CQs never emit a
  partial bucket) and (b) newer than the high-water mark already in
  the target. The incremental scan is a pushed-down time-range filter
  (scan_time_range via the compiled SELECT), so a run touches only
  the new data, not the table's history — at 100 TB this is the
  difference between a per-hour rollup costing one hour of data and
  costing the whole table.
* the high-water mark is recovered from the TARGET's own max bucket
  (no sidecar state): restart-safe by construction.
* each run writes to a ``win=<lo>_<hi>`` subdirectory with overwrite
  semantics — a crashed/re-run window replaces itself rather than
  appending duplicates (same idempotency design as operators/copy.py;
  the reference gets this from InfluxDB point-upsert).

Reference anchor: CQs are the one InfluxQL feature class the
reference's own deployments depend on but never emit themselves
(its scan template reads the *source* measurements, sync.go:162).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from syncflux_spark.influxql import (
    ContinuousQueryStmt,
    InfluxQLError,
    parse,
)


class ContinuousQuery:
    """One parsed CQ bound to an engine and a target directory."""

    def __init__(
        self,
        engine,
        statement: str,
        dst_path: str,
    ):
        st = parse(statement)
        if not isinstance(st, ContinuousQueryStmt):
            raise InfluxQLError("not a CREATE CONTINUOUS QUERY statement")
        self.engine = engine
        self.stmt = st
        self.select = st.select
        self.iv_ns = st.select.group_time_ns
        self.dst_path = dst_path
        self.name = st.name

    # -- incremental run ----------------------------------------------------
    def _high_water_ns(self) -> int | None:
        """Max materialized bucket start, recovered from the target
        data itself (one column-pruned scan of the small rollup —
        no sidecar state file to corrupt)."""
        from pyspark.sql import functions as F

        spark: SparkSession = self.engine.spark
        try:
            existing = spark.read.option("recursiveFileLookup", "true").parquet(
                self.dst_path
            )
        except Exception:
            return None
        row = existing.agg(F.max("time").alias("m")).collect()[0]
        return row.m

    def run(self, now_ns: int) -> int:
        """Materialize buckets complete at ``now_ns`` and newer than
        the high-water mark; returns rows written. Lower bound and
        upper bound are injected into the compiled SELECT as time
        predicates, so the source scan is range-pruned to exactly the
        new window."""
        import copy as _copy

        from pyspark.sql import functions as F

        off = self.select.group_offset_ns
        # newest COMPLETE bucket boundary: buckets [b, b+iv) with
        # b + iv <= now  ⇔  b < floor((now - off)/iv)*iv + off
        hi = ((now_ns - off) // self.iv_ns) * self.iv_ns + off
        hwm = self._high_water_ns()
        lo = (hwm + self.iv_ns) if hwm is not None else None
        if lo is not None and lo >= hi:
            return 0
        st = _copy.deepcopy(self.select)
        st.into = None
        # keep any user WHERE bounds that are tighter
        if lo is not None and (st.time.lo_ns is None or st.time.lo_ns < lo):
            st.time.lo_ns = lo
        if st.time.hi_ns is None or st.time.hi_ns > hi:
            st.time.hi_ns = hi
        df = self.engine._select(st)
        if st.time.lo_ns is None:
            lo_key = "start"
        else:
            lo_key = str(st.time.lo_ns)
        out_dir = os.path.join(self.dst_path, f"win={lo_key}_{hi}")
        from pyspark.sql import Observation

        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("n"))
        df.write.mode("overwrite").parquet(out_dir)
        return obs.get["n"]

    def read_target(self) -> DataFrame:
        """Everything materialized so far (window subdirs merge under
        a recursive read; schema is identical across windows)."""
        return self.engine.spark.read.option(
            "recursiveFileLookup", "true"
        ).parquet(self.dst_path)


def _marker_path(dst_path: str) -> str:
    return os.path.join(dst_path, "_materialized_below")


def _read_marker(dst_path: str) -> int | None:
    try:
        with open(_marker_path(dst_path)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def _write_marker(dst_path: str, below_ns: int) -> None:
    os.makedirs(dst_path, exist_ok=True)
    with open(_marker_path(dst_path), "w") as fh:
        fh.write(str(below_ns))


class ExpiringContinuousQuery(ContinuousQuery):
    """ContinuousQuery whose target also EXPIRES: materialization
    windows (the ``win=`` directories) older than a cutoff are dropped
    whole — metadata-only deletion, the exact analog of InfluxDB
    dropping whole shard groups when a retention policy expires them
    (expiry granularity = materialization window, just as Influx's is
    the shard-group duration).

    A ``_materialized_below`` marker records the high bucket boundary
    after every run, as a FLOOR under the data-derived high-water
    mark: if expiry empties the target entirely, the next run still
    resumes above what was already materialized instead of
    re-creating (and then re-expiring) history. The data-derived max
    stays primary, so a crash between data write and marker write
    replays idempotently into the same window directory."""

    def run(self, now_ns: int) -> int:
        written = super().run(now_ns)
        off = self.select.group_offset_ns
        hi = ((now_ns - off) // self.iv_ns) * self.iv_ns + off
        prev = _read_marker(self.dst_path)
        if prev is None or hi > prev:
            _write_marker(self.dst_path, hi)
        return written

    def _high_water_ns(self) -> int | None:
        data_hwm = super()._high_water_ns()
        marker = _read_marker(self.dst_path)
        if marker is None:
            return data_hwm
        marker_hwm = marker - self.iv_ns  # last bucket start below the bound
        if data_hwm is None:
            return marker_hwm
        return max(data_hwm, marker_hwm)

    def expire(self, before_ns: int) -> int:
        """Drop whole materialization windows whose buckets all end at
        or before ``before_ns``; returns windows dropped. Windows
        straddling the cutoff stay (same as Influx keeping a shard
        group until its whole interval expires)."""
        import re
        import shutil

        if not os.path.isdir(self.dst_path):
            return 0
        dropped = 0
        for name in os.listdir(self.dst_path):
            m = re.match(r"win=(start|\d+)_(\d+)$", name)
            if not m:
                continue
            hi = int(m.group(2))
            if hi <= before_ns:
                shutil.rmtree(os.path.join(self.dst_path, name))
                dropped += 1
        return dropped


class TieredRetention:
    """Downsample tiering — the operational pattern every InfluxDB
    deployment runs with CQs + retention policies: raw data expires
    quickly while rollups at widening intervals persist longer
    (e.g. raw 7 d → 1 h rollup 90 d → 1 d rollup forever).

    ``tiers`` maps an :class:`ExpiringContinuousQuery` to its
    retention in ns (None = keep forever). :meth:`tick` is the
    scheduler beat: materialize newly-complete buckets for every
    tier, then expire each tier's windows past its retention. Raw
    tables expire separately via
    :meth:`syncflux_spark.catalog.SparkCatalog.enforce_retention` —
    tiering governs the rollup chain."""

    def __init__(self, tiers: list[tuple[ExpiringContinuousQuery, int | None]]):
        self.tiers = list(tiers)

    def tick(self, now_ns: int) -> dict[str, dict[str, int]]:
        out: dict[str, dict[str, int]] = {}
        for cq, retention_ns in self.tiers:
            written = cq.run(now_ns)
            expired = (
                cq.expire(now_ns - retention_ns)
                if retention_ns is not None
                else 0
            )
            out[cq.name] = {"rows_written": written, "windows_expired": expired}
        return out
