"""Parquet measurement/table sources.

The reference's scan operator (S1 ``ReadDB``, pkg/agent/client.go:329-485)
streams a chunked InfluxQL ``SELECT`` over HTTP and hand-decodes typed
points. Spark-first, a "measurement" is simply a parquet (or Delta)
table whose schema is ``(time cols, tag cols, field cols)``; the typed
decode is schema-on-read and the chunked transfer is the partitioned
scan Spark performs natively. The time-range scan (S2,
pkg/agent/sync.go:162) becomes a pushed-down filter — half-open
``[start, end)`` rather than the reference's exclusive-both-ends quirk
that loses boundary points (SURVEY §4 "quirks").
"""

from __future__ import annotations

import os
from collections.abc import Iterable
from datetime import datetime, timezone
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from syncflux_spark.functions.time import unixnano_to_ts

#: Every table the driver materializes (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=256)
def _ns_timestamp_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark refuses them
    natively (PARQUET_TYPE_ILLEGAL), so they're read as ns-epoch longs
    via ``spark.sql.legacy.parquet.nanosAsLong``. Metadata-only probe
    (footer read), cached per path."""
    try:
        schema = pq.read_schema(path)
    except OSError:
        # directory dataset — probe a single fragment's footer
        schema = pq.ParquetDataset(path).schema
    return tuple(
        f.name for f in schema if str(f.type).startswith("timestamp[ns")
    )


def load_table(
    spark: SparkSession, sf_dir: str, name: str, keep_ns: bool = True
) -> DataFrame:
    """Scan one table. Column pruning + predicate pushdown are free:
    callers chain .select/.filter and Catalyst pushes both into the
    parquet reader (verify with .explain → PushedFilters/ReadSchema).

    ns-precision handling (SURVEY §7.2 hard part): TIMESTAMP(NANOS)
    columns are read as ns-epoch longs; the canonical long survives as
    ``{col}_ns`` and a µs TimestampType column of the original name is
    derived for ordinary consumers. **Time-range predicates must hit
    the long column** (use :func:`scan_time_range`): Catalyst does not
    invert ``timestamp_micros(x div 1000) >= C`` into a raw-column
    bound, so a filter on the derived timestamp reaches parquet as
    ``IsNotNull`` only — a full scan at 100 TB — while a long
    comparison on ``{col}_ns`` prunes row groups (and time partitions)
    normally. ``keep_ns=False`` drops the long for schema-minimal
    reads."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # TIMESTAMP (UTC-normalized), not TIMESTAMP_NTZ: epoch functions
    # work and comparisons match the DuckDB oracle (session tz is UTC)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for col in _ns_timestamp_cols(path):
        if keep_ns:
            df = df.withColumn(f"{col}_ns", F.col(col))
        df = df.withColumn(col, unixnano_to_ts(col))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def _to_ns_epoch(x) -> int:
    """Timestamp-ish → ns-epoch int. Naive datetimes/strings are UTC
    (the session timezone). Integer input is already ns."""
    if isinstance(x, int):
        return x
    if isinstance(x, str):
        x = datetime.fromisoformat(x)
    if isinstance(x, datetime):
        if x.tzinfo is None:
            x = x.replace(tzinfo=timezone.utc)
        # integer epoch delta, not int(timestamp()): truncation toward
        # zero puts pre-1970 sub-second datetimes a full second late
        delta = x - datetime(1970, 1, 1, tzinfo=timezone.utc)
        micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        return micros * 1_000
    raise TypeError(f"cannot convert {type(x).__name__} to ns epoch")


def scan_time_range(
    df: DataFrame,
    start,
    end,
    time_col: str = "ts",
) -> DataFrame:
    """S2: the reference's one query shape —
    ``select * from m where time > start and time < end group by *``
    (pkg/agent/sync.go:162). Half-open [start, end): boundary points
    land in exactly one chunk (fixes the reference's exclusive-bounds
    data-loss quirk). ``group by *`` is a no-op here because tags are
    ordinary columns.

    When the table carries a canonical ``{time_col}_ns`` long (ns
    parquet via :func:`load_table`), the predicate is expressed on the
    long — the form that actually reaches the parquet reader as a
    range filter (row-group + partition pruning); a predicate on the
    derived timestamp would push only ``IsNotNull``. Otherwise the
    timestamp column is compared directly (µs/ms parquet pushes that
    fine)."""
    ns_col = f"{time_col}_ns"
    if ns_col in df.columns:
        c: Column = F.col(ns_col)
        return df.where(
            (c >= F.lit(_to_ns_epoch(start))) & (c < F.lit(_to_ns_epoch(end)))
        )
    c = F.col(time_col)
    return df.where((c >= F.lit(start)) & (c < F.lit(end)))
