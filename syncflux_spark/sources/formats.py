"""Text-format sources/sinks (CSV, JSON-lines) for measurement tables.

The reference speaks exactly one wire format (line protocol out, JSON
in — pkg/agent/client.go); a Spark-native engine gets the rest of the
interchange surface from the builtin DataSource implementations. The
only engine-specific intelligence needed is the ns-timestamp rule
(SURVEY §7.2): Spark timestamps are µs, and text formats would
truncate — so measurement tables serialize their canonical ``ts_ns``
**long** column (lossless in any format) and re-derive the µs ``ts``
on read, the same convention sources/parquet.py uses for the native
TIMESTAMP(NANOS) parquet files.

Scale: these are stock DSv1 file sources — splittable scans (CSV/JSON
split by line boundaries), schema enforced up front (no inference scan
at 100 TB), predicate pushdown limited by the format (text formats
can't skip row groups — keep them at the ingest/egress edge, parquet
inside the engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from syncflux_spark.functions.time import unixnano_to_ts

#: events-measurement interchange schema: ts carried as ns-epoch long
EVENTS_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_ns", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def write_text_table(
    df: DataFrame,
    path: str,
    fmt: str,
    schema: T.StructType = EVENTS_TEXT_SCHEMA,
    drop_cols: tuple[str, ...] = ("ts",),
) -> None:
    """Export a measurement table to ``csv``, ``json`` (lines), or
    ``orc``, columns in the declared interchange-schema ORDER — CSV readers
    bind by position, so writer and reader must share one ordering.
    Derived µs timestamp columns are dropped — ``ts_ns`` is the one
    canonical clock and survives as a plain long. CSV gets a header
    so the file is self-describing for non-Spark consumers."""
    out = df.drop(*drop_cols).select(*[f.name for f in schema.fields])
    w = out.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_text_table(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType = EVENTS_TEXT_SCHEMA,
    time_ns_col: str = "ts_ns",
) -> DataFrame:
    """Read a text-format measurement table with a DECLARED schema
    (never inference — an inference pass is a full extra scan) and
    re-derive the µs ``ts`` from the ns long."""
    r = spark.read.format(fmt).schema(schema)
    if fmt == "csv":
        r = r.option("header", "true")
    df = r.load(path)
    return df.withColumn("ts", unixnano_to_ts(time_ns_col))
