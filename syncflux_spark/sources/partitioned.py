"""Date-partitioned storage layout: directory partition pruning.

At 100 TB the single biggest scan lever is not reading data at all.
A time-series table laid out as ``dst/dt=YYYY-MM-DD/part-*.parquet``
lets every time-bounded query prune whole directories from the
listing — the scan's ``PartitionFilters`` run against the partition
VALUES (driver-side metadata), so a one-week query over a year of
data opens ~2% of the files before any row-group or page logic runs.
This composes with the row-level ns-range pushdown in
``sources/parquet.py`` (PartitionFilters skip directories,
DataFilters then skip row groups inside the survivors) and is the
static sibling of the bucketed layout in ``sources/bucketed.py``
(bucketing prunes shuffles, partitioning prunes scans).

Partition count discipline: one directory per day keeps the
partition-value space O(days), never O(cardinality-of-a-tag) — tag
columns stay inside the files where row-group stats handle them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame, dst: str, time_col: str = "ts", date_col: str = "dt"
) -> None:
    """Materialize ``df`` partitioned by the UTC calendar date of
    ``time_col`` (session timezone is pinned UTC in session.py)."""
    (
        df.withColumn(date_col, F.date_format(F.col(time_col), "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy(date_col)
        .parquet(dst)
    )


def read_date_range(
    spark: SparkSession,
    src: str,
    start_date: str,
    end_date: str,
    date_col: str = "dt",
) -> DataFrame:
    """Scan only the date directories inside [start_date, end_date]
    (inclusive, 'YYYY-MM-DD' strings — lexicographic order IS
    calendar order for this format, so plain string comparison
    prunes correctly and stays a partition filter)."""
    return spark.read.parquet(src).where(
        (F.col(date_col) >= start_date) & (F.col(date_col) <= end_date)
    )
