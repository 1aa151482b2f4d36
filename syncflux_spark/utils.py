"""Small planning utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_cpu(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a *small-bytes, big-CPU* input to the session's
    parallelism.

    Spark sizes scan partitions by bytes (``files.maxPartitionBytes``),
    which is right for IO-bound work at 100 TB but leaves a few-MB
    parquet file in ONE partition — so a CPU-heavy narrow transform
    (md5-per-shingle, per-plane dot products) runs on one core. On the
    sf0.1 fixture this made MinHash signatures 9s instead of ~1s.
    A round-robin repartition of the small input costs microseconds
    and buys full core utilization; for inputs already split this is
    a no-op.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def eager_persist(df: DataFrame) -> DataFrame:
    """Persist AND materialize now.

    A lazy ``persist()`` feeding both sides of a self-join is a trap:
    the join's first action schedules both scan stages concurrently,
    each finds the cache unpopulated, and the upstream plan runs
    twice. Forcing a ``count()`` here populates the cache once, so
    every later scan (including concurrent ones) is a cache hit."""
    df = df.persist()
    df.count()
    return df
