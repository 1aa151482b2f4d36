"""Bucketed table layout: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-to-fact join (orders ⋈ lineitem
on orderkey) is the shuffle of BOTH sides. Bucketing spends that
shuffle once at WRITE time: ``bucketBy(n, key)`` hash-partitions rows
into a fixed bucket layout recorded in the catalog, and every later
join or aggregation on the bucket key reads co-located buckets with
NO Exchange in the plan — the join becomes an embarrassingly parallel
zip of bucket pairs. This is the Spark-native equivalent of the
reference keeping per-measurement series files adjacent on disk so a
sync walks both sides in lockstep (pkg/agent/sync.go chunk walk).

Rules that make it work (and that the plan test asserts):
- both sides bucketed by the JOIN key into the SAME bucket count;
- ``sortBy`` within buckets lets SortMergeJoin skip its sort;
- readers must come from the catalog (``spark.table``) — a plain
  parquet read of the same files forgets the bucket spec.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a catalog-managed parquet table bucketed
    (and optionally sorted) by ``key``. Overwrites any previous
    layout of the same name — including an ORPHANED warehouse
    directory from an earlier session: the in-memory catalog forgets
    tables on restart but the warehouse path survives, and
    ``saveAsTable`` refuses a "new" table whose location exists
    (LOCATION_ALREADY_EXISTS)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if wh:
        shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    table_prefix: str,
    n_buckets: int = 16,
) -> DataFrame:
    """Bucket both sides on their join keys and return the co-located
    join — the write pays the one-time shuffle; the returned plan has
    no Exchange. In production the bucketed tables are the long-lived
    layout and this function is only the bootstrap."""
    lt, rt = f"{table_prefix}_l", f"{table_prefix}_r"
    write_bucketed(left, lt, left_key, n_buckets)
    write_bucketed(right, rt, right_key, n_buckets)
    lb, rb = spark.table(lt), spark.table(rt)
    # merge hint: this is the fact-to-fact path — at real scale
    # neither side broadcasts, and SortMergeJoin is what the bucket
    # layout makes exchange-free (at toy SF Spark would otherwise
    # broadcast the small side and never exercise the co-location)
    return lb.hint("merge").join(rb, lb[left_key] == rb[right_key])
