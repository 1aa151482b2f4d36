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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: change-operation codes in the batch's op column
OP_INSERT, OP_UPDATE, OP_DELETE = "I", "U", "D"


class DuplicateChangeKeyError(ValueError):
    """A change batch carried more than one change for the same key."""


def compact_changes(
    changes: DataFrame,
    key_col: str,
    seq_col: str,
    op_col: str | None = None,
) -> DataFrame:
    """Collapse a multi-change batch to ONE net change per key by
    ``seq_col`` (a monotone sequence: LSN, file index, commit ts).

    With ``op_col=None`` this is plain keep-last-row-per-key. With an
    ``op_col`` the I/U/D history folds to its NET operation so the
    compacted batch applied once equals the full history applied in
    order (the MERGE-compaction identity):

    * last op ``D`` → net ``D`` (whatever came before, the key ends
      absent);
    * an ``I`` after the last ``D`` (or any ``I`` when no ``D``) →
      net ``I`` carrying the LAST change's values — the history
      guarantees the key exists afterward, so the upsert op is
      correct even when the base never had the key (the I-then-U
      case keep-last alone silently drops);
    * otherwise → net ``U`` with the last values (update-only
      history keeps U's no-op-on-absent-key semantics).

    Ties on (key, seq) are genuinely ambiguous and raise — a tie
    means two changes for one key with no defined order, and silently
    picking one corrupts the merge. One window shuffle on the key."""
    w_last = Window.partitionBy(key_col).orderBy(F.col(seq_col).desc())
    w_key = Window.partitionBy(key_col)
    ranked = changes.withColumn("_rn", F.row_number().over(w_last)).withColumn(
        "_nties", F.count("*").over(Window.partitionBy(key_col, seq_col))
    )
    if op_col is not None:
        last_d = F.max(
            F.when(F.col(op_col) == OP_DELETE, F.col(seq_col))
        ).over(w_key)
        i_after_d = (F.col(op_col) == OP_INSERT) & (
            last_d.isNull() | (F.col(seq_col) > last_d)
        )
        ranked = ranked.withColumn(
            "_net_op",
            F.when(F.col(op_col) == OP_DELETE, F.lit(OP_DELETE))
            .when(
                F.max(i_after_d.cast("int")).over(w_key) == 1,
                F.lit(OP_INSERT),
            )
            .otherwise(F.col(op_col)),
        )
    last = ranked.where(F.col("_rn") == 1)
    amb = last.where(F.col("_nties") > 1).select(key_col).limit(5).collect()
    if amb:
        keys = [r[0] for r in amb]
        raise DuplicateChangeKeyError(
            f"ambiguous change order: multiple changes share the max "
            f"{seq_col!r} for key(s) {keys} — provide a finer sequence"
        )
    if op_col is not None:
        last = last.withColumn(op_col, F.col("_net_op")).drop("_net_op")
    return last.drop("_rn", "_nties")


def _assert_unique_keys(changes: DataFrame, key_col: str) -> None:
    dups = (
        changes.groupBy(key_col)
        .count()
        .where(F.col("count") > 1)
        .limit(5)
        .collect()
    )
    if dups:
        keys = [r[0] for r in dups]
        raise DuplicateChangeKeyError(
            f"change batch has multiple changes for key(s) {keys}; "
            f"compact to the last change per key first "
            f"(compact_changes) or pass check_unique=False after "
            f"pre-compacting upstream"
        )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    op_col: str = "op",
    check_unique: bool = True,
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
    keep the LAST change per key upstream, e.g. via
    ``compact_changes``). With ``check_unique=True`` (default) a
    runtime guard counts changes per key over the small batch side
    and raises :class:`DuplicateChangeKeyError` on violation — one
    cheap aggregate job; callers that pre-compact can pass
    ``check_unique=False`` to skip it. Implementation is one left
    join of base to the batch (drop D, coalesce U) plus a union of
    I/U-absent rows anti-joined against nothing — the batch is
    scanned twice but is the small side by construction.
    """
    if check_unique:
        _assert_unique_keys(changes, key_col)
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
