"""Corpus snapshot diffing — the data-versioning primitive a training
pipeline runs between crawl snapshots: which documents were added,
removed, or changed since the last corpus build, so downstream stages
(dedup indexes, tokenized shards) reprocess only the delta.

The reference's sync loop solves the time-series version of this
problem by chunked timestamp ranges (pkg/agent/sync.go:140-204); for
unordered document corpora the delta is identity + content digest:
a full outer join on the document key with md5 comparison on text.
One hash shuffle per side, digest computed map-side; at 100 TB both
snapshots shuffle once on doc_id — the minimum possible for an
unordered diff — and the output is the (usually tiny) delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status, old_digest, new_digest) where status ∈ added |
    removed | changed | unchanged. Content equality is md5 of the raw
    text — byte-identical semantics, replayable by any engine."""
    o = old.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("old_digest")
    )
    n = new.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("new_digest")
    )
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias("status"), "old_digest", "new_digest")


def diff_summary(diff: DataFrame) -> DataFrame:
    """Per-status counts of a :func:`snapshot_diff` result — the
    one-line health row a snapshot promotion gate checks (a diff
    that is 90% 'changed' between daily crawls means the keying is
    broken, not the web)."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
