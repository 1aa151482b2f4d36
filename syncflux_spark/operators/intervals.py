"""Interval (range) joins, bin-bucketed so they plan as equality joins.

Spark has no native range-join optimization: a plain
``points JOIN intervals ON p.ts BETWEEN i.start AND i.end`` plans as
BroadcastNestedLoopJoin (every point probed against every interval) —
fine for a handful of intervals, quadratic death at scale. The
standard fix is bin bucketing: pick a bin width, explode each interval
to the bins it overlaps, map each point to its single containing bin,
hash-join on the bin id, then re-check exact containment. The join is
now an equality join (SortMergeJoin / shuffled hash join, partial-agg
friendly), the big point side is never duplicated (a point has exactly
one bin), and each interval is duplicated only ``ceil(len/width)+1``
times — choose the bin width near the median interval length to keep
that factor small.

Because a point's bin is unique, a (point, interval) pair can meet in
at most one bin: no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    bin_width_us: int = 3_600_000_000,
    extra_cond: Column | None = None,
    closed: str = "open",
) -> DataFrame:
    """Join each point row to every interval row that contains it.

    ``points[point_ts]``, ``intervals[start]``, ``intervals[end]`` are
    epoch-µs longs. ``closed`` picks boundary semantics: "open"
    (start < ts < end), "both", "left", or "right". ``extra_cond``
    is an optional additional join predicate over the joined columns.
    Returns the joined rows with all columns from both sides.
    """
    lo, hi = {
        "open": (F.col(start) < F.col(point_ts), F.col(point_ts) < F.col(end)),
        "both": (F.col(start) <= F.col(point_ts), F.col(point_ts) <= F.col(end)),
        "left": (F.col(start) <= F.col(point_ts), F.col(point_ts) < F.col(end)),
        "right": (F.col(start) < F.col(point_ts), F.col(point_ts) <= F.col(end)),
    }[closed]
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(F.expr(f"{start} div {bin_width_us}"), F.expr(f"{end} div {bin_width_us}"))
        ),
    )
    pt = points.withColumn("_bin", F.expr(f"{point_ts} div {bin_width_us}"))
    cond = (pt["_bin"] == iv["_bin"]) & lo & hi
    if extra_cond is not None:
        cond = cond & extra_cond
    return pt.join(iv, cond).drop("_bin")
