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

from pyspark.sql import Column, DataFrame, Window
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


def merge_intervals(
    intervals: DataFrame,
    keys: list[str],
    start: str = "s",
    end: str = "e",
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Union of overlapping/touching intervals per key group — the
    gaps-and-islands merge (SLA uptime, covered-time accounting,
    sessionized spans). Returns one row per merged island:
    key columns + (island_start, island_end, n_intervals).

    Classic two-window formulation, zero joins: order intervals by
    (start, end), flag an island OPEN where start exceeds the running
    max of all previous ends (an interval that starts at or before
    that max overlaps/touches the running island), and prefix-sum the
    flags into island ids — then one groupBy collapses each island.
    Both windows share the group partitioning, so at scale this is
    one exchange + one sort, and the running max is O(1) state per
    row (no self-join; the naive overlap self-join is quadratic in
    interval density).

    All arithmetic is integer comparison on epoch-µs longs →
    engine-portable. Ordering is made total via ``order_tiebreak``
    (e.g. a unique id column) so both engines walk rows identically;
    the merged result itself is order-invariant, the tiebreak only
    pins peer order for bit-identical intermediate flags.
    """
    tb = order_tiebreak or []
    w_order = Window.partitionBy(*keys).orderBy(start, end, *tb)
    prev_max = F.max(end).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = intervals.select(
        *keys,
        F.col(start),
        F.col(end),
        *[F.col(c) for c in tb],  # the island window reuses the tiebreak order
        F.when(prev_max.isNull() | (F.col(start) > prev_max), F.lit(1))
        .otherwise(F.lit(0))
        .alias("_open"),
    )
    island = F.sum("_open").over(
        w_order.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("_island", island)
        .groupBy(*keys, "_island")
        .agg(
            F.min(start).alias("island_start"),
            F.max(end).alias("island_end"),
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
        )
        .drop("_island")
    )
