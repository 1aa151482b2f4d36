"""Persistable, mergeable distinct-count sketches (KMV bottom-k).

The inline KMV query (queries.py::kmv_distinct_users) answers one
scan; THIS module makes the sketch a first-class TABLE so the 100 TB
incremental pattern works: sketch each day/partition once when it
lands, persist the (group, bottom-k hash array) rows — a few KB per
group — then answer distinct-count questions over ANY union of
partitions by merging sketch tables, never rescanning data.

Correct because bottom-k is a union-mergeable order statistic:
bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)) — the k smallest
of a union can only come from each side's k smallest. Hashes are
md5-derived 48-bit values (deterministic function of the data, no
seeds), so two engines compute bit-identical sketches and the DuckDB
oracle can check the merged ESTIMATE itself, not just row counts.

Estimator: (k−1)/frac(kth smallest hash) — with 48-bit hashes that is
(k−1)·2⁴⁸ / kth, one IEEE division on exactly-representable operands.

Scale shape: build = one distinct + per-group bottom-k
(WindowGroupLimit per-partition heaps — the full hash set is never
globally sorted); merge = explode + the same bottom-k over k·groups
rows (sketch-sized, data never touched); estimate = per-row
arithmetic on the sketch table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default sketch size; estimate error ~ 1/√k ≈ 12.5%
K_DEFAULT = 64

#: 48-bit hash space (12 hex chars of md5)
_HASH_SPACE = float(2**48)


def _kmv_hash(key_col: str) -> F.Column:
    return (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10
        )
        .cast("long")
        .alias("_h")
    )


def _bottom_k(hashed: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("_h")).alias("hs"))
    )


def kmv_build(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = K_DEFAULT,
) -> DataFrame:
    """Sketch table: one row per group, ``hs`` = sorted array of the
    group's bottom-k distinct key hashes. Persist this (parquet) as
    the partition lands; it is the only thing later merges read."""
    hashed = df.select(*group_cols, _kmv_hash(key_col)).distinct()
    return _bottom_k(hashed, group_cols, k)


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int = K_DEFAULT
) -> DataFrame:
    """Merge two sketch tables into one covering the union of their
    inputs — bottomK(bottomK(A) ∪ bottomK(B)). Groups present in only
    one side pass through. Touches k·groups rows, never base data."""
    exploded = (
        a.unionByName(b)
        .select(*group_cols, F.explode("hs").alias("_h"))
        .distinct()
    )
    return _bottom_k(exploded, group_cols, k)


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = K_DEFAULT) -> DataFrame:
    """Distinct-count estimates from a sketch table:
    (group, n_sample, kth_hash, est_distinct). A group whose sketch
    never filled (n_sample < k) is exact — the sample IS the distinct
    set."""
    n = F.size("hs")
    kth = F.element_at("hs", -1)
    est = F.when(
        (n < k) | (kth == 0), n.cast("double")
    ).otherwise(F.lit(float(k - 1) * _HASH_SPACE) / kth.cast("double"))
    return sketch.select(
        *group_cols,
        n.cast("long").alias("n_sample"),
        kth.cast("long").alias("kth_hash"),
        est.alias("est_distinct"),
    )


# -- Count-Min sketch tables ------------------------------------------------

#: CMS geometry: d hash rows × w buckets (disjoint md5 byte slices)
CMS_DEPTH, CMS_WIDTH = 4, 256


def _cms_cells(key_col: str):
    h = F.md5(F.col(key_col).cast("string"))
    return [
        F.struct(
            F.lit(i).alias("i"),
            F.conv(F.substring(h, 1 + 2 * i, 2), 16, 10)
            .cast("long")
            .alias("bucket"),
        )
        for i in range(CMS_DEPTH)
    ]


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch as a TABLE: (i, bucket, cnt) — one row per
    non-empty cell of the d×w matrix (≤ 1024 rows regardless of input
    size). One explode(d)+partial-agg pass; persist it per
    day/partition as data lands. ``weight_col`` sums a weight instead
    of counting rows."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        df.select(F.explode(F.array(*_cms_cells(key_col))).alias("c"), w.alias("_w"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CMS tables: cell-wise addition — commutative and
    associative, so any merge tree over any partitioning yields the
    identical matrix. Touches ≤ 2·d·w rows, never base data."""
    return (
        a.unionByName(b)
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def cms_query(sketch: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point-frequency estimates for ``keys``: est = min over the d
    rows of the key's cell — one-sided (est ≥ true). The sketch
    broadcasts (≤ d·w rows); the probe is a map-side join."""
    probes = keys.select(
        key_col, F.explode(F.array(*_cms_cells(key_col))).alias("c")
    ).select(key_col, F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_n"))
    )


# -- quantile sketch tables (bottom-k priority samples) ---------------------

#: default quantile-sample size; rank error ~ 1/√k ≈ 6%
QSK_K_DEFAULT = 256


def qsk_build(
    df: DataFrame,
    value_col: str,
    key_col: str,
    group_cols: list[str],
    k: int = QSK_K_DEFAULT,
) -> DataFrame:
    """Quantile sketch as a TABLE: one row per group, ``sk`` = the
    group's k rows of smallest md5-priority, stored as a sorted
    array of (hash, value) structs. The priority is a deterministic
    hash of ``key_col`` (a stable row id), independent of the value —
    so the retained rows are a uniform-without-replacement sample
    whose order statistics estimate the population quantiles with
    rank error ~1/√k. Persist per day/partition as data lands.

    Mergeable for the same reason KMV is: the k smallest priorities
    of a union can only come from each side's k smallest —
    bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)). Deterministic
    (no seeds), so an oracle engine reproduces the sketch — and the
    merged quantile estimates — bit-for-bit.

    Scale shape: one per-group bottom-k (WindowGroupLimit
    per-partition heaps; the input is never globally sorted); sketch
    rows are O(k) per group regardless of input size."""
    hashed = df.select(
        *group_cols,
        _kmv_hash(key_col),
        F.col(value_col).cast("double").alias("_v"),
    )
    w = Window.partitionBy(*group_cols).orderBy("_h", "_v")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list(F.struct("_h", "_v"))).alias("sk"))
    )


def qsk_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int = QSK_K_DEFAULT
) -> DataFrame:
    """Merge two quantile-sketch tables into one covering the union
    of their inputs. Touches k·groups rows, never base data. Rows
    sketched on both sides (same priority AND value) collapse via
    distinct, mirroring kmv_merge."""
    exploded = (
        a.unionByName(b)
        .select(*group_cols, F.explode("sk").alias("e"))
        .select(
            *group_cols,
            F.col("e._h").alias("_h"),
            F.col("e._v").alias("_v"),
        )
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("_h", "_v")
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list(F.struct("_h", "_v"))).alias("sk"))
    )


def qsk_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    qs: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Nearest-rank quantile estimates from a sketch table: per
    group, sort the sampled values and pick rank ceil(q·n) for each
    requested quantile. Pure per-row array arithmetic on the sketch —
    base data is never touched. Column names are p50/p90/p99-style."""
    vs = F.array_sort(F.transform("sk", lambda e: e["_v"]))
    n = F.size("sk")
    cols = [*group_cols, n.cast("long").alias("n_sample")]
    for q in qs:
        rank = F.greatest(
            F.lit(1), F.ceil(F.lit(q) * n).cast("int")
        )
        label = f"p{q * 100:g}".replace(".", "_")
        cols.append(F.element_at(vs, rank).alias(label))
    return sketch.select(*cols)


def kmv_rolling_merge(
    daily: DataFrame,
    day_col: str = "d",
    window_days: int = 7,
    k: int = K_DEFAULT,
) -> DataFrame:
    """Rolling-window sketch merge: from a PER-DAY sketch table
    (``day_col``, ``hs``) — the thing a daily ingest persists — build
    the merged sketch for every trailing ``window_days`` window (the
    rolling-WAU/MAU shape). Each day's ≤k hashes contribute to the
    ``window_days`` output days that cover it via an offset explode
    (pure equi-plan, no range join), then the standard bottom-k
    truncation per output day. Cost is O(days · k · window) sketch
    rows; the base event data is NEVER rescanned — which is the whole
    point vs the exact explode-per-event form (sliding_distinct_users)
    whose cost rides distinct user-days. Output days are restricted
    to days present in the input (left-edge windows are partial, as
    in the exact form)."""
    from syncflux_spark.utils import eager_persist

    # `daily` feeds both the contribution fan-out and the day spine;
    # without pinning it, BOTH subplans re-run the sketch build (a
    # full base-data scan when `daily` is computed inline rather than
    # read from a persisted sketch table). The sketch is k·groups
    # rows — persisting it is always cheap (caught by
    # tests/test_plans.py::test_rolling_sketch_never_touches_events_twice)
    daily = eager_persist(daily)
    offs = F.array(*[F.lit(i) for i in range(window_days)])
    # one generator per select, and a generator can't nest inside an
    # expression: unnest the sketch, emit the offset, then add
    contrib = (
        daily.select(F.col(day_col), F.explode("hs").alias("_h"))
        .select(F.col(day_col), "_h", F.explode(offs).alias("_off"))
        .select((F.col(day_col) + F.col("_off")).alias("_d_out"), "_h")
    )
    spine = daily.select(F.col(day_col).alias("_d_out")).distinct()
    exploded = (
        contrib.join(spine, "_d_out", "left_semi")
        .select(F.col("_d_out").alias(day_col), "_h")
        .distinct()
    )
    return _bottom_k(exploded, [day_col], k)


def qsk_rolling_merge(
    daily: DataFrame,
    day_col: str = "d",
    window_days: int = 7,
    k: int = QSK_K_DEFAULT,
) -> DataFrame:
    """Rolling-window QUANTILE sketch merge — the percentile twin of
    :func:`kmv_rolling_merge`: from a per-day quantile-sketch table
    (``day_col``, ``sk``), build the merged sketch for every trailing
    ``window_days`` window by fanning each day's ≤k (priority, value)
    pairs to the windows that cover it, then re-truncating bottom-k
    per output day. Feed the result to :func:`qsk_quantiles` for a
    rolling p50/p90/p99 series — trailing-window percentiles from
    persisted daily sketches, the base data never rescanned."""
    from syncflux_spark.utils import eager_persist

    daily = eager_persist(daily)  # feeds fan-out AND spine (see kmv twin)
    offs = F.array(*[F.lit(i) for i in range(window_days)])
    contrib = (
        daily.select(
            F.col(day_col),
            F.explode("sk").alias("e"),
        )
        .select(
            F.col(day_col),
            F.col("e._h").alias("_h"),
            F.col("e._v").alias("_v"),
            F.explode(offs).alias("_off"),
        )
        .select(
            (F.col(day_col) + F.col("_off")).alias("_d_out"), "_h", "_v"
        )
    )
    spine = daily.select(F.col(day_col).alias("_d_out")).distinct()
    exploded = (
        contrib.join(spine, "_d_out", "left_semi")
        .select(F.col("_d_out").alias(day_col), "_h", "_v")
        .distinct()
    )
    w = Window.partitionBy(day_col).orderBy("_h", "_v")
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(day_col)
        .agg(F.sort_array(F.collect_list(F.struct("_h", "_v"))).alias("sk"))
    )
