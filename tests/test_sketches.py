"""Sketch-specific invariants beyond oracle parity: the one-sided
error guarantees that make CMS/Bloom/KMV usable as filters — parity
proves both engines agree; these prove the sketches keep their
contracts (no undercount, no false negative, sane estimate ranges).
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F

QUERIES = entry_mod.queries()


class TestCountMin:
    def test_estimate_never_undercounts(self, spark, sf_dir):
        rows = QUERIES["cms_user_counts"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.est_n >= r.exact_n, (r.user_id, r.est_n, r.exact_n)
            assert r.overcount == r.est_n - r.exact_n


class TestBloom:
    def test_no_false_negatives(self, spark, sf_dir):
        row = QUERIES["bloom_purchase_filter"](spark, sf_dir).collect()[0]
        # every true member must be claimed: claimed ⊇ members
        assert row.n_claimed >= row.n_members
        assert row.n_false_pos == row.n_claimed - row.n_members
        if row.n_users > row.n_members:
            assert 0.0 <= row.fp_rate <= 1.0


class TestKmvOverlap:
    def test_estimates_in_range(self, spark, sf_dir):
        rows = QUERIES["kmv_set_overlap"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r.jaccard_est <= 1.0
            assert r.est_union >= float(r.n_sample) - 1e-9
            # intersection estimate can't exceed the union estimate
            assert r.est_intersection <= r.est_union + 1e-9


class TestKmvSketchTables:
    """operators/sketches.py: the persistable/mergeable KMV form."""

    def _df(self, spark, lo, hi, group="a"):
        return spark.createDataFrame(
            [(group, i) for i in range(lo, hi)], "g string, k long"
        )

    def test_merge_equals_sketch_of_union(self, spark):
        from syncflux_spark.operators.sketches import kmv_build, kmv_merge

        a = self._df(spark, 0, 500)
        b = self._df(spark, 300, 900)  # overlapping
        sa = kmv_build(a, "k", ["g"], k=32)
        sb = kmv_build(b, "k", ["g"], k=32)
        merged = kmv_merge(sa, sb, ["g"], k=32).collect()[0].hs
        direct = kmv_build(a.unionByName(b), "k", ["g"], k=32).collect()[0].hs
        assert merged == direct  # the mergeability identity, exactly

    def test_small_group_is_exact(self, spark):
        from syncflux_spark.operators.sketches import kmv_build, kmv_estimate

        df = self._df(spark, 0, 10)
        est = kmv_estimate(
            kmv_build(df, "k", ["g"], k=64), ["g"], k=64
        ).collect()[0]
        assert est.n_sample == 10 and est.est_distinct == 10.0

    def test_estimate_within_error_budget(self, spark):
        from syncflux_spark.operators.sketches import kmv_build, kmv_estimate

        df = self._df(spark, 0, 20_000)
        est = kmv_estimate(
            kmv_build(df, "k", ["g"], k=64), ["g"], k=64
        ).collect()[0]
        # 1/sqrt(64) = 12.5% nominal; allow 3 sigma
        assert abs(est.est_distinct - 20_000) / 20_000 < 0.375

    def test_roundtrip_through_parquet(self, spark, tmp_path):
        """The sketch is a plain table: persist, reload, merge —
        the incremental pattern."""
        from syncflux_spark.operators.sketches import (
            kmv_build,
            kmv_estimate,
            kmv_merge,
        )

        p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
        kmv_build(self._df(spark, 0, 400), "k", ["g"]).write.parquet(p1)
        kmv_build(self._df(spark, 400, 800), "k", ["g"]).write.parquet(p2)
        merged = kmv_merge(
            spark.read.parquet(p1), spark.read.parquet(p2), ["g"]
        )
        est = kmv_estimate(merged, ["g"]).collect()[0]
        assert abs(est.est_distinct - 800) / 800 < 0.375


class TestCmsSketchTables:
    def _df(self, spark, pairs):
        rows = [(k,) for k, n in pairs for _ in range(n)]
        return spark.createDataFrame(rows, "k long")

    def test_merge_equals_build_of_union(self, spark):
        from syncflux_spark.operators.sketches import cms_build, cms_merge

        a = self._df(spark, [(1, 5), (2, 3)])
        b = self._df(spark, [(2, 4), (3, 7)])
        merged = {
            (r.i, r.bucket): r.cnt
            for r in cms_merge(
                cms_build(a, "k"), cms_build(b, "k")
            ).collect()
        }
        direct = {
            (r.i, r.bucket): r.cnt
            for r in cms_build(a.unionByName(b), "k").collect()
        }
        assert merged == direct

    def test_estimates_one_sided_and_tight_when_sparse(self, spark):
        from syncflux_spark.operators.sketches import cms_build, cms_query

        df = self._df(spark, [(i, i) for i in range(1, 11)])
        keys = spark.createDataFrame([(i,) for i in range(1, 11)], "k long")
        est = {
            r.k: r.est_n
            for r in cms_query(cms_build(df, "k"), keys, "k").collect()
        }
        for i in range(1, 11):
            assert est[i] >= i  # one-sided error
        # 10 keys in 4x256 cells: collisions are rare -> mostly exact
        exact = sum(1 for i in range(1, 11) if est[i] == i)
        assert exact >= 8

    def test_absent_key_estimates_zero(self, spark):
        from syncflux_spark.operators.sketches import cms_build, cms_query

        df = self._df(spark, [(1, 3)])
        keys = spark.createDataFrame([(999999,)], "k long")
        est = cms_query(cms_build(df, "k"), keys, "k").collect()[0]
        assert est.est_n in (0, 3)  # 0 unless all 4 cells collide


class TestQuantileSketchTables:
    """operators/sketches.py: bottom-k priority-sample quantiles."""

    def _df(self, spark, lo, hi, group="a"):
        # value = key scaled: uniform values 0..(hi-lo), exact
        # population quantiles known
        return spark.createDataFrame(
            [(group, i, float(i)) for i in range(lo, hi)],
            "g string, k long, v double",
        )

    def test_merge_equals_sketch_of_union(self, spark):
        from syncflux_spark.operators.sketches import qsk_build, qsk_merge

        a = self._df(spark, 0, 500)
        b = self._df(spark, 300, 900)  # overlapping rows collapse
        sa = qsk_build(a, "v", "k", ["g"], k=32)
        sb = qsk_build(b, "v", "k", ["g"], k=32)
        merged = qsk_merge(sa, sb, ["g"], k=32).collect()[0].sk
        direct = qsk_build(a.unionByName(b).distinct(), "v", "k", ["g"], k=32)
        assert merged == direct.collect()[0].sk  # mergeability, exactly

    def test_small_group_keeps_every_row(self, spark):
        from syncflux_spark.operators.sketches import qsk_build, qsk_quantiles

        df = self._df(spark, 0, 10)
        out = qsk_quantiles(
            qsk_build(df, "v", "k", ["g"], k=64), ["g"]
        ).collect()[0]
        assert out.n_sample == 10
        # full sample => exact nearest-rank quantiles of 0..9
        assert out.p50 == 4.0 and out.p90 == 8.0 and out.p99 == 9.0

    def test_quantiles_within_rank_error(self, spark):
        from syncflux_spark.operators.sketches import qsk_build, qsk_quantiles

        n = 20_000
        df = self._df(spark, 0, n)
        out = qsk_quantiles(
            qsk_build(df, "v", "k", ["g"], k=256), ["g"]
        ).collect()[0]
        # rank error ~1/sqrt(256) = 6.25%; allow 3 sigma
        for q, got in ((0.5, out.p50), (0.9, out.p90), (0.99, out.p99)):
            assert abs(got / n - q) < 0.1875, (q, got)

    def test_roundtrip_through_parquet(self, spark, tmp_path):
        from syncflux_spark.operators.sketches import (
            qsk_build,
            qsk_merge,
            qsk_quantiles,
        )

        p1, p2 = str(tmp_path / "q1"), str(tmp_path / "q2")
        qsk_build(self._df(spark, 0, 400), "v", "k", ["g"]).write.parquet(p1)
        qsk_build(self._df(spark, 400, 800), "v", "k", ["g"]).write.parquet(p2)
        merged = qsk_merge(
            spark.read.parquet(p1), spark.read.parquet(p2), ["g"]
        )
        out = qsk_quantiles(merged, ["g"]).collect()[0]
        assert abs(out.p50 / 800 - 0.5) < 0.1875


class TestKmvRollingMerge:
    def test_rolling_equals_direct_window_sketch(self, spark):
        """The rolling merge of per-day sketches must equal a sketch
        built directly over each trailing window's rows — the
        mergeability identity applied per window."""
        from syncflux_spark.operators.sketches import (
            kmv_build,
            kmv_rolling_merge,
        )

        rows = [(d, d * 1000 + u) for d in range(10) for u in range(d * 30 + 5)]
        df = spark.createDataFrame(rows, "d long, user long")
        daily = kmv_build(df, "user", ["d"], k=32)
        rolled = {
            r.d: r.hs
            for r in kmv_rolling_merge(daily, "d", window_days=3, k=32).collect()
        }
        for day in range(10):
            win = df.where((F.col("d") >= day - 2) & (F.col("d") <= day))
            direct = kmv_build(
                win.withColumn("d", F.lit(day)), "user", ["d"], k=32
            ).collect()[0].hs
            assert rolled[day] == direct, day


class TestQskRollingMerge:
    def test_rolling_equals_direct_window_sketch(self, spark):
        from syncflux_spark.operators.sketches import (
            qsk_build,
            qsk_rolling_merge,
        )

        rows = [
            (d, d * 1000 + u, float((d * 7 + u) % 53))
            for d in range(8)
            for u in range(d * 25 + 10)
        ]
        df = spark.createDataFrame(rows, "d long, key long, v double")
        daily = qsk_build(df, "v", "key", ["d"], k=32)
        rolled = {
            r.d: r.sk
            for r in qsk_rolling_merge(daily, "d", window_days=3, k=32).collect()
        }
        from pyspark.sql import functions as F

        for day in range(8):
            win = df.where((F.col("d") >= day - 2) & (F.col("d") <= day))
            direct = qsk_build(
                win.withColumn("d", F.lit(day)), "v", "key", ["d"], k=32
            ).collect()[0].sk
            assert rolled[day] == direct, day


# -- property-based mergeability ------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_keys = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60
)


@settings(max_examples=20, deadline=None)
@given(a=_keys, b=_keys)
def test_kmv_mergeability_property(spark, a, b):
    """bottomK(A ∪ B) == bottomK(bottomK(A) ∪ bottomK(B)) for ANY
    two key multisets — the identity every incremental sketch
    deployment silently relies on, hypothesis-swept."""
    from syncflux_spark.operators.sketches import kmv_build, kmv_merge

    da = spark.createDataFrame([("g", k) for k in a], "g string, k long")
    db = spark.createDataFrame([("g", k) for k in b], "g string, k long")
    merged = kmv_merge(
        kmv_build(da, "k", ["g"], k=16),
        kmv_build(db, "k", ["g"], k=16),
        ["g"],
        k=16,
    ).collect()[0].hs
    direct = kmv_build(da.unionByName(db), "k", ["g"], k=16).collect()[0].hs
    assert merged == direct


@settings(max_examples=20, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 50), st.integers(0, 100_000), st.integers(-5, 5)
        ),
        min_size=1,
        max_size=80,
        unique_by=lambda t: t[1],
    )
)
def test_global_cumsum_property(spark, rows):
    """global_cumsum == SUM() OVER (ORDER BY ...) on arbitrary data
    with duplicate sort keys and negative values."""
    from pyspark.sql import Window
    from syncflux_spark.utils import global_cumsum

    df = spark.createDataFrame(rows, "k long, id long, v long").repartition(5)
    got = {
        r.id: r.c
        for r in global_cumsum(df, ["k", "id"], "v", out_col="c").collect()
    }
    w = Window.orderBy("k", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = {r.id: r.c for r in df.withColumn("c", F.sum("v").over(w)).collect()}
    assert got == ref
