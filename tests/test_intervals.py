"""binned_interval_join: boundary semantics, bin-straddling, and the
one-bin-per-point no-duplication invariant."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from syncflux_spark.operators.intervals import binned_interval_join

BIN = 100  # tiny bin width so intervals straddle several bins


@pytest.fixture(scope="module")
def frames(spark):
    # points at 0, 50, 100, 150, ..., 950
    pts = spark.range(0, 20).select((F.col("id") * 50).alias("ts_us"))
    # intervals: [0, 200], [200, 500], [450, 460] (sub-bin), [900, 2000]
    iv = spark.createDataFrame(
        [(0, 200, "a"), (200, 500, "b"), (450, 460, "c"), (900, 2000, "d")],
        "s long, e long, tag string",
    )
    return pts, iv


def _hits(df):
    return {(r.ts_us, r.tag) for r in df.select("ts_us", "tag").collect()}


class TestBinnedIntervalJoin:
    def test_closed_modes(self, spark, frames):
        pts, iv = frames
        open_hits = _hits(
            binned_interval_join(pts, iv, "ts_us", "s", "e", BIN, closed="open")
        )
        both_hits = _hits(
            binned_interval_join(pts, iv, "ts_us", "s", "e", BIN, closed="both")
        )
        # boundary points: 0 and 200 excluded from 'open' interval a
        assert (0, "a") not in open_hits and (200, "a") not in open_hits
        assert (0, "a") in both_hits and (200, "a") in both_hits
        # 200 sits on the a/b boundary: in 'both' it matches both
        assert (200, "b") in both_hits
        assert open_hits < both_hits

    def test_multi_bin_interval_no_duplicates(self, spark, frames):
        pts, iv = frames
        j = binned_interval_join(pts, iv, "ts_us", "s", "e", BIN, closed="both")
        # interval d spans bins 9..20; every in-range point matches ONCE
        d_rows = j.where(F.col("tag") == "d").groupBy("ts_us").count().collect()
        assert d_rows and all(r["count"] == 1 for r in d_rows)
        assert {r.ts_us for r in j.where(F.col("tag") == "d").collect()} == {900, 950}

    def test_sub_bin_interval(self, spark, frames):
        pts, iv = frames
        j = binned_interval_join(pts, iv, "ts_us", "s", "e", BIN, closed="both")
        # [450, 460] contains the point 450 only
        assert _hits(j.where(F.col("tag") == "c")) == {(450, "c")}

    def test_extra_cond(self, spark, frames):
        pts, iv = frames
        j = binned_interval_join(
            pts,
            iv,
            "ts_us",
            "s",
            "e",
            BIN,
            closed="both",
            extra_cond=F.col("tag") != "a",
        )
        assert not {t for t in _hits(j) if t[1] == "a"}
