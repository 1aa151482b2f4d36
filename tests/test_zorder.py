"""Z-order layout quality: the clustering claim measured, not assumed.

A time-sorted layout answers time predicates with few files but
scatters any user range across ALL of them; the Morton layout must
concentrate a 2-D (user × week) predicate into a strict subset of
files on the user dimension while staying lossless.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from syncflux_spark.sources.parquet import load_table
from syncflux_spark.sources.zorder import (
    files_touched,
    read_zordered,
    write_zordered,
)

N_FILES = 16


def _layouts(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", F.col("ts_ns")
    )
    zpath = str(tmp_path / "z")
    tpath = str(tmp_path / "t")
    write_zordered(ev, zpath, "user_id", "ts_ns", n_files=N_FILES)
    (
        ev.repartitionByRange(N_FILES, "ts_ns")
        .sortWithinPartitions("ts_ns")
        .write.mode("overwrite")
        .parquet(tpath)
    )
    return read_zordered(spark, zpath), spark.read.parquet(tpath)


class TestZorderLayout:
    def test_user_range_touches_fewer_files_than_time_sort(
        self, spark, sf_dir, tmp_path
    ):
        z, t = _layouts(spark, sf_dir, tmp_path)
        # user-dimension selectivity: ~1/8 of the observed id range
        max_user = z.agg(F.max("user_id")).collect()[0][0]
        lo, hi = max_user // 8, max_user // 8 + max(1, max_user // 8)
        pred = (F.col("user_id") >= lo) & (F.col("user_id") <= hi)
        z_files = files_touched(z, pred)
        t_files = files_touched(t, pred)
        # time-sort scatters the user range over every file; z-order
        # must concentrate it (strictly fewer, and under half)
        assert t_files == N_FILES
        assert z_files <= t_files // 2, (z_files, t_files)

    def test_lossless(self, spark, sf_dir, tmp_path):
        z, _ = _layouts(spark, sf_dir, tmp_path)
        ev = load_table(spark, sf_dir, "events")
        assert z.count() == ev.count()
        a = z.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
        b = ev.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
        assert tuple(a) == tuple(b)
