"""C3/C4 orchestration tests: replicate_data(_full) over a small
catalog warehouse — the agent-layer loop (hacluster.go:213-256) on top
of the chunk-sync engine."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

from syncflux_spark.agent import replicate_data, replicate_data_full
from syncflux_spark.catalog import FieldSch, MeasurementSch, RetPol, SparkCatalog
from syncflux_spark.operators.copy import read_copied

BASE = datetime(2024, 3, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("agent_wh")
    cat = SparkCatalog(spark)
    db = "agentdb"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    cat.create_db(db)
    rp = RetPol(name="autogen", duration="720h", default=True)
    meas = MeasurementSch(
        name="cpu", fields={"usage": FieldSch("usage", "float")}, tags=["host"]
    )
    cat.create_measurement(db, rp, meas, location=str(root / "cpu"))
    rows = [
        (
            int((BASE + timedelta(hours=h)).timestamp() * 1e9),
            BASE + timedelta(hours=h),
            f"h{h % 2}",
            float(h),
        )
        for h in range(48)
    ]
    spark.createDataFrame(
        rows, "time_ns long, ts timestamp, host string, usage double"
    ).write.insertInto(f"`{db}`.`autogen__cpu`")
    yield cat, db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_replicate_data_window(spark, warehouse, tmp_path):
    cat, db = warehouse
    schema = cat.get_schema(db_filter=f"^{db}$")
    reports = replicate_data(
        spark, cat, schema, str(tmp_path),
        BASE, BASE + timedelta(hours=24), chunk="12h", num_workers=2,
    )
    assert len(reports) == 1 and reports[0].bad_chunks == []
    back = read_copied(spark, f"{tmp_path}/{db}/autogen", "cpu")
    assert back.count() == 24  # half-open window: hours 0..23


def test_replicate_data_full_clamps_to_rp(spark, warehouse, tmp_path):
    cat, db = warehouse
    schema = cat.get_schema(db_filter=f"^{db}$")
    now = BASE + timedelta(hours=48)
    reports = replicate_data_full(
        spark, cat, schema, str(tmp_path), chunk="24h",
        now=now, num_workers=2,
    )
    assert len(reports) == 1 and reports[0].bad_chunks == []
    back = read_copied(spark, f"{tmp_path}/{db}/autogen", "cpu")
    # RP duration 720h covers everything written
    assert back.count() == 48
