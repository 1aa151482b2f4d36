"""Catalog tests: schema discovery, regex filtering, replication,
rename overlays, retention metadata (SURVEY §2.3-§2.4 / §5.1)."""

from __future__ import annotations

import pytest

from syncflux_spark.catalog import (
    FieldSch,
    MeasurementSch,
    RetPol,
    SparkCatalog,
)


@pytest.fixture(scope="module")
def cat(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("warehouse")
    c = SparkCatalog(spark)
    c.create_db("telegraf")
    c.create_db("app")
    cpu = MeasurementSch(
        name="cpu",
        tags=["host", "region"],
        fields={
            "usage": FieldSch("usage", "float"),
            "cores": FieldSch("cores", "integer"),
            "total": FieldSch("total", "unsigned"),
            "up": FieldSch("up", "boolean"),
            "note": FieldSch("note", "string"),
        },
    )
    mem = MeasurementSch(name="mem", tags=["host"], fields={"used": FieldSch("used", "float")})
    reqs = MeasurementSch(name="requests", tags=["route"], fields={"n": FieldSch("n", "integer")})
    autogen = RetPol(name="autogen", duration="0s", default=True)
    short = RetPol(name="short", duration="720h", default=False)
    for m in (cpu, mem):
        c.create_measurement("telegraf", autogen, m, location=str(root / f"t_{m.name}"))
    c.create_measurement("telegraf", short, mem, location=str(root / "t_mem_short"))
    c.create_measurement("app", autogen, reqs, location=str(root / "a_req"))
    yield c
    spark.sql("DROP DATABASE IF EXISTS telegraf CASCADE")
    spark.sql("DROP DATABASE IF EXISTS app CASCADE")
    spark.sql("DROP DATABASE IF EXISTS telegraf_copy CASCADE")


class TestDiscovery:
    def test_databases(self, cat):
        dbs = cat.get_databases()
        assert {"telegraf", "app"} <= set(dbs)
        assert "_internal" not in dbs

    def test_retention_policies(self, cat):
        rps = {r.name: r for r in cat.get_retention_policies("telegraf")}
        assert rps["autogen"].default and rps["autogen"].duration == "0s"
        assert not rps["short"].default and rps["short"].duration == "720h"

    def test_measurements(self, cat):
        assert cat.get_measurements("telegraf", "autogen") == ["cpu", "mem"]
        assert cat.get_measurements("telegraf", "short") == ["mem"]

    def test_fields_typed(self, cat):
        fields = cat.get_fields("telegraf", "cpu")
        assert fields["usage"].type == "float"
        assert fields["cores"].type == "integer"
        assert fields["total"].type == "unsigned"  # uint64 → decimal(20,0)
        assert fields["up"].type == "boolean"
        assert fields["note"].type == "string"
        assert "host" not in fields  # tags are not fields
        assert cat.get_tags("telegraf", "cpu") == ["host", "region"]


class TestGetSchema:
    def test_regex_filters(self, cat):
        # F1 semantics: hacluster.go:85-143
        sch = cat.get_schema(db_filter="tele.*", meas_filter="c.*")
        assert len(sch) == 1 and sch[0].name == "telegraf"
        assert set(sch[0].rps) == {"autogen"}
        assert set(sch[0].rps["autogen"].measurements) == {"cpu"}

    def test_no_match_empty(self, cat):
        assert cat.get_schema(db_filter="nope") == []

    def test_rename_overlay(self, cat):
        sch = cat.get_schema(db_filter="telegraf", new_db="telegraf_copy")
        assert sch[0].target_name == "telegraf_copy"


class TestReplicateSchema:
    def test_replicate_with_rename(self, cat, spark, tmp_path):
        sch = cat.get_schema(db_filter="telegraf", new_db="telegraf_copy")
        cat.replicate_schema(sch, location_root=str(tmp_path))
        assert cat.get_measurements("telegraf_copy", "autogen") == ["cpu", "mem"]
        fields = cat.get_fields("telegraf_copy", "cpu")
        assert fields["total"].type == "unsigned"
        # schema of the created table matches source types
        df = cat.measurement_df("telegraf_copy", "cpu")
        kinds = dict(df.dtypes)
        assert kinds["usage"] == "double"
        assert kinds["total"] == "decimal(20,0)"
        assert kinds["time_ns"] == "bigint"


class TestRetentionEnforcement:
    def test_expired_rows_deleted(self, cat, spark, tmp_path):
        """A table under a finite-duration RP must physically shrink
        when enforce_retention runs past its cutoff, keep survivors
        intact, and keep its RP metadata readable afterwards."""
        rp = RetPol(name="week", duration="168h", default=True)
        m = MeasurementSch(
            name="temp", tags=["host"], fields={"v": FieldSch("v", "float")}
        )
        cat.create_db("expiry")
        cat.create_measurement("expiry", rp, m, location=str(tmp_path / "temp"))
        try:
            hour_ns = 3_600 * 10**9
            now_ns = 1_700_000_000 * 10**9
            rows = [
                # 3 expired (older than 168h), 2 surviving
                (now_ns - 200 * hour_ns, "a", 1.0),
                (now_ns - 180 * hour_ns, "a", 2.0),
                (now_ns - 169 * hour_ns, "b", 3.0),
                (now_ns - 100 * hour_ns, "a", 4.0),
                (now_ns - 1 * hour_ns, "b", 5.0),
            ]
            df = spark.createDataFrame(
                [(t, None, h, v) for t, h, v in rows],
                "time_ns bigint, ts timestamp, host string, v double",
            )
            df.write.insertInto("expiry.week__temp")
            dropped = cat.enforce_retention("expiry", now_ns)
            assert dropped["expiry.week__temp"] == 3
            left = spark.table("expiry.week__temp")
            assert left.count() == 2
            assert sorted(r["v"] for r in left.collect()) == [4.0, 5.0]
            # idempotent: second pass drops nothing (and skips rewrite)
            assert cat.enforce_retention("expiry", now_ns) == {
                "expiry.week__temp": 0
            }
            # RP metadata survives the overwrite
            rps = {r.name: r for r in cat.get_retention_policies("expiry")}
            assert rps["week"].duration == "168h"
        finally:
            spark.sql("DROP DATABASE IF EXISTS expiry CASCADE")


class TestErasure:
    def test_erase_keys_deletes_across_tables(self, cat, spark, tmp_path):
        """erase_keys must remove every row for the subject keys from
        every table carrying the key column, skip tables without it,
        report per-table drop counts, and be idempotent."""
        rp = RetPol(name="autogen", duration="0s", default=True)
        m1 = MeasurementSch(
            name="clicks", tags=["host"], fields={"v": FieldSch("v", "float")}
        )
        cat.create_db("gdpr")
        cat.create_measurement("gdpr", rp, m1, location=str(tmp_path / "c1"))
        try:
            df = spark.createDataFrame(
                [
                    (1_000, None, "u1", 1.0),
                    (2_000, None, "u2", 2.0),
                    (3_000, None, "u1", 3.0),
                    (4_000, None, "u3", 4.0),
                ],
                "time_ns bigint, ts timestamp, host string, v double",
            )
            df.write.insertInto("gdpr.autogen__clicks")
            dropped = cat.erase_keys("gdpr", "host", ["u1", "u9"])
            assert dropped["gdpr.autogen__clicks"] == 2
            left = spark.table("gdpr.autogen__clicks")
            assert left.count() == 2
            assert sorted(r["host"] for r in left.collect()) == ["u2", "u3"]
            # second pass: nothing left to erase, rewrite skipped
            assert cat.erase_keys("gdpr", "host", ["u1"]) == {
                "gdpr.autogen__clicks": 0
            }
            # a table without the key column is skipped entirely
            assert "gdpr.autogen__nokey" not in dropped
        finally:
            spark.sql("DROP DATABASE IF EXISTS gdpr CASCADE")


class TestOperatorsMdFreshness:
    def test_operators_md_matches_registry(self):
        """OPERATORS.md must document exactly the registry (the r10
        verdict caught it stale by one entry — regenerated a commit
        too early). gen_operators_md.check is the same probe the
        --check CLI mode runs."""
        import os
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, os.path.join(repo, "tools"))
        import gen_operators_md as g

        assert g.check(os.path.join(repo, "OPERATORS.md")) == []

    def test_check_flags_a_stale_fixture(self, tmp_path):
        """A deliberately stale file must fail the probe (both the
        count and the name-set classes)."""
        import os
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, os.path.join(repo, "tools"))
        import gen_operators_md as g

        stale = tmp_path / "OPERATORS.md"
        stale.write_text(
            "# OPERATORS\n\n1 registered queries (x).\n\n"
            "| query | gate | what |\n|---|---|---|\n"
            "| `made_up_query` | oracle | nothing |\n"
        )
        problems = g.check(str(stale))
        assert any("documented count 1" in p for p in problems)
        assert any("made_up_query" in p for p in problems)
        assert any("undocumented" in p for p in problems)
