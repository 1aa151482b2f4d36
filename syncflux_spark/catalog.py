"""Catalog: databases, retention policies, measurements, fields.

Spark-native re-expression of the reference's schema layer:

- S3 ``GetDataBases``      (pkg/agent/client.go:158-183)
- S4 ``GetRetentionPolicies`` (pkg/agent/client.go:185-233)
- S5 ``GetMeasurements``   (pkg/agent/client.go:271-310)
- S6 ``GetFields``         (pkg/agent/client.go:235-269)
- D1-D3 ``CreateDB``/``CreateRP``/``SetDefaultRP`` (client.go:84-156)
- D4 ``ReplicateSchema``   (pkg/agent/hacluster.go:165-211)
- F1 ``GetSchema`` regex filtering (hacluster.go:75-162)
- F2 rename overlays (pkg/agent/agent.go:157-229)

Mapping (SURVEY §1.4): an Influx *database* is a Spark SQL namespace;
a *retention policy* is table-level metadata (`sf.rp.*` properties)
plus a time-partitioned layout whose enforcement is a partition-drop
job; a *measurement* is one table whose schema is
(time cols, tag cols, field cols). Field types map per SURVEY §1.2
(float→double, integer→long, unsigned→decimal(20,0), boolean, string).

All of this is metadata-plane code: it runs on the driver against the
session catalog and never touches data, so scale is a non-issue.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Influx field type → Spark type (SURVEY §1.2; parse logic
# pkg/agent/client.go:430-466; uint64 per CHANGELOG.md:1-5).
INFLUX_TO_SPARK: dict[str, T.DataType] = {
    "float": T.DoubleType(),
    "integer": T.LongType(),
    "unsigned": T.DecimalType(20, 0),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
}

SPARK_TO_INFLUX: dict[str, str] = {
    "double": "float",
    "bigint": "integer",
    "decimal(20,0)": "unsigned",
    "boolean": "boolean",
    "string": "string",
}

#: Databases never replicated (pkg/agent/client.go:169, 86-88).
EXCLUDED_DATABASES = frozenset({"_internal"})


@dataclass
class FieldSch:
    """pkg/agent/hacluster.go:22-25."""

    name: str
    type: str  # influx type name

    @property
    def spark_type(self) -> T.DataType:
        return INFLUX_TO_SPARK.get(self.type, T.StringType())


@dataclass
class MeasurementSch:
    """pkg/agent/hacluster.go:17-20."""

    name: str
    fields: dict[str, FieldSch] = field(default_factory=dict)
    tags: list[str] = field(default_factory=list)


@dataclass
class RetPol:
    """pkg/agent/client.go:15-22. Duration 0/None = infinite."""

    name: str
    duration: str = "0s"
    shard_duration: str = "168h"
    n_replicas: int = 1
    default: bool = False
    measurements: dict[str, MeasurementSch] = field(default_factory=dict)


@dataclass
class InfluxSchDb:
    """pkg/agent/hacluster.go:9-15. ``new_name``/``new_def_rp`` carry
    the -newdb/-newrp rename overlay (F2, agent.go:157-229)."""

    name: str
    new_name: str = ""
    new_def_rp: str = ""
    rps: dict[str, RetPol] = field(default_factory=dict)

    @property
    def target_name(self) -> str:
        return self.new_name or self.name


# ---------------------------------------------------------------------------
# Property encoding for RP metadata on Spark tables/databases
# ---------------------------------------------------------------------------

RP_PROP_PREFIX = "sf.rp."


def _rp_props(rp: RetPol) -> dict[str, str]:
    return {
        f"{RP_PROP_PREFIX}name": rp.name,
        f"{RP_PROP_PREFIX}duration": rp.duration,
        f"{RP_PROP_PREFIX}shard_duration": rp.shard_duration,
        f"{RP_PROP_PREFIX}replicas": str(rp.n_replicas),
        f"{RP_PROP_PREFIX}default": str(rp.default).lower(),
    }


class SparkCatalog:
    """The engine's catalog facade over ``spark.catalog`` + SQL DDL.

    Table naming: measurement ``m`` in database ``db`` under retention
    policy ``rp`` is table ``db.rp__m`` (Spark namespaces are 2-level;
    the RP becomes a table-name prefix + TBLPROPERTIES). The default RP
    is also reachable without a prefix via the bare name convention.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark

    # -- S3 -----------------------------------------------------------------
    def get_databases(self) -> list[str]:
        """S3 ``GetDataBases``: list namespaces, dropping _internal and
        Spark's own default unless it holds measurements."""
        return [
            d.name
            for d in self.spark.catalog.listDatabases()
            if d.name not in EXCLUDED_DATABASES
        ]

    # -- S4 -----------------------------------------------------------------
    def get_retention_policies(self, db: str) -> list[RetPol]:
        """S4: RPs are recovered from per-table ``sf.rp.*`` properties;
        distinct (rp name) across the DB's tables."""
        rps: dict[str, RetPol] = {}
        for tbl in self.spark.catalog.listTables(db):
            props = self._table_props(f"{db}.{tbl.name}")
            name = props.get(f"{RP_PROP_PREFIX}name")
            if not name:
                continue
            rps.setdefault(
                name,
                RetPol(
                    name=name,
                    duration=props.get(f"{RP_PROP_PREFIX}duration", "0s"),
                    shard_duration=props.get(f"{RP_PROP_PREFIX}shard_duration", "168h"),
                    n_replicas=int(props.get(f"{RP_PROP_PREFIX}replicas", "1")),
                    default=props.get(f"{RP_PROP_PREFIX}default", "false") == "true",
                ),
            )
        return list(rps.values())

    # -- S5 -----------------------------------------------------------------
    def get_measurements(self, db: str, rp: str | None = None) -> list[str]:
        """S5 ``GetMeasurements``: tables in the namespace, filtered to
        one RP prefix when given. (The reference's 3ms-per-measurement
        throttle and unused mesafilter arg are quirks, not semantics —
        SURVEY §4.)"""
        out = []
        for tbl in self.spark.catalog.listTables(db):
            if "__" in tbl.name:
                trp, meas = tbl.name.split("__", 1)
            else:
                trp, meas = "autogen", tbl.name
            if rp is None or trp == rp:
                out.append(meas)
        return sorted(out)

    # -- S6 -----------------------------------------------------------------
    def get_fields(self, db: str, measurement: str, rp: str = "autogen") -> dict[str, FieldSch]:
        """S6 ``GetFields``: field name → influx type from the table
        schema. Tag columns (strings flagged in ``sf.tags`` property)
        and time columns are excluded, mirroring `show field keys`."""
        tbl = self._table_name(db, rp, measurement)
        props = self._table_props(tbl)
        tags = set((props.get("sf.tags") or "").split(",")) - {""}
        out: dict[str, FieldSch] = {}
        for f in self.spark.table(tbl).schema.fields:
            if f.name in ("time", "time_ns", "ts") or f.name in tags:
                continue
            influx_t = SPARK_TO_INFLUX.get(f.dataType.simpleString(), "string")
            out[f.name] = FieldSch(name=f.name, type=influx_t)
        return out

    def get_tags(self, db: str, measurement: str, rp: str = "autogen") -> list[str]:
        tbl = self._table_name(db, rp, measurement)
        props = self._table_props(tbl)
        return sorted(set((props.get("sf.tags") or "").split(",")) - {""})

    # -- D1 -----------------------------------------------------------------
    def create_db(self, db: str, default_rp: RetPol | None = None) -> None:
        """D1 ``CreateDB`` (client.go:84-108); skips _internal."""
        if db in EXCLUDED_DATABASES:
            return
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
        # default-RP metadata lands on each table at creation (D2).

    # -- D2/D3 --------------------------------------------------------------
    def create_measurement(
        self,
        db: str,
        rp: RetPol,
        measurement: MeasurementSch,
        location: str | None = None,
    ) -> None:
        """D2-flavored: materialize one measurement table carrying its
        RP metadata as TBLPROPERTIES (D2 ``CreateRP``,
        client.go:110-133). Schema = time_ns long + ts timestamp +
        tags (string) + typed fields (SURVEY §1.2/§1.4)."""
        tbl = self._table_name(db, rp.name, measurement.name)
        cols = ["`time_ns` BIGINT", "`ts` TIMESTAMP"]
        cols += [f"`{t}` STRING" for t in measurement.tags]
        for fs in measurement.fields.values():
            cols.append(f"`{fs.name}` {fs.spark_type.simpleString().upper()}")
        props = _rp_props(rp)
        props["sf.tags"] = ",".join(measurement.tags)
        props_sql = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
        loc = f" LOCATION '{location}'" if location else ""
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {tbl} ({', '.join(cols)}) "
            f"USING PARQUET{loc} TBLPROPERTIES ({props_sql})"
        )

    def set_default_rp(self, db: str, rp_name: str) -> None:
        """D3 ``SetDefaultRP`` (client.go:135-156): flip the
        ``sf.rp.default`` property on every table of the DB."""
        for tbl in self.spark.catalog.listTables(db):
            full = f"`{db}`.`{tbl.name}`"
            props = self._table_props(f"{db}.{tbl.name}")
            name = props.get(f"{RP_PROP_PREFIX}name")
            if name is None:
                continue
            val = "true" if name == rp_name else "false"
            self.spark.sql(
                f"ALTER TABLE {full} SET TBLPROPERTIES ('{RP_PROP_PREFIX}default'='{val}')"
            )

    # -- F1 -----------------------------------------------------------------
    def get_schema(
        self,
        db_filter: str = ".*",
        rp_filter: str = ".*",
        meas_filter: str = ".*",
        new_db: str = "",
        new_rp: str = "",
    ) -> list[InfluxSchDb]:
        """F1 ``GetSchema`` (hacluster.go:75-162): walk
        DBs → RPs → measurements → fields applying regex filters, with
        F2 rename overlays (-newdb/-newrp, agent.go:157-229).
        Driver-side metadata walk — cost is proportional to the number
        of tables, not data size."""
        db_re = re.compile(db_filter)
        rp_re = re.compile(rp_filter)
        meas_re = re.compile(meas_filter)
        out: list[InfluxSchDb] = []
        for db in self.get_databases():
            if not db_re.match(db):
                continue
            sch = InfluxSchDb(name=db, new_name=new_db, new_def_rp=new_rp)
            for rp in self.get_retention_policies(db):
                if not rp_re.match(rp.name):
                    continue
                for meas in self.get_measurements(db, rp.name):
                    if not meas_re.match(meas):
                        continue
                    rp.measurements[meas] = MeasurementSch(
                        name=meas,
                        fields=self.get_fields(db, meas, rp.name),
                        tags=self.get_tags(db, meas, rp.name),
                    )
                if rp.measurements:
                    sch.rps[rp.name] = rp
            if sch.rps:
                out.append(sch)
        return out

    # -- D4 -----------------------------------------------------------------
    def replicate_schema(
        self, schema: list[InfluxSchDb], location_root: str | None = None
    ) -> None:
        """D4 ``ReplicateSchema`` (hacluster.go:165-211): create target
        DBs + measurement tables with (possibly renamed) RPs."""
        for db in schema:
            target_db = db.target_name
            self.create_db(target_db)
            for rp in db.rps.values():
                target_rp = RetPol(
                    name=(db.new_def_rp if (rp.default and db.new_def_rp) else rp.name),
                    duration=rp.duration,
                    shard_duration=rp.shard_duration,
                    n_replicas=rp.n_replicas,
                    default=rp.default,
                )
                for meas in rp.measurements.values():
                    loc = (
                        f"{location_root}/{target_db}/{target_rp.name}__{meas.name}"
                        if location_root
                        else None
                    )
                    self.create_measurement(target_db, target_rp, meas, location=loc)

    # -- retention enforcement ---------------------------------------------
    def enforce_retention(self, db: str, now_ns: int) -> dict[str, int]:
        """Drop expired data per RP duration — the Spark-side meaning of
        a retention policy (SURVEY §1.4; reference: RP duration drives
        both the copy window and Influx-side expiry,
        /root/reference/pkg/agent/client.go:24-38). Returns rows
        DROPPED per table (0 = nothing expired).

        Parquet tables have no in-place DELETE, so expiry is a
        rewrite: survivors land in a staging table, then overwrite the
        original (which keeps its RP TBLPROPERTIES), then the staging
        table is dropped. Tables where nothing expired are detected
        with one pushed-down count and skipped — the rewrite is only
        paid when data actually ages out. On a production table
        partitioned by time bucket this becomes a metadata-only
        ``ALTER TABLE .. DROP PARTITION`` instead of a rewrite; the
        staging swap is the layout-agnostic fallback."""
        from syncflux_spark.functions.time import parse_duration

        results: dict[str, int] = {}
        for tbl in self.spark.catalog.listTables(db):
            full = f"`{db}`.`{tbl.name}`"
            props = self._table_props(f"{db}.{tbl.name}")
            dur = props.get(f"{RP_PROP_PREFIX}duration", "0s")
            d = parse_duration(dur)
            if d.total_seconds() <= 0:
                continue  # infinite retention
            cutoff = now_ns - int(d.total_seconds() * 1e9)
            expired = self.spark.table(full).where(f"time_ns < {cutoff}").count()
            results[full.replace("`", "")] = expired
            if expired == 0:
                continue
            from syncflux_spark.locking import table_lock

            staging = f"`{db}`.`{tbl.name}__rp_expire_tmp`"
            # serialize against other overwrite-based writers on the
            # same table location (single-writer contract, locking.py)
            with table_lock(self._table_location(db, tbl.name)):
                self.spark.sql(f"DROP TABLE IF EXISTS {staging}")
                self.spark.sql(
                    f"CREATE TABLE {staging} USING PARQUET AS "
                    f"SELECT * FROM {full} WHERE time_ns >= {cutoff}"
                )
                self.spark.sql(
                    f"INSERT OVERWRITE TABLE {full} SELECT * FROM {staging}"
                )
                self.spark.sql(f"DROP TABLE {staging}")
        return results

    def _table_location(self, db: str, table: str) -> str:
        """Filesystem location of a catalog table (the lock scope for
        overwrite-based rewrites)."""
        rows = self.spark.sql(
            f"DESCRIBE FORMATTED `{db}`.`{table}`"
        ).collect()
        for r in rows:
            if (r.col_name or "").strip() == "Location":
                loc = r.data_type.strip()
                return loc.removeprefix("file:")
        return f"{db}.{table}"  # fallback: name-scoped lock in CWD

    # -- subject erasure ---------------------------------------------------
    def erase_keys(
        self, db: str, key_col: str, values: list
    ) -> dict[str, int]:
        """Right-to-be-forgotten pass: delete every row whose
        ``key_col`` is in ``values`` from every table in ``db`` that
        has that column; returns rows DROPPED per table. Same
        staging-rewrite mechanics as :meth:`enforce_retention`
        (parquet has no in-place DELETE), with the same skip-if-clean
        fast path so untouched tables cost one pushed-down count.
        At 100 TB the erasure set is a broadcast anti-join against
        each table and the rewrite touches only partitions the
        pushed-down IN-filter says contain the subject — erasure
        requests batch naturally (collect a day's requests, one
        rewrite)."""
        in_list = ", ".join(repr(v) for v in values)
        results: dict[str, int] = {}
        for tbl in self.spark.catalog.listTables(db):
            full = f"`{db}`.`{tbl.name}`"
            cols = [f.name for f in self.spark.table(full).schema.fields]
            if key_col not in cols:
                continue
            hit = (
                self.spark.table(full)
                .where(f"`{key_col}` IN ({in_list})")
                .count()
            )
            results[full.replace("`", "")] = hit
            if hit == 0:
                continue
            staging = f"`{db}`.`{tbl.name}__erase_tmp`"
            self.spark.sql(f"DROP TABLE IF EXISTS {staging}")
            self.spark.sql(
                f"CREATE TABLE {staging} USING PARQUET AS "
                f"SELECT * FROM {full} WHERE `{key_col}` NOT IN ({in_list})"
            )
            self.spark.sql(
                f"INSERT OVERWRITE TABLE {full} SELECT * FROM {staging}"
            )
            self.spark.sql(f"DROP TABLE {staging}")
        return results

    # -- helpers ------------------------------------------------------------
    @staticmethod
    def _table_name(db: str, rp: str, measurement: str) -> str:
        return f"`{db}`.`{rp}__{measurement}`"

    def _table_props(self, table: str) -> dict[str, str]:
        rows = self.spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        return {r["key"]: r["value"] for r in rows}

    def measurement_df(self, db: str, measurement: str, rp: str = "autogen") -> DataFrame:
        return self.spark.table(self._table_name(db, rp, measurement))
