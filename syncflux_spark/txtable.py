"""TxTable: a minimal transactional parquet table (commit-log +
optimistic concurrency) — the multi-writer upgrade path for the
overwrite-based writers.

The advisory locks (locking.py) ENFORCE the single-writer contract;
this module REMOVES it for the tables that need true concurrency
(a streaming CDC merger and a nightly compactor on one table). The
design is the standard lakehouse shape, cut to the bone:

* ``{root}/data/<uuid>.parquet/`` — immutable data-file groups; a
  writer only ever ADDS new groups, never mutates existing ones.
* ``{root}/_txlog/{version:08d}.json`` — the commit log. Each commit
  records the COMPLETE file-group list of its snapshot (full listing,
  not add/remove deltas — right up to thousands of commits; a delta
  encoding + checkpointing drops in behind the same API when a table
  outlives that).
* **Snapshot isolation**: a reader resolves the highest committed
  version once and reads exactly that file list — concurrent commits
  never produce a torn read.
* **Optimistic concurrency**: a writer prepares data files, then
  atomically creates commit ``V+1`` via ``O_CREAT | O_EXCL`` (the
  same portable primitive locking.py uses; on object stores, a
  conditional PUT). Losing the race raises
  :class:`CommitConflict`; ``append`` auto-rebases (its file adds
  commute with any winner), while ``overwrite``/``merge_changes``
  re-run their computation against the new snapshot and retry —
  real OCC, bounded by ``max_retries``.
* Crash safety: a writer dying before its commit leaves unreferenced
  data groups — invisible to every reader; :meth:`vacuum` removes
  groups unreferenced by the CURRENT commit once they are old enough
  to not belong to an in-flight writer (the same age discipline as
  operators/compact.py::clean_stale_staging).

Reference note: the reference has no table format at all (it
delegates storage to InfluxDB); this is the Spark-native answer to
the same durability need its replication loop gets from InfluxDB's
storage engine.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_txlog"
_DATA_DIR = "data"


class CommitConflict(RuntimeError):
    """Another writer committed first and the operation exhausted its
    rebase retries."""


class TxTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # -- log plumbing -------------------------------------------------------
    def _log_path(self, version: int) -> str:
        return os.path.join(self.root, _LOG_DIR, f"{version:08d}.json")

    def version(self) -> int:
        """Highest committed version, or -1 for an empty/absent log."""
        log = os.path.join(self.root, _LOG_DIR)
        try:
            names = [n for n in os.listdir(log) if n.endswith(".json")]
        except FileNotFoundError:
            return -1
        return max((int(n[:-5]) for n in names), default=-1)

    def _files_at(self, version: int) -> list[str]:
        with open(self._log_path(version)) as f:
            return json.load(f)["files"]

    def _write_group(self, df: DataFrame) -> str:
        rel = os.path.join(_DATA_DIR, f"{uuid.uuid4().hex}.parquet")
        df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
        return rel

    def _group_stats(self, df: DataFrame, stats_cols) -> dict | None:
        """Per-group min/max for ``stats_cols`` (numeric/string — the
        engine's canonical time is a ``ts_ns`` long, so time ranges
        are covered). One tiny agg over the group being written —
        bounded by group size, paid once at write time, saved forever
        in the commit log."""
        if not stats_cols:
            return None
        from pyspark.sql import functions as F

        aggs = []
        for c in stats_cols:
            aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
        row = df.agg(*aggs).collect()[0]
        return {c: [row[f"lo_{c}"], row[f"hi_{c}"]] for c in stats_cols}

    def _stats_at(self, version: int) -> dict:
        """Per-file stats map of a commit ({} for pre-stats logs —
        every file then survives pruning, which is the safe
        direction)."""
        with open(self._log_path(version)) as f:
            return json.load(f).get("stats", {})

    def _try_commit(
        self, version: int, files: list[str], stats: dict | None = None
    ) -> bool:
        """Atomically claim ``version`` with ``files``; False if a
        concurrent writer claimed it first."""
        os.makedirs(os.path.join(self.root, _LOG_DIR), exist_ok=True)
        try:
            fd = os.open(
                self._log_path(version), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError:
            return False
        try:
            doc = {"files": files, "committed_at": time.time()}
            if stats:
                doc["stats"] = stats
            os.write(fd, json.dumps(doc).encode())
        finally:
            os.close(fd)
        return True

    # -- public API ---------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        df: DataFrame,
        stats_cols: list[str] | None = None,
    ) -> "TxTable":
        t = cls(spark, root)
        if t.version() >= 0:
            raise ValueError(f"table already exists at {root}")
        rel = t._write_group(df)
        st = t._group_stats(df, stats_cols)
        if not t._try_commit(0, [rel], {rel: st} if st else None):
            raise CommitConflict(f"concurrent create at {root}")
        return t

    def snapshot(self, version: int | None = None) -> DataFrame:
        """The table at a committed version (default: latest) — an
        immutable, torn-read-free view. Reads with ``mergeSchema`` so
        columns added by later appends (see :meth:`append`'s
        ``allow_new_columns``) surface across every group, null-filled
        where a group predates them."""
        v = self.version() if version is None else version
        if v < 0:
            raise ValueError(f"no commits at {self.root}")
        paths = [os.path.join(self.root, rel) for rel in self._files_at(v)]
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def _check_schema_compatible(
        self, df: DataFrame, allow_new_columns: bool
    ) -> None:
        """Appends may widen the schema (new columns → earlier groups
        read as null) but never CHANGE an existing column's type —
        parquet's mergeSchema would fail at read time, which is the
        worst place to discover it. Checked at write time instead."""
        current = {f.name: f.dataType for f in self.snapshot().schema.fields}
        for f in df.schema.fields:
            if f.name in current:
                if f.dataType != current[f.name]:
                    raise ValueError(
                        f"column {f.name!r}: type {f.dataType.simpleString()} "
                        f"conflicts with existing "
                        f"{current[f.name].simpleString()} — schema evolution "
                        "adds columns, never retypes them"
                    )
            elif not allow_new_columns:
                raise ValueError(
                    f"column {f.name!r} not in table schema; pass "
                    "allow_new_columns=True to evolve the schema"
                )

    def append(
        self,
        df: DataFrame,
        stats_cols: list[str] | None = None,
        allow_new_columns: bool = False,
    ) -> int:
        """Add rows; file adds commute, so a lost race auto-rebases
        onto the winner's commit (the new group's stats ride along
        and merge into the winner's stats map). With
        ``allow_new_columns`` the batch may carry columns the table
        lacks — snapshot reads merge schemas and older groups surface
        them as null; a TYPE change for an existing column always
        raises at write time (see _check_schema_compatible). Returns
        the committed version."""
        self._check_schema_compatible(df, allow_new_columns)
        rel = self._write_group(df)
        st = self._group_stats(df, stats_cols)
        while True:
            v = self.version()
            stats = dict(self._stats_at(v)) if v >= 0 else {}
            if st:
                stats[rel] = st
            if self._try_commit(
                v + 1, self._files_at(v) + [rel], stats or None
            ):
                return v + 1

    def overwrite(
        self, compute, max_retries: int = 3,
        stats_cols: list[str] | None = None,
    ) -> int:
        """Replace the table with ``compute(snapshot_df) -> DataFrame``
        under OCC: the result is staged, then commit V+1 is claimed;
        losing the race re-runs ``compute`` against the winner's
        snapshot. Returns the committed version."""
        for _ in range(max_retries):
            v = self.version()
            out = compute(self.snapshot(v))
            rel = self._write_group(out)
            st = self._group_stats(out, stats_cols)
            if self._try_commit(v + 1, [rel], {rel: st} if st else None):
                return v + 1
        raise CommitConflict(
            f"lost {max_retries} commit races at {self.root}; raise "
            f"max_retries or serialize the writers"
        )

    def merge_changes(
        self,
        changes: DataFrame,
        key_col: str,
        op_col: str = "op",
        max_retries: int = 3,
    ) -> int:
        """MERGE an I/U/D change batch (operators/cdc.py semantics)
        transactionally: recomputed against the latest snapshot on
        every retry, so two concurrent mergers serialize correctly
        instead of basing on the same parent and losing one batch."""
        from syncflux_spark.operators.cdc import apply_changes

        return self.overwrite(
            lambda base: apply_changes(
                base, changes, key_col=key_col, op_col=op_col
            ),
            max_retries=max_retries,
        )

    def publish_with_audit(
        self,
        df: DataFrame,
        audit,
        stats_cols: list[str] | None = None,
    ) -> int:
        """Write-audit-publish (the Iceberg WAP pattern): stage the
        new data group, run ``audit(candidate_df)`` against the
        CANDIDATE snapshot (current files + the staged group) while
        it is still invisible to readers, and only then commit.
        ``audit`` raises (or returns False) to veto — the staged
        group is deleted and the table is byte-identical to before;
        readers can never observe data that failed its checks. The
        audit sees the post-publish state, so cross-batch invariants
        (key uniqueness, row-count deltas, null budgets) are
        checkable, not just per-batch ones. Returns the committed
        version; raises ``ValueError`` on veto."""
        rel = self._write_group(df)
        st = self._group_stats(df, stats_cols)
        try:
            while True:
                v = self.version()
                paths = [
                    os.path.join(self.root, r)
                    for r in self._files_at(v) + [rel]
                ]
                candidate = self.spark.read.parquet(*paths)
                ok = audit(candidate)
                if ok is False:
                    raise ValueError("audit vetoed publish")
                stats = dict(self._stats_at(v)) if v >= 0 else {}
                if st:
                    stats[rel] = st
                if self._try_commit(
                    v + 1, self._files_at(v) + [rel], stats or None
                ):
                    return v + 1
                # lost the commit race: re-audit against the winner's
                # snapshot (the cross-batch invariants may now differ)
        except BaseException:
            shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)
            raise

    def scan_range(
        self,
        col: str,
        lo,
        hi,
        version: int | None = None,
    ):
        """Data-skipping range scan: prune whole data groups whose
        commit-log [min, max] for ``col`` cannot intersect
        [``lo``, ``hi``] — the lakehouse file-skipping trick, here on
        the engine's own commit log (zero extra reads: the stats were
        paid once at write time). Groups without stats for ``col``
        (pre-stats commits, writers that didn't declare it) are KEPT —
        pruning only ever skips provably-irrelevant files. The
        surviving files still get the row-level predicate, so the
        result equals ``snapshot().where(lo <= col <= hi)`` exactly.

        Returns ``(DataFrame, n_groups_skipped)``. At 100 TB this is
        the difference between touching one day's file groups and
        listing a year of them — the same win as partition pruning,
        without requiring the data to be physically partitioned on
        ``col``."""
        from pyspark.sql import functions as F

        v = self.version() if version is None else version
        if v < 0:
            raise ValueError(f"no commits at {self.root}")
        stats = self._stats_at(v)
        keep, skipped = [], 0
        for rel in self._files_at(v):
            s = stats.get(rel, {}).get(col)
            if (
                s is not None
                and s[0] is not None
                and s[1] is not None
                and (s[0] > hi or s[1] < lo)
            ):
                skipped += 1
                continue
            keep.append(rel)
        pred = (F.col(col) >= lo) & (F.col(col) <= hi)
        if not keep:
            return self.snapshot(v).where(F.lit(False)), skipped
        paths = [os.path.join(self.root, rel) for rel in keep]
        # mergeSchema, like snapshot(): surviving groups may straddle
        # a schema evolution
        return (
            self.spark.read.option("mergeSchema", "true")
            .parquet(*paths)
            .where(pred),
            skipped,
        )

    def vacuum(self, older_than_s: float = 3600.0) -> list[str]:
        """Remove data groups unreferenced by the CURRENT commit and
        older than ``older_than_s`` (an in-flight writer's uncommitted
        group is younger by construction). Time travel to vacuumed
        versions stops working — the usual retention trade."""
        v = self.version()
        live = set(self._files_at(v)) if v >= 0 else set()
        data = os.path.join(self.root, _DATA_DIR)
        removed: list[str] = []
        try:
            entries = os.listdir(data)
        except FileNotFoundError:
            return removed
        for name in entries:
            rel = os.path.join(_DATA_DIR, name)
            full = os.path.join(self.root, rel)
            if rel in live:
                continue
            try:
                age = time.time() - os.stat(full).st_mtime
            except FileNotFoundError:
                continue
            if age > older_than_s:
                shutil.rmtree(full, ignore_errors=True)
                removed.append(rel)
        return sorted(removed)
