"""TxTable: a minimal transactional parquet table (commit-log +
optimistic concurrency) — the multi-writer upgrade path for the
overwrite-based writers.

The advisory locks (locking.py) ENFORCE the single-writer contract;
this module REMOVES it for the tables that need true concurrency
(the chunked copy/replication sinks, a streaming CDC merger, and a
compactor on one table). The design is the standard lakehouse shape,
cut to the bone:

* ``{root}/data/<uuid>.parquet/`` — immutable data-file groups; a
  writer only ever ADDS new groups, never mutates existing ones.
* ``{root}/_txlog/{version:08d}.json`` — the commit log. Two commit
  kinds:

  - **snapshot** commits record the COMPLETE file-group list (plus
    per-group stats/tags). Version 0, every ``overwrite``, and every
    ``checkpoint_interval``-th version are snapshots.
  - **delta** commits record only ``add``/``remove`` group lists
    (plus stats/tags for the adds) against the previous version.

  A reader resolves state by walking back from the target version to
  the nearest snapshot and replaying deltas forward — O(interval)
  log files regardless of table age, so a 5-minute-chunk replicator
  making ~100k commits/year never re-reads its history (the wall the
  pre-checkpoint full-listing format hit at thousands of commits;
  test: tests/test_tx_routing.py::TestLogCheckpointing, 5k commits).
  The log also records the TABLE SCHEMA (snapshot commits always;
  delta commits only when a batch evolves it), so the write-time
  compatibility check and snapshot/scan planning read zero parquet
  footers, and ``version()`` rides a best-effort ``.last`` hint +
  forward probe instead of a directory listing.
* **Snapshot isolation**: a reader resolves the highest committed
  version once and reads exactly that file list — concurrent commits
  never produce a torn read.
* **Optimistic concurrency**: a writer prepares data files and the
  full commit document in a temp file, then atomically claims version
  ``V+1`` via ``os.link`` onto the log name (fails-if-exists like
  ``O_EXCL``, but the linked file already carries its complete
  content, so a concurrent reader can never observe a half-written
  commit; on object stores, a conditional PUT). Losing the race
  raises :class:`CommitConflict`; ``append``/``replace_tagged``
  auto-rebase (their edits commute with or are recomputed against any
  winner), while ``overwrite``/``merge_changes`` re-run their
  computation against the new snapshot and retry — real OCC, bounded
  by ``max_retries`` where the retry re-reads data.
* **Tags**: a commit may label each added group with small key/value
  strings (``{"win": "<start>_<end>"}``). :meth:`replace_tagged`
  atomically swaps every group carrying one tag value for a new
  group — the engine's ``replaceWhere``: chunk replay in
  operators/copy.py re-runs a window by replacing exactly that
  window's groups, under OCC instead of an advisory lock.
* Crash safety: a writer dying before its commit leaves unreferenced
  data groups — invisible to every reader; :meth:`vacuum` removes
  groups unreferenced by the CURRENT commit once they are old enough
  to not belong to an in-flight writer (the same age discipline as
  operators/compact.py::clean_stale_staging). :meth:`vacuum_log`
  drops log files older than the newest snapshot at-or-before a
  horizon, bounding the log the same way vacuum bounds data.

Reference note: the reference has no table format at all (it
delegates storage to InfluxDB); this is the Spark-native answer to
the same durability need its replication loop gets from InfluxDB's
storage engine (pkg/agent/sync.go:95-213 writes through InfluxDB's
upsert; here the sink itself provides the transactionality).
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
_HINT = ".last"


class CommitConflict(RuntimeError):
    """Another writer committed first and the operation exhausted its
    rebase retries."""


class TxTable:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        checkpoint_interval: int = 100,
    ):
        if checkpoint_interval < 1:
            raise ValueError("checkpoint_interval must be >= 1")
        self.spark = spark
        self.root = root
        #: every Nth version is written as a full snapshot commit.
        #: Writers with different intervals interoperate — resolution
        #: walks to the NEAREST snapshot, whoever wrote it.
        self.checkpoint_interval = checkpoint_interval

    # -- log plumbing -------------------------------------------------------
    def _log_path(self, version: int) -> str:
        return os.path.join(self.root, _LOG_DIR, f"{version:08d}.json")

    def version(self) -> int:
        """Highest committed version, or -1 for an empty/absent log.

        Fast path: the ``.last`` hint file (updated best-effort after
        every commit) plus a forward probe — O(1 + staleness)
        existence checks instead of listing the directory, which at
        ~100k commits/year is the difference between one GET and a
        paged LIST on an object store. The hint is advisory only: it
        may lag behind concurrent writers (the probe walks forward)
        and a corrupt/missing hint falls back to the full listing —
        correctness never depends on it."""
        log = os.path.join(self.root, _LOG_DIR)
        try:
            with open(os.path.join(log, _HINT)) as f:
                hint = int(f.read().strip())
        except (FileNotFoundError, ValueError, OSError):
            hint = -1
        if hint >= 0 and os.path.exists(self._log_path(hint)):
            v = hint
            while os.path.exists(self._log_path(v + 1)):
                v += 1
            return v
        try:
            names = [
                n for n in os.listdir(log)
                if n.endswith(".json") and not n.startswith(".")
            ]
        except FileNotFoundError:
            return -1
        return max((int(n[:-5]) for n in names), default=-1)

    def _update_hint(self, version: int) -> None:
        """Best-effort ``.last`` advance (atomic replace; losers of a
        hint race leave a LOWER value, which the probe corrects)."""
        log = os.path.join(self.root, _LOG_DIR)
        tmp = os.path.join(log, f".hint-{uuid.uuid4().hex}")
        try:
            with open(tmp, "w") as f:
                f.write(str(version))
            os.replace(tmp, os.path.join(log, _HINT))
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def _read_doc(self, version: int) -> dict:
        """One commit document. Test seam for the O(log-files) bound
        (TestLogCheckpointing counts calls)."""
        with open(self._log_path(version)) as f:
            return json.load(f)

    def _state_at(self, version: int) -> tuple[list[str], dict, dict]:
        """(files, stats, tags) at ``version``: walk back to the
        nearest snapshot commit, replay deltas forward. Bounded by
        the checkpoint interval, never by table age."""
        chain: list[dict] = []
        v = version
        while True:
            if v < 0:
                raise ValueError(
                    f"corrupt log at {self.root}: no snapshot commit "
                    f"at or below version {version}"
                )
            doc = self._read_doc(v)
            chain.append(doc)
            if "files" in doc:  # snapshot commit (also the pre-delta format)
                break
            v -= 1
        base = chain[-1]
        files = list(base["files"])
        stats = dict(base.get("stats", {}))
        tags = dict(base.get("tags", {}))
        for doc in reversed(chain[:-1]):
            removed = set(doc.get("remove", ()))
            if removed:
                files = [r for r in files if r not in removed]
                for r in removed:
                    stats.pop(r, None)
                    tags.pop(r, None)
            files += list(doc.get("add", ()))
            stats.update(doc.get("stats", {}))
            tags.update(doc.get("tags", {}))
        return files, stats, tags

    def _files_at(self, version: int) -> list[str]:
        return self._state_at(version)[0]

    def _stats_at(self, version: int) -> dict:
        """Per-file stats map of a commit ({} for pre-stats logs —
        every file then survives pruning, which is the safe
        direction)."""
        return self._state_at(version)[1]

    def _tags_at(self, version: int) -> dict:
        return self._state_at(version)[2]

    def _schema_at(self, version: int):
        """The table schema recorded in the commit log: walk back to
        the nearest document carrying ``schema`` (every snapshot
        commit does, so the walk is bounded like _state_at's). None
        for pre-schema logs — readers then fall back to parquet
        footer merging, and the next commit records it. This is what
        keeps the write path O(1) metadata: without it, every
        append's compatibility check and every snapshot() read pays
        one footer read PER GROUP — O(groups) at 100k windows."""
        from pyspark.sql import types as T

        v = version
        while v >= 0:
            try:
                doc = self._read_doc(v)
            except FileNotFoundError:
                return None  # below the vacuum_log cut
            if "schema" in doc:
                return T.StructType.fromJson(doc["schema"])
            v -= 1
        return None

    @staticmethod
    def _nullable(schema):
        from pyspark.sql import types as T

        return T.StructType(
            [T.StructField(f.name, f.dataType, True) for f in schema.fields]
        )

    def _doc_schema(
        self, parent: int, batch_schema, snapshot_doc: bool
    ) -> dict | None:
        """The ``schema`` value to record on a commit (jsonValue), or
        None to omit. Delta commits record it only when the batch
        EVOLVES the schema (new columns — existing fields first, all
        nullable so older groups read the new columns as null);
        snapshot commits always carry the current schema so the
        _schema_at walk-back is bounded by the checkpoint interval.
        Pre-schema legacy logs with data recover the schema once from
        parquet footers."""
        from pyspark.sql import types as T

        cur = self._schema_at(parent) if parent >= 0 else None
        if (
            cur is None
            and parent >= 0
            and batch_schema is not None
            and self._files_at(parent)
        ):
            try:
                cur = self.snapshot(parent).schema
            except ValueError:
                cur = None
        if batch_schema is None:
            return (
                cur.jsonValue() if (snapshot_doc and cur is not None) else None
            )
        if cur is None:
            return self._nullable(batch_schema).jsonValue()
        names = {f.name for f in cur.fields}
        new = [f for f in batch_schema.fields if f.name not in names]
        if new:
            return self._nullable(
                T.StructType(list(cur.fields) + list(new))
            ).jsonValue()
        return cur.jsonValue() if snapshot_doc else None

    def _write_group(self, df: DataFrame, write_options: dict | None = None) -> str:
        rel = os.path.join(_DATA_DIR, f"{uuid.uuid4().hex}.parquet")
        w = df.write.mode("overwrite")
        for k, v in (write_options or {}).items():
            w = w.option(k, v)
        w.parquet(os.path.join(self.root, rel))
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

    def _try_commit_doc(self, version: int, doc: dict) -> bool:
        """Atomically claim ``version`` with a COMPLETE document:
        the content is written to a temp file first and linked onto
        the log name — claim and content are one atomic step, so a
        torn read of a winning commit is impossible. False if a
        concurrent writer claimed the version first."""
        log_dir = os.path.join(self.root, _LOG_DIR)
        os.makedirs(log_dir, exist_ok=True)
        doc = dict(doc)
        doc["committed_at"] = time.time()
        tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(doc, f)
        try:
            os.link(tmp, self._log_path(version))
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        self._update_hint(version)
        return True

    def _commit_next(
        self,
        add: list[str],
        remove: list[str],
        stats_add: dict | None = None,
        tags_add: dict | None = None,
        batch_schema=None,
    ) -> int:
        """Claim the next version with an add/remove edit, rebasing
        onto any winner (the edit lists are recomputed by CALLERS that
        depend on current state — this helper only re-resolves the
        snapshot policy). Every ``checkpoint_interval``-th version is
        materialized as a full snapshot; other versions are O(1)
        delta documents."""
        while True:
            v = self.version()
            out = self._commit_next_once(
                v, add, remove, stats_add, tags_add, batch_schema
            )
            if out is not None:
                return out

    # -- public API ---------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        df: DataFrame,
        stats_cols: list[str] | None = None,
        checkpoint_interval: int = 100,
    ) -> "TxTable":
        t = cls(spark, root, checkpoint_interval=checkpoint_interval)
        if t.version() >= 0:
            raise ValueError(f"table already exists at {root}")
        rel = t._write_group(df)
        st = t._group_stats(df, stats_cols)
        doc: dict = {
            "files": [rel],
            "schema": t._nullable(df.schema).jsonValue(),
        }
        if st:
            doc["stats"] = {rel: st}
        if not t._try_commit_doc(0, doc):
            raise CommitConflict(f"concurrent create at {root}")
        return t

    @classmethod
    def ensure(
        cls,
        spark: SparkSession,
        root: str,
        checkpoint_interval: int = 100,
    ) -> "TxTable":
        """Open the table at ``root``, initializing an EMPTY table
        (version 0, zero data groups) if none exists — the idempotent
        form sinks use: many concurrent first-writers race to create
        version 0 and every loser simply adopts the winner's table."""
        t = cls(spark, root, checkpoint_interval=checkpoint_interval)
        if t.version() < 0:
            t._try_commit_doc(0, {"files": []})  # loser adopts winner
        return t

    def snapshot(self, version: int | None = None) -> DataFrame:
        """The table at a committed version (default: latest) — an
        immutable, torn-read-free view. Reads with the schema RECORDED
        in the commit log (columns a group predates surface as null),
        so scan planning touches zero parquet footers — at 100k groups
        a ``mergeSchema`` read would pay one footer fetch per group
        before the first row. Pre-schema legacy logs fall back to
        footer merging."""
        v = self.version() if version is None else version
        if v < 0:
            raise ValueError(f"no commits at {self.root}")
        files = self._files_at(v)
        if not files:
            raise ValueError(
                f"table at {self.root} (version {v}) has no data groups "
                "yet — write one before reading"
            )
        paths = [os.path.join(self.root, rel) for rel in files]
        sch = self._schema_at(v)
        if sch is not None:
            return self.spark.read.schema(sch).parquet(*paths)
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def snapshot_as_of(self, ts: float) -> DataFrame:
        """Time travel by WALL CLOCK: the table as of unix time ``ts``
        — the newest version whose ``committed_at`` ≤ ts (binary
        search over the version range; O(log n) commit reads).
        Raises if the table didn't exist yet or that history was
        vacuumed (:meth:`vacuum_log`)."""
        hi = self.version()
        if hi < 0:
            raise ValueError(f"no commits at {self.root}")
        lo = 0
        # versions below the vacuum_log cut are gone; find the floor
        while lo <= hi:
            try:
                self._read_doc(lo)
                break
            except FileNotFoundError:
                lo += 1
        if self._read_doc(lo).get("committed_at", 0) > ts:
            raise ValueError(
                f"no commit at or before ts={ts} at {self.root} "
                "(table younger, or history vacuumed)"
            )
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if self._read_doc(mid).get("committed_at", 0) <= ts:
                lo = mid
            else:
                hi = mid - 1
        return self.snapshot(lo)

    def history(self, limit: int = 20) -> list[dict]:
        """Newest-first commit metadata (version, committed_at, kind,
        adds/removes) — the DESCRIBE HISTORY view. Reads ``limit``
        documents, never the data."""
        v = self.version()
        out = []
        while v >= 0 and len(out) < limit:
            try:
                doc = self._read_doc(v)
            except FileNotFoundError:
                break  # below the vacuum_log cut
            if "files" in doc:
                out.append(
                    {
                        "version": v,
                        "committed_at": doc.get("committed_at"),
                        "kind": "snapshot",
                        "n_files": len(doc["files"]),
                    }
                )
            else:
                out.append(
                    {
                        "version": v,
                        "committed_at": doc.get("committed_at"),
                        "kind": "delta",
                        "added": list(doc.get("add", ())),
                        "removed": list(doc.get("remove", ())),
                    }
                )
            v -= 1
        return out

    def _check_schema_compatible(
        self, df: DataFrame, allow_new_columns: bool
    ) -> None:
        """Appends may widen the schema (new columns → earlier groups
        read as null) but never CHANGE an existing column's type —
        parquet's mergeSchema would fail at read time, which is the
        worst place to discover it. Checked at write time instead,
        against the LOG-recorded schema (O(1) — no footer reads)."""
        v = self.version()
        cur = self._schema_at(v)
        if cur is None:
            if not self._files_at(v):
                return  # empty table: the incoming batch defines the schema
            cur = self.snapshot(v).schema  # pre-schema legacy log
        current = {f.name: f.dataType for f in cur.fields}
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
        onto the winner's commit (the new group's stats ride along).
        With ``allow_new_columns`` the batch may carry columns the
        table lacks — snapshot reads merge schemas and older groups
        surface them as null; a TYPE change for an existing column
        always raises at write time (see _check_schema_compatible).
        Returns the committed version. The commit itself is an O(1)
        delta document (a snapshot only at checkpoint versions)."""
        self._check_schema_compatible(df, allow_new_columns)
        rel = self._write_group(df)
        st = self._group_stats(df, stats_cols)
        return self._commit_next(
            [rel], [], {rel: st} if st else None, None, df.schema
        )

    def replace_tagged(
        self,
        tag_key: str,
        tag_value: str,
        df: DataFrame,
        stats_cols: list[str] | None = None,
        extra_tags: dict | None = None,
        allow_new_columns: bool = False,
        write_options: dict | None = None,
    ) -> int:
        """Atomically replace every group tagged ``tag_key=tag_value``
        with one new group carrying that tag — the transactional
        ``replaceWhere``. Re-running the same logical unit (a chunk
        window, a stream batch id) is idempotent: the previous run's
        groups leave in the same commit the new one lands, and readers
        see either the old window or the new, never both or neither.
        A lost commit race recomputes the removal set against the
        winner's state and retries — concurrent DISTINCT tag values
        commute; concurrent writers of the SAME value serialize to
        last-writer-wins. Returns the committed version."""
        self._check_schema_compatible(df, allow_new_columns)
        rel = self._write_group(df, write_options)
        st = self._group_stats(df, stats_cols)
        tags = {tag_key: str(tag_value), **(extra_tags or {})}
        while True:
            v = self.version()
            _files, _stats, cur_tags = (
                self._state_at(v) if v >= 0 else ([], {}, {})
            )
            remove = [
                r for r in _files
                if cur_tags.get(r, {}).get(tag_key) == str(tag_value)
            ]
            next_v = self._commit_next_once(
                v, [rel], remove, {rel: st} if st else None, {rel: tags},
                df.schema,
            )
            if next_v is not None:
                return next_v

    def swap_groups(
        self,
        expected: list[str],
        df: DataFrame,
        tags: dict | None = None,
        stats_cols: list[str] | None = None,
        write_options: dict | None = None,
    ) -> int | None:
        """Compare-and-swap group replacement: atomically replace
        EXACTLY the ``expected`` groups with one new group holding
        ``df`` — but only while every expected group is still live.
        If any has been removed by a concurrent commit (e.g. a window
        writer replaced the data this rewrite was derived FROM), the
        swap ABORTS, deletes its staged group, and returns None —
        unlike :meth:`replace_tagged`, it can never clobber data
        newer than what it read. A winner that merely ADDED unrelated
        groups is rebased over. This is what a compactor needs: its
        output is a pure rewrite of its input, so the input vanishing
        means the output is stale by definition."""
        rel = self._write_group(df, write_options)
        st = self._group_stats(df, stats_cols)
        tags_add = {rel: tags} if tags else None
        try:
            while True:
                v = self.version()
                live = set(self._files_at(v)) if v >= 0 else set()
                if not set(expected) <= live:
                    shutil.rmtree(
                        os.path.join(self.root, rel), ignore_errors=True
                    )
                    return None
                next_v = self._commit_next_once(
                    v, [rel], list(expected),
                    {rel: st} if st else None, tags_add, df.schema,
                )
                if next_v is not None:
                    return next_v
        except BaseException:
            shutil.rmtree(os.path.join(self.root, rel), ignore_errors=True)
            raise

    def _commit_next_once(
        self,
        parent: int,
        add: list[str],
        remove: list[str],
        stats_add: dict | None,
        tags_add: dict | None,
        batch_schema=None,
    ) -> int | None:
        """One attempt to claim ``parent + 1`` (None if lost) — for
        writers whose edit lists depend on the parent state and must
        be recomputed on a lost race (replace_tagged), unlike
        _commit_next's self-rebasing loop. The schema to record is
        resolved against THIS parent, so a rebase can never shadow a
        concurrent winner's schema evolution."""
        next_v = parent + 1
        snapshot_doc = next_v % self.checkpoint_interval == 0 or parent < 0
        if snapshot_doc:
            files, stats, tags = (
                self._state_at(parent) if parent >= 0 else ([], {}, {})
            )
            removed = set(remove)
            files = [r for r in files if r not in removed] + list(add)
            for r in removed:
                stats.pop(r, None)
                tags.pop(r, None)
            stats.update(stats_add or {})
            tags.update(tags_add or {})
            doc: dict = {"files": files}
            if stats:
                doc["stats"] = stats
            if tags:
                doc["tags"] = tags
        else:
            doc = {"add": list(add), "remove": list(remove)}
            if stats_add:
                doc["stats"] = stats_add
            if tags_add:
                doc["tags"] = tags_add
        sch = self._doc_schema(parent, batch_schema, snapshot_doc)
        if sch is not None:
            doc["schema"] = sch
        return next_v if self._try_commit_doc(next_v, doc) else None

    def overwrite(
        self, compute, max_retries: int = 3,
        stats_cols: list[str] | None = None,
    ) -> int:
        """Replace the table with ``compute(snapshot_df) -> DataFrame``
        under OCC: the result is staged, then commit V+1 is claimed;
        losing the race re-runs ``compute`` against the winner's
        snapshot. Always a snapshot commit (its state is complete by
        construction, so it doubles as a log checkpoint). Returns the
        committed version."""
        for _ in range(max_retries):
            v = self.version()
            out = compute(self.snapshot(v))
            rel = self._write_group(out)
            st = self._group_stats(out, stats_cols)
            doc: dict = {
                "files": [rel],
                "schema": self._nullable(out.schema).jsonValue(),
            }
            if st:
                doc["stats"] = {rel: st}
            if self._try_commit_doc(v + 1, doc):
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
                next_v = self._commit_next_once(
                    v, [rel], [], {rel: st} if st else None, None, df.schema
                )
                if next_v is not None:
                    return next_v
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
        files, stats, _tags = self._state_at(v)
        keep, skipped = [], 0
        for rel in files:
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
        # log-recorded schema, like snapshot(): surviving groups may
        # straddle a schema evolution, and footer merging is O(groups)
        sch = self._schema_at(v)
        reader = (
            self.spark.read.schema(sch)
            if sch is not None
            else self.spark.read.option("mergeSchema", "true")
        )
        return reader.parquet(*paths).where(pred), skipped

    def expire_below(self, col: str, cutoff) -> dict:
        """Retention enforcement as a LOG operation: drop rows with
        ``col < cutoff``.

        * Groups whose commit-log ``hi_{col}`` is below the cutoff are
          removed in ONE delta commit — zero data IO, the
          ``ALTER TABLE DROP PARTITION`` shape (the data files linger
          for time travel until :meth:`vacuum`). At 100 TB this is
          the whole point: a year of expired 5-minute windows retires
          as one tiny JSON document, not a rewrite.
        * Groups straddling the cutoff (and stats-less groups — the
          safe direction) are rewritten filtered via
          :meth:`swap_groups`, keeping their tags, so a concurrent
          window replacement always wins over a stale rewrite.
        * Groups entirely at/above the cutoff are untouched.

        Compare catalog.py::enforce_retention, the staging-rewrite
        form for plain catalog tables — there every expiry rewrites
        the survivors; here only the boundary group pays data IO.

        Returns ``{"dropped_groups": n, "rewritten_groups": n,
        "kept_groups": n}``."""
        from pyspark.sql import functions as F

        v = self.version()
        if v < 0:
            return {"dropped_groups": 0, "rewritten_groups": 0, "kept_groups": 0}
        files, stats, tags = self._state_at(v)
        drop, rewrite, keep = [], [], []
        for rel in files:
            s = stats.get(rel, {}).get(col)
            if s is not None and s[0] is not None and s[1] is not None:
                if s[1] < cutoff:
                    drop.append(rel)
                    continue
                if s[0] >= cutoff:
                    keep.append(rel)
                    continue
            rewrite.append(rel)
        if drop:
            # pure log edit; rebases over any winner (removals of
            # expired groups commute with everything except their own
            # replacement, which swap/replace writers would re-add
            # with fresh stats anyway)
            while True:
                cur = self.version()
                live = set(self._files_at(cur))
                still = [r for r in drop if r in live]
                if not still:
                    break
                if self._commit_next_once(cur, [], still, None, None) is not None:
                    break
        rewritten = 0
        for rel in rewrite:
            df = self.spark.read.parquet(os.path.join(self.root, rel)).where(
                F.col(col) >= cutoff
            )
            if (
                self.swap_groups(
                    [rel], df, tags=tags.get(rel), stats_cols=[col]
                )
                is not None
            ):
                rewritten += 1
        return {
            "dropped_groups": len(drop),
            "rewritten_groups": rewritten,
            "kept_groups": len(keep),
        }

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

    def vacuum_log(self, keep_versions: int = 0) -> list[str]:
        """Drop commit documents older than the newest SNAPSHOT commit
        at or below ``version() - keep_versions`` — every retained
        version stays resolvable (the walk-back from any kept version
        hits a kept snapshot). Time travel below the cut is lost, the
        same trade as :meth:`vacuum`. Returns removed log file names.

        A long-lived sink calls this on the compaction schedule: with
        the default interval, a year of 5-minute commits retains ~100
        log files instead of ~100k."""
        v = self.version()
        if v < 0:
            return []
        horizon = v - max(0, keep_versions)
        cut = None
        probe = min(horizon, v)
        while probe >= 0:
            if "files" in self._read_doc(probe):
                cut = probe
                break
            probe -= 1
        if cut is None or cut == 0:
            return []
        removed = []
        for version in range(cut):
            path = self._log_path(version)
            try:
                os.unlink(path)
                removed.append(os.path.basename(path))
            except FileNotFoundError:
                pass
        return removed
