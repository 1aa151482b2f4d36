"""Streaming session CLOSER: gap sessions finalized by event-time
watermark, with per-key event-time timeouts.

The windowed module's ``SessionRollupStream`` re-emits a session's
running summary every time it grows (update semantics — the sink keeps
the newest row per session). This operator is the other contract a
pipeline wants: emit each session EXACTLY ONCE, only when it is
provably finished — i.e. when the event-time watermark passes
``session_end + gap``, so no event that could still arrive (watermark
guarantee: nothing older than the watermark) can extend or merge it.
Closed sessions are immutable facts; the output is append-only and
feeds billing/attribution jobs that must never see a session twice.

Semantics are EXACTLY batch gaps-and-islands (``ts_sessionize``):
events within ``gap`` of each other chain into one session, a strictly
larger gap starts a new one. Because sessions close in time order per
key (an island can only close after every earlier island closed), the
running per-user session counter in state reproduces the batch
``SUM(new_session) OVER (ORDER BY ts)`` numbering — so the streamed
output is value-hash comparable to the batch SQL, which is the oracle
gate (`stream_session_close`).

Timers: the per-key EVENT-TIME timeout (``GroupStateTimeout.
EventTimeTimeout``) re-invokes the function for a key when the
watermark passes the registered timestamp even if no new data for that
key arrives — without it, a key whose user went quiet would hold its
last session in state forever (the closing logic would only run on the
key's next event, which may never come).

Scale: the EVENT buffer per key holds OPEN islands only — bounded by
the watermark horizon (an island older than ``gap`` behind the
watermark closes and leaves the buffer), not by history. One honest
residue: the per-user session COUNTER must survive after all of a
user's sessions close (batch-identical numbering needs the count of
every session that ever closed), so a fully-drained key keeps one
(empty array, long) row in the store — O(1) per user ever seen, the
explicit price of numbering parity; a deployment that only needs
session FACTS can key sessions by (user, start_us) instead and drop
drained keys. The one shuffle is the keyed state exchange every
stateful stream pays; shard count and RocksDB backend ride the same
dials as the rest of this package (`utils.streaming_state`, measured
in SCALE.md).
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
SESSION_STATE = T.StructType(
    [
        T.StructField("buf_us", T.ArrayType(T.LongType())),
        T.StructField("next_sid", T.LongType()),
    ]
)


def _session_fn_factory(gap_us: int):
    def _fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        buf, sid = (
            (list(state.get[0]), int(state.get[1]))
            if state.exists
            else ([], 1)
        )
        for pdf in pdfs:
            buf.extend(int(x) for x in pdf["us"])
        buf.sort()
        # The watermark guarantees no future row is OLDER than it; a
        # row AT the watermark may still arrive, so an island [s, e]
        # is finished only when e + gap < watermark (strict).
        w_us = state.getCurrentWatermarkMs() * 1000
        out: list[tuple] = []
        i, n = 0, len(buf)
        while i < n:
            j = i
            while j + 1 < n and buf[j + 1] - buf[j] <= gap_us:
                j += 1
            if buf[j] + gap_us < w_us:
                out.append((key[0], sid, buf[i], buf[j], j - i + 1))
                sid += 1
                i = j + 1
            else:
                break  # islands close strictly in time order
        rest = buf[i:]
        state.update((rest, sid))
        if rest:
            # wake this key when its earliest open island COULD close,
            # even if the user never sends another event
            j = 0
            while j + 1 < len(rest) and rest[j + 1] - rest[j] <= gap_us:
                j += 1
            close_ms = (rest[j] + gap_us) // 1000 + 1
            state.setTimeoutTimestamp(
                max(close_ms, state.getCurrentWatermarkMs() + 1)
            )
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "session_id",
                    "start_us",
                    "end_us",
                    "n_events",
                ],
            )

    return _fn


class StreamingSessionCloser:
    """Exactly-once gap-session emission over a keyed event stream:
    append-only closed sessions, watermark-proven final, equal to the
    batch gaps-and-islands numbering. Same availableNow /
    batch-keyed-sink plumbing as the other stateful operators; the
    sink union-reads (closed sessions are append-only facts, no
    newest-wins resolution needed)."""

    def __init__(
        self,
        spark: SparkSession,
        src_path: str,
        dst_path: str,
        checkpoint_path: str,
        key_col: str = "user_id",
        time_col: str = "ts",
        gap_us: int = 1_800_000_000,
        watermark_delay: str = "0 seconds",
        path_glob_filter: str | None = None,
        max_files_per_trigger: int | None = None,
        state_partitions: int | None = None,
        state_backend: str | None = None,
    ):
        self.spark = spark
        self.src_path = src_path
        self.dst_path = dst_path
        self.checkpoint_path = checkpoint_path
        self.key_col = key_col
        self.time_col = time_col
        self.gap_us = gap_us
        self.watermark_delay = watermark_delay
        self.path_glob_filter = path_glob_filter
        self.max_files_per_trigger = max_files_per_trigger
        self.state_partitions = state_partitions
        self.state_backend = state_backend

    def _reader(self):
        batch_reader = self.spark.read
        if self.path_glob_filter:
            batch_reader = batch_reader.option(
                "pathGlobFilter", self.path_glob_filter
            )
        schema = batch_reader.parquet(self.src_path).schema
        reader = self.spark.readStream.schema(schema)
        if self.path_glob_filter:
            reader = reader.option("pathGlobFilter", self.path_glob_filter)
        if self.max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", str(self.max_files_per_trigger)
            )
        return reader.parquet(self.src_path)

    def run_available(self) -> None:
        ev = (
            self._reader()
            .withWatermark(self.time_col, self.watermark_delay)
            .select(
                F.col(self.key_col).alias("user_id"),
                F.col(self.time_col),
                F.unix_micros(self.time_col).alias("us"),
            )
        )
        stream = ev.groupBy("user_id").applyInPandasWithState(
            _session_fn_factory(self.gap_us),
            SESSION_OUTPUT,
            SESSION_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(
                os.path.join(self.dst_path, f"batch={batch_id}")
            )

        from syncflux_spark.utils import streaming_state

        with streaming_state(
            self.spark, self.state_partitions, self.state_backend
        ):
            q = (
                stream.writeStream.foreachBatch(write_batch)
                .outputMode("append")
                .option("checkpointLocation", self.checkpoint_path)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    def closed_sessions(self) -> DataFrame:
        """All sessions closed so far (append-only union; per-batch
        overwrite directories make crash replays idempotent)."""
        return (
            self.spark.read.option("recursiveFileLookup", "true")
            .option("basePath", self.dst_path)
            .parquet(self.dst_path)
            .select(
                "user_id", "session_id", "start_us", "end_us", "n_events"
            )
        )
