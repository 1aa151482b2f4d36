"""Watermarked stream-stream interval join (click attribution).

The reference replicates streams point-for-point; it never correlates
two of them. A Spark-first continuous engine gets the general
mechanism: two event streams joined on a key plus an event-time range
— here every `purchase` matched to the same user's `click`s in the
trailing hour, the classic attribution join.

Mechanics (Structured Streaming stream-stream inner join):

* Both sides carry a watermark and the join condition bounds event
  time on both sides (`c.ts BETWEEN p.ts - 1h AND p.ts`), so the
  state store can evict: a buffered click is droppable once the
  watermark says no future purchase can reach back to it, and vice
  versa. State is O(events inside the watermark horizon), not O(stream).
* Inner-join output emits as soon as both sides of a match have
  arrived — no watermark wait (that's only for outer-join nulls), so
  a single availableNow pass over a static source emits every pair.
* State is sharded by the equality key (user_id): the same hash
  partitioning that scales the batch join scales the state store.

The parquet sink's commit log makes replays idempotent, as everywhere
else in streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from syncflux_spark.functions.time import unixnano_to_ts


class ClickAttributionStream:
    """Join a purchases stream to the same user's clicks in the
    trailing ``attribution_window``; emit (user_id, purchase_us,
    click_us) pairs in exact epoch-µs longs."""

    def __init__(
        self,
        spark: SparkSession,
        src_path: str,
        dst_path: str,
        checkpoint_path: str,
        *,
        attribution_window: str = "1 hour",
        watermark_delay: str = "1 hour",
        time_col: str = "ts",
        time_is_ns: bool | None = None,
    ):
        self.spark = spark
        self.src_path = src_path
        self.dst_path = dst_path
        self.checkpoint_path = checkpoint_path
        self.attribution_window = attribution_window
        self.watermark_delay = watermark_delay
        self.time_col = time_col
        self.time_is_ns = time_is_ns

    def _side(self, event_type: str, alias: str) -> DataFrame:
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # TIMESTAMP, not TIMESTAMP_NTZ: watermarks require the tz-aware type
        self.spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        schema = self.spark.read.parquet(self.src_path).schema
        # ns parquet scans the time column as an epoch long
        # (nanosAsLong); µs parquet as TimestampType. None = detect.
        is_ns = self.time_is_ns
        if is_ns is None:
            is_ns = schema[self.time_col].dataType.simpleString() == "bigint"
        evt = (
            unixnano_to_ts(self.time_col) if is_ns else F.col(self.time_col)
        )
        return (
            self.spark.readStream.schema(schema)
            .option("latestFirst", "false")
            .parquet(self.src_path)
            .where(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{alias}_user_id"),
                evt.alias(f"{alias}_evt"),
            )
            .withWatermark(f"{alias}_evt", self.watermark_delay)
        )

    def _joined(self) -> DataFrame:
        p = self._side("purchase", "p")
        c = self._side("click", "c")
        cond = (
            (F.col("p_user_id") == F.col("c_user_id"))
            & (F.col("c_evt") >= F.expr(f"p_evt - INTERVAL {self.attribution_window}"))
            & (F.col("c_evt") <= F.col("p_evt"))
        )
        return p.join(c, cond).select(
            F.col("p_user_id").alias("user_id"),
            F.unix_micros("p_evt").alias("purchase_us"),
            F.unix_micros("c_evt").alias("click_us"),
        )

    def run_available(self) -> None:
        q = (
            self._joined()
            .writeStream.format("parquet")
            .option("path", self.dst_path)
            .option("checkpointLocation", self.checkpoint_path)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def read_pairs(self) -> DataFrame:
        return self.spark.read.parquet(self.dst_path)
