"""Stream-stream interval join — the attribution shape (impressions ⋈
clicks within an hour) Structured Streaming exists for and the
reference's cron-poll never needed.

Spark buffers BOTH sides in state; what makes that bounded is the pair
of watermarks plus a time-RANGE join condition — together they tell
the engine when a buffered row can never match again and is evicted
(state ≈ key cardinality × the interval, not the stream's history).
An inner stream-stream join in APPEND mode emits each matched pair
exactly once, as soon as both halves have arrived; a half whose
partner never arrives inside the interval is silently dropped (inner
semantics — use the batch ``interval_join`` for audits of what did
not match).

Semantics pinned by tests: with all data fed through
Trigger.AvailableNow runs, the streamed result equals the BATCH
interval join (same key equality + half-open time bound); pairs split
across micro-batches still join (the state carries the waiting half in
the checkpoint); the join works identically when the feeds replay.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def stream_interval_join_run(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    left_schema,
    right_schema,
    key_col: str,
    left_time: str,
    right_time: str,
    within: str = "1 hour",
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
) -> None:
    """One Trigger.AvailableNow invocation of the streaming interval
    join: every (left, right) pair with equal ``key_col`` and
    ``left_time <= right_time < left_time + within`` appended to
    ``sink_dir`` exactly once. Call repeatedly as files land; the
    checkpoint owns the watermarks and the buffered halves.

    Column names other than ``key_col`` must be disjoint between the
    two schemas (raise early — Spark would otherwise bind ambiguous
    references late and cryptically). ``within`` and the watermarks
    are INTERVAL strings (e.g. '1 hour')."""
    lcols = set(f.name for f in left_schema.fields)
    rcols = set(f.name for f in right_schema.fields)
    if key_col not in lcols or key_col not in rcols:
        raise ValueError(f"key column {key_col!r} must exist on both sides")
    overlap = (lcols & rcols) - {key_col}
    if overlap:
        raise ValueError(
            f"stream_interval_join_run: columns {sorted(overlap)} exist "
            "on both sides — rename them (only the key may be shared)"
        )

    left = (
        spark.readStream.schema(left_schema)
        .parquet(left_dir)
        .withWatermark(left_time, left_watermark)
        .withColumnRenamed(key_col, "__lk")
    )
    right = (
        spark.readStream.schema(right_schema)
        .parquet(right_dir)
        .withWatermark(right_time, right_watermark)
    )
    joined = left.join(
        right,
        (F.col("__lk") == F.col(key_col))
        & (F.col(right_time) >= F.col(left_time))
        & (F.col(right_time) < F.col(left_time) + F.expr(f"INTERVAL {within}")),
        "inner",
    ).drop("__lk")
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
