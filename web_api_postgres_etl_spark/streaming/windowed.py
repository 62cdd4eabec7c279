"""T5 — event-time windowed aggregation with a watermark (late-data
drop), the Structured Streaming operator the reference's cron-poll
never needed but any event stream does.

Semantics exercised (and pinned by the contract oracle):

- tumbling ``F.window`` aggregation in APPEND output mode: a window row
  is emitted exactly once, when the watermark passes its end;
- the watermark advances BETWEEN micro-batches (wm_i = max event time
  seen through batch i, minus the delay), so batch i filters its input
  and finalizes windows using wm_{i-1};
- input rows older than the current watermark are DROPPED (true
  late-data semantics — not compaction-style repair).

At 100 TB this is the shape for sessionized / hourly rollups over an
event firehose: state is bounded by (windows in flight × keys), the
shuffle is the normal hash partition on the window key, and eviction is
driven by the watermark instead of an unbounded state table.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def windowed_counts_run(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema,
    time_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> None:
    """One micro-batch invocation (Trigger.AvailableNow): process files
    pending under ``source_dir``, append finalized windows to
    ``sink_dir``. Call repeatedly as new files land — each run is one
    deterministic batch, the watermark persists in the checkpoint."""
    agg = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def session_counts_run(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema,
    key_col: str = "user_id",
    time_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> None:
    """Streaming sessionization: ``F.session_window`` (dynamic-gap
    merging windows) per key under a watermark, APPEND mode — the
    streaming face of the batch session aggregation (retired contract
    row ``agg_session_window``; batch≡stream convergence pinned in
    tests/test_streaming.py). A session row is emitted exactly once,
    when the watermark passes its end (last event + gap); in-flight
    sessions MERGE as new events extend them, so state per key is one
    open session, not an event buffer.

    At 100 TB this is user-journey rollup over an event firehose:
    state is bounded by open sessions x keys, eviction is
    watermark-driven, and the shuffle is the normal hash partition on
    the session key. Same Trigger.AvailableNow contract as
    ``windowed_counts_run`` — call once per ingest cycle; the
    watermark and open-session state persist in the checkpoint."""
    agg = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark(time_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(time_col), gap).alias("sw"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
