"""T6 — in-flight streaming deduplication (dropDuplicatesWithinWatermark).

The batch engine repairs re-deliveries AFTER landing (append +
last-wins compaction, operators.dedup.dedup_last_wins). The streaming
face suppresses them IN FLIGHT: duplicates of a key arriving within the
watermark horizon are dropped before they ever reach the sink, and the
dedup state is evicted once the watermark passes — bounded state, which
is what makes exactly-once event feeds viable at firehose scale (the
unbounded-state ``dropDuplicates`` variant would grow forever).

Batch-side equivalence: a sink produced by this stream, re-deduped by
key, equals ``SELECT DISTINCT ON (key)`` over the input — pinned in
tests/test_streaming.py with deterministic micro-batches.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def dedup_stream_run(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema,
    key_cols: list[str],
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> None:
    """One AvailableNow invocation: drop rows whose ``key_cols`` were
    already seen within the watermark horizon, append survivors to the
    sink. Duplicates arriving AFTER state eviction (older than the
    watermark) pass through — the downstream last-wins compactor is the
    backstop, same layering as the reference's append+repair."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
