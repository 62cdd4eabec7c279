"""Streaming curation ingest: the batch curation column operators
(quality gate, PII scrub, exact-dup key) composed onto a Structured
Streaming source — documents are cleaned, filtered, and in-flight
deduplicated BEFORE they land, so the batch corpus passes (MinHash,
line dedup, sampling) start from an already-hygienic sink.

Everything row-level reuses the batch definitions verbatim
(functions.text.quality_score / redact_pii / content_hash): curation
rules cannot drift between the batch and streaming faces because there
is only one definition of each. The streaming-only parts are the
watermark-bounded duplicate suppression (state evicted as event time
passes — firehose-safe) and the append sink.

Batch equivalence is pinned in tests: the streamed sink equals the
same filters + first-per-digest dedup applied to the input as one
batch DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import content_hash, quality_score, redact_pii


def curate_batch(
    df: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.5,
) -> DataFrame:
    """The shared row-level curation transform (stream and batch run
    THIS): score quality on the raw text, drop low-quality rows, scrub
    PII, and attach the exact-dup digest of the SCRUBBED text (dedup
    must key on what actually lands in the corpus)."""
    scored = df.withColumn("quality", quality_score(text_col))
    kept = scored.filter(F.col("quality") >= min_quality)
    scrubbed = kept.withColumn(text_col, redact_pii(text_col))
    return scrubbed.withColumn("content_digest", content_hash(text_col))


def curation_stream_run(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    schema,
    text_col: str = "text",
    time_col: str = "ts",
    min_quality: float = 0.5,
    watermark: str = "1 hour",
) -> None:
    """One AvailableNow invocation: curate + in-flight exact dedup on
    the content digest within the watermark horizon, append survivors.
    Late re-deliveries beyond the horizon pass through (bounded state);
    the batch exact-dedup pass is the backstop — same layering as the
    reference's append + compact repair (mabna_tables_update.py:262-287,
    here applied to corpus hygiene instead of trade versions)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    curated = curate_batch(stream, text_col, min_quality)
    deduped = curated.withWatermark(
        time_col, watermark
    ).dropDuplicatesWithinWatermark(["content_digest"])
    q = (
        deduped.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
