"""CDC table maintenance: keep a queryable plain-parquet table current
from a change stream, applying each micro-batch as a SURGICAL keyed
upsert — the streaming face of ``operators.layout.upsert_rows``.

How this differs from the engine's other two maintenance shapes:

- ``streaming/incremental.py`` (T1/T3) appends then COMPACTS — the
  whole table (or each touched partition) is rewritten by the
  last-wins window. Right when batches touch most keys.
- This module rewrites ONLY the parquet files containing a replaced
  id. Right when batches are small relative to the table — the usual
  CDC regime, where a compaction pass would re-shuffle terabytes to
  apply kilobytes.

Each micro-batch is first folded LAST-WINS per id inside the batch
(a CDC feed can carry several versions of one row; ``upsert_rows``
rightly refuses ambiguous duplicate ids), ordered by ``seq_col``
(tie → the id itself, the engine's pinned-tie discipline), then
applied.

Idempotency: the apply is CONDITIONAL on ``seq_col`` — a change older
than the stored row's seq is dropped, never applied — so the table's
end state is a pure function of the change log's per-id maxima:
replaying a batch is a value-level fixed point, and even a checkpoint
reset that re-drains history in a DIFFERENT batch order cannot regress
a row (at-least-once foreachBatch needs no partition bookkeeping here,
unlike ``agg_stream`` — sums are not idempotent; merges are). The one
seam it inherits: ``upsert_rows``'s duplicate-on-crash window,
repaired by the next successful run of the same batch (the stored-seq
probe takes the per-id MAX, so the duplicate never corrupts the apply
decision).

DELETE semantics are deliberately out of scope (a CDC delete is a
tombstone row; route ids with a deleted flag to
``operators.layout.purge_rows`` in the same foreachBatch if the feed
carries them — composing the two keeps each primitive simple).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dedup_last_wins
from ..operators.layout import upsert_rows


def apply_changes(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    id_col: str,
    seq_col: str,
) -> dict:
    """One batch of CDC rows → the table: fold last-wins per id (by
    ``seq_col`` DESC, tie → id — a batch may carry several versions of
    one row; ``seq_col`` is a real table column and survives), gate on
    the stored per-id seq, then surgical-upsert. Returns
    ``upsert_rows``'s stats dict, plus ``n_change_rows`` (pre-fold).
    Bootstraps the table when ``table_path`` does not exist yet (the
    first batch IS the table)."""
    import os
    from urllib.parse import unquote, urlparse

    n_changes = changes.count()
    folded = dedup_last_wins(
        changes, [id_col], version_col=seq_col, tiebreaker=id_col
    )
    parsed = urlparse(table_path)
    local = (
        unquote(parsed.path) if parsed.scheme in ("file", "") else table_path
    )
    if not os.path.exists(local):
        folded.write.parquet(table_path)
        return {
            "rows_replaced": 0,
            "rows_inserted": folded.count(),
            "files_rewritten": 0,
            "removed_files": [],
            "added_files": [],
            "n_change_rows": n_changes,
            "bootstrapped": True,
        }
    # CONDITIONAL apply — the CDC rule that makes the end state a pure
    # function of the change log's per-id maxima: a change older than
    # the stored row is dropped, never applied. Without this, batches
    # re-drained in a different order after a checkpoint reset could
    # REGRESS a row to an older version and leave it there. One extra
    # column-pruned (id, seq) scan of the table; ties apply (an
    # equal-seq rewrite is a value-level no-op).
    # per-id MAX of the stored seq (one groupBy): a crashed prior
    # upsert can leave an id physically duplicated — a plain (id, seq)
    # projection would then fan the join out and hand upsert_rows
    # duplicate update ids
    stored = (
        spark.read.parquet(table_path)
        .groupBy(F.col(id_col).alias("__cdc_id"))
        .agg(F.max(F.col(seq_col)).alias("__cdc_seq"))
    )
    folded = (
        folded.join(
            stored, folded[id_col] == stored["__cdc_id"], "left"
        )
        .filter(
            F.col("__cdc_seq").isNull()
            | (F.col(seq_col) >= F.col("__cdc_seq"))
        )
        .drop("__cdc_id", "__cdc_seq")
    )
    stats = upsert_rows(spark, table_path, folded, id_col)
    stats["n_change_rows"] = n_changes
    stats["bootstrapped"] = False
    return stats


def table_maintain_run(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    checkpoint_dir: str,
    schema,
    id_col: str,
    seq_col: str,
) -> None:
    """Drain the change-file stream at ``source_dir`` (AvailableNow),
    applying each micro-batch to the table via :func:`apply_changes`.
    Call repeatedly as new change files land — each run is one
    deterministic batch; the checkpoint remembers which files were
    consumed. Replayed batches are value-level fixed points (see the
    module docstring), so a checkpoint reset re-applies history
    harmlessly — the END STATE is a pure function of the change log's
    per-id maxima."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        apply_changes(spark, table_path, batch_df, id_col, seq_col)

    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
