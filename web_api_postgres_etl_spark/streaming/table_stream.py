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
rightly refuses ambiguous duplicate ids), ordered by ``seq_col`` with
ties broken by a whole-row digest (the partition key itself would be
a no-op tiebreak, leaving equal-seq duplicates to physical order),
then applied.

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
from ..operators.layout import _file_local, upsert_rows


def n_changes_stat(folded: DataFrame) -> int:
    """POST-FOLD row count for the stats dict (one distinct id per
    row) — the pre-fold count would cost a dedicated extra job per
    micro-batch just to fill a field the streaming caller discards."""
    return folded.count()


def apply_changes(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    id_col: str,
    seq_col: str,
) -> dict:
    """One batch of CDC rows → the table: fold last-wins per id (by
    ``seq_col`` DESC, tie → whole-row digest — a batch may carry
    several versions of one row; ``seq_col`` is a real table column
    and survives), gate on the stored per-id seq, then
    surgical-upsert. Returns ``upsert_rows``'s stats dict plus
    ``n_change_rows`` (POST-fold — one row per id) and
    ``bootstrapped``. Bootstraps the table when ``table_path`` holds
    no parquet files yet (the first batch IS the table)."""
    import os

    from ..operators.layout import _move_parquet_in

    # NULL ids raise on BOTH paths (upsert_rows re-checks its own path
    # harmlessly): a NULL id enshrined by the bootstrap could never be
    # matched by the conditional join again — permanent junk enforced
    # inconsistently by arrival order
    checked_id = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit("apply_changes: NULL id in change batch")),
    ).otherwise(F.col(id_col))
    changes = changes.withColumn(id_col, checked_id)
    # within-batch fold ties on a digest of the WHOLE row, not the
    # partition key (which is constant inside its own partition — a
    # no-op tiebreak would leave equal-seq duplicates to physical
    # order, and an UNPERSISTED nondeterministic fold could even hand
    # upsert_rows a different row per action)
    tb = "__cdc_tb"
    if tb in changes.columns:
        raise ValueError(
            f"apply_changes: input column {tb!r} collides with the "
            "fold's internal tiebreaker — rename it first"
        )
    # NULLs encode explicitly: concat_ws SKIPS them, so ('a', NULL)
    # and (NULL, 'a') would otherwise share a digest and re-tie
    row_digest = F.md5(F.concat_ws(
        "\u0001",
        *[
            F.coalesce(F.col(f"`{c}`").cast("string"), F.lit("\u0000"))
            for c in changes.columns
        ],
    ))
    folded = (
        dedup_last_wins(
            changes.withColumn(tb, row_digest),
            [id_col], version_col=seq_col, tiebreaker=tb,
        )
        .drop(tb)
    )
    local = _file_local(table_path)
    has_files = any(
        name.endswith(".parquet")
        for _dir, _dn, files in os.walk(local)
        for name in files
    ) if os.path.isdir(local) else False
    if not has_files:
        # bootstrap — via tmp + move-in, so a crash mid-write cannot
        # leave a readable-looking directory with no parquet files
        # that wedges every replay at the conditional path
        os.makedirs(local, exist_ok=True)
        added = _move_parquet_in(
            folded, table_path.rstrip("/") + ".bootstrap_tmp", local, []
        )
        return {
            "rows_replaced": 0,
            "rows_inserted": spark.read.parquet(table_path).count(),
            "files_rewritten": 0,
            "removed_files": [],
            "added_files": added,
            "n_change_rows": n_changes_stat(folded),
            "bootstrapped": True,
        }
    # persist: upsert_rows evaluates its updates frame across ~5
    # separate actions (dup-check, matched scan, count, two writes) —
    # without the pin the window fold + stored-seq join recompute each
    # time (the documented per-branch recompute trap)
    folded = folded.persist()
    try:
        n_batch = folded.count()
        # CONDITIONAL apply — the CDC rule that makes the end state a
        # pure function of the change log's per-id maxima: a change
        # older than the stored row is dropped, never applied (else
        # a checkpoint reset re-draining history in a different order
        # could REGRESS a row). The stored-seq probe is semi-joined to
        # the batch's ids FIRST so its shuffle is bounded by data
        # TOUCHED, not table size; per-id MAX because a crashed prior
        # upsert can leave an id physically duplicated. Ties apply
        # (an equal-seq rewrite is a value-level no-op).
        stored = (
            spark.read.parquet(table_path)
            .join(folded.select(id_col), on=id_col, how="left_semi")
            .groupBy(F.col(id_col).alias("__cdc_id"))
            .agg(F.max(F.col(seq_col)).alias("__cdc_seq"))
        )
        gated = (
            folded.join(
                stored, folded[id_col] == stored["__cdc_id"], "left"
            )
            .filter(
                F.col("__cdc_seq").isNull()
                | (F.col(seq_col) >= F.col("__cdc_seq"))
            )
            .drop("__cdc_id", "__cdc_seq")
            .persist()
        )
        try:
            stats = upsert_rows(spark, table_path, gated, id_col)
        finally:
            gated.unpersist()
        stats["n_change_rows"] = n_batch
        stats["bootstrapped"] = False
        return stats
    finally:
        folded.unpersist()


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
