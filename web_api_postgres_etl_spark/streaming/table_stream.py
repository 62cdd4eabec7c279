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

Idempotency: the apply is CONDITIONAL on the (``seq_col``, row-digest)
pair — a change ordered below the stored row's pair is dropped, never
applied — so the table's end state is a pure function of the change
log's per-id ``(seq, digest)`` maxima: replaying a batch is a
value-level fixed point, and even a checkpoint reset that re-drains
history in a DIFFERENT batch order cannot regress a row
(at-least-once foreachBatch needs no partition bookkeeping here,
unlike ``agg_stream`` — sums are not idempotent; merges are). The
digest participates at APPLY time, not just inside the batch fold,
precisely so that two DISTINCT rows carrying an equal ``(id, seq)``
resolve identically whether they arrive in one batch or split across
two — the digest is recomputed from the stored row's own columns (a
canonical sorted-column recipe), so nothing extra is persisted. The
one seam it inherits: ``upsert_rows``'s duplicate-on-crash window,
repaired by the next successful run of the same batch (the stored
probe takes the per-id MAX pair, so the duplicate never corrupts the
apply decision).

DELETE semantics are deliberately out of scope (a CDC delete is a
tombstone row; route ids with a deleted flag to
``operators.layout.purge_rows`` in the same foreachBatch if the feed
carries them — composing the two keeps each primitive simple).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import release_frame
from ..operators.dedup import dedup_last_wins
from ..operators.layout import (
    _file_local,
    land_bootstrap,
    table_has_parquet,
    upsert_rows,
)


# the canonical sorted-column digest now lives in operators.layout
# (shared with table_fingerprint); the gate semantics are unchanged
from ..operators.layout import row_digest as _row_digest  # noqa: E402


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
    and survives), gate on the stored per-id (seq, digest) maximum,
    then surgical-upsert. Returns ``upsert_rows``'s stats dict plus
    ``n_change_rows`` (POST-fold — one row per id) and
    ``bootstrapped``. Bootstraps the table when ``table_path`` holds
    no parquet files yet (the first batch IS the table)."""
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
    # the canonical sorted-column recipe (see _row_digest) — the SAME
    # expression is recomputed over the stored table's columns at gate
    # time, which is what makes equal-(id, seq) DISTINCT rows resolve
    # identically whether they arrive in one batch or split across two
    digest_cols = list(changes.columns)
    folded = dedup_last_wins(
        changes.withColumn(tb, _row_digest(digest_cols)),
        [id_col], version_col=seq_col, tiebreaker=tb,
    )
    # scope check up front (also validates the path before bootstrap)
    _file_local(table_path)
    if not table_has_parquet(table_path):
        added = land_bootstrap(folded.drop(tb), table_path)
        # one count serves both stats: the bootstrap writes exactly one
        # row per folded id, so rows_inserted ≡ n_change_rows — a
        # second n_changes_stat() job would re-run the whole unpersisted
        # digest+window fold just to recount the same number
        n = spark.read.parquet(table_path).count()
        return {
            "rows_replaced": 0,
            "rows_inserted": n,
            "files_rewritten": 0,
            "removed_files": [],
            "added_files": added,
            "n_change_rows": n,
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
        # pure function of the change log's per-id (seq, digest)
        # maxima: a change ordered below the stored row's pair is
        # dropped, never applied (else a checkpoint reset re-draining
        # history in a different order could REGRESS a row). The
        # stored probe is semi-joined to the batch's ids FIRST so its
        # shuffle is bounded by data TOUCHED, not table size; per-id
        # MAX because a crashed prior upsert can leave an id
        # physically duplicated. The digest rides the probe so an
        # equal-seq DISTINCT row resolves identically across any
        # batching (module docstring); exact ties (same seq AND same
        # digest = same content) apply — a value-level no-op rewrite.
        stored = (
            spark.read.parquet(table_path)
            .join(folded.select(id_col), on=id_col, how="left_semi")
            .groupBy(F.col(id_col).alias("__cdc_id"))
            .agg(F.max(F.struct(
                F.col(seq_col).alias("s"),
                _row_digest(digest_cols).alias("d"),
            )).alias("__cdc_sd"))
        )
        # localCheckpoint, NOT persist: gated's lineage reads the very
        # parquet files upsert_rows is about to remove — a recomputed
        # partition (executor loss, cache eviction) would re-read the
        # table mid-mutation and gate against post-apply state or die
        # on FileNotFound; severing the lineage makes the handoff safe
        gated = (
            folded.join(
                stored, folded[id_col] == stored["__cdc_id"], "left"
            )
            .filter(
                F.col("__cdc_sd").isNull()
                | (
                    F.struct(
                        F.col(seq_col).alias("s"), F.col(tb).alias("d")
                    )
                    >= F.col("__cdc_sd")
                )
            )
            .drop("__cdc_id", "__cdc_sd", tb)
            .localCheckpoint(eager=True)
        )
        try:
            stats = upsert_rows(spark, table_path, gated, id_col)
        finally:
            release_frame(gated)
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
    per-id (seq, digest) maxima."""

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
