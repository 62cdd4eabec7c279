"""Streaming vector ingest into a materialized IVF-PQ index: drain
micro-batches of (id, embedding) rows and fold each into the
cluster-partitioned code table via ``ivf_pq_index_append`` — routing
and encoding against the index's FROZEN sidecars, so a vector's codes
never depend on when it arrived. The ANN sibling of the corpus-ingest
stream (documents → signature table) and the CDC stream (changes →
row table): every maintained artifact in the engine now has a
streaming face whose per-batch cost scales with the batch.

Replay contract: before appending, the batch is anti-joined against
the index's id column (an id-only column-pruned scan — the cheapest
probe the plain-parquet index supports; a table format's bloom/stats
would prune it further, the documented seam). Already-present ids are
SKIPPED, so a replayed batch appends zero rows and a checkpoint reset
re-drains history harmlessly. This makes ids the identity: a vector
RE-EMBEDDED under the same id is deliberately ignored (append-only
index; rebuild on a cadence is the re-embedding path, matching the
sidecar-drift posture of ``ivf_pq_index_append``).

Crash seam (inherited from parquet append): a batch that crashes
mid-append may leave part of its rows visible; the next run of the
SAME batch skips the landed ids and appends the missing ones — ids
are never duplicated, rows are never lost, but between the crash and
the retry the index can hold a partial batch. Queries tolerate this
the way they tolerate any not-yet-ingested vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import ivf_pq_index_append


def ivf_pq_append_batch(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """One micro-batch → the index: drop NULL ids/vectors (they carry
    nothing routable), fold exact duplicate rows, skip ids already in
    the index (the replay rule), raise only when the NEW rows carry
    DISTINCT vectors under one id (which copy wins is ambiguous — the
    ``upsert_rows`` posture; already-indexed ids never trip this, so
    a checkpoint reset that re-drains history as one batch stays a
    no-op), append the rest. Returns
    ``{"appended", "skipped_existing", "n_batch"}``."""
    # .distinct() folds EXACT re-deliveries of one row (at-least-once
    # sources re-send; two identical rows are one fact, not a conflict)
    clean = batch.filter(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).distinct()
    clean = clean.persist()
    fresh = None
    try:
        n_batch = clean.count()
        if n_batch == 0:
            return {"appended": 0, "skipped_existing": 0, "n_batch": 0}
        existing = spark.read.parquet(path).select(id_col)
        fresh = clean.join(existing, on=id_col, how="left_anti").persist()
        # the ambiguity check runs on the FRESH rows only, AFTER the
        # anti-join: a checkpoint reset re-drains history as ONE
        # batch, so an id legitimately delivered across two original
        # batches shows up twice here — both copies are already in
        # the index, the anti-join drops them, and the replay stays a
        # no-op instead of a permanently poisoned stream. One agg
        # serves both counts.
        frow = fresh.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.col(id_col)).alias("d"),
        ).first()
        n_fresh, n_fresh_ids = int(frow["n"]), int(frow["d"])
        if n_fresh == 0:
            # zero-fresh (the common post-reset case): skip the
            # sidecar collects and the no-op partitioned write
            return {
                "appended": 0,
                "skipped_existing": n_batch,
                "n_batch": n_batch,
            }
        if n_fresh_ids != n_fresh:
            raise ValueError(
                f"ivf_pq_append_batch: {n_fresh - n_fresh_ids} "
                f"conflicting duplicate {id_col} value(s) among the "
                "NEW rows of one batch (distinct vectors under one "
                "id) — ambiguous; pre-fold the batch"
            )
        appended = ivf_pq_index_append(fresh, path, id_col, vec_col)
        return {
            "appended": appended,
            "skipped_existing": n_batch - appended,
            "n_batch": n_batch,
        }
    finally:
        if fresh is not None:
            fresh.unpersist()
        clean.unpersist()


def vectors_maintain_run(
    spark: SparkSession,
    source_dir: str,
    path: str,
    checkpoint_dir: str,
    schema,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Drain the vector-file stream at ``source_dir`` (AvailableNow)
    into the IVF-PQ index at ``path`` via :func:`ivf_pq_append_batch`.
    The index (and its sidecars) must already exist —
    ``write_ivf_pq_index`` is the bootstrap, because codebooks trained
    on an empty stream would be meaningless. Replays append nothing
    (see the module contract)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ivf_pq_append_batch(spark, path, batch_df, id_col, vec_col)

    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
