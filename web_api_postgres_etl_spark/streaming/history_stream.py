"""Streaming face of SCD2 history maintenance: fold each micro-batch
of change observations into the persisted dimension history.

A thin ``foreachBatch`` wrapper over
``operators.history.maintain_history`` — the fold itself is already
the right per-batch primitive: it rebuilds only the keys the batch
touches and swaps the updated history in with the compactor's
materialize → tmp-write → rename discipline (crash windows repaired by
``recover_swap`` at entry).

Replay safety (foreachBatch is at-least-once) comes from the MERGE
SEMANTICS rather than partition layout: re-folding an already-applied
batch replays the affected keys against stored rows that already
contain those observations — same-(key, ts) ties resolve to the
incoming observation, which equals the stored state, and the collapse
drops it as a no-op re-emit — so the re-fold is a fixed point. (The
aggregate maintainer ``agg_stream`` cannot use this trick — sums are
not idempotent — which is why it needs per-batch partitions; history
folds are, so they don't.)

Ordering: batches may arrive in any order w.r.t. event time —
``scd2_merge`` re-derives each affected key's whole interval chain, so
late batches land correctly (subject to the stored-history collapse
caveat documented on ``scd2_merge``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.history import maintain_history


def history_maintain_run(
    spark: SparkSession,
    source_dir: str,
    history_path: str,
    checkpoint_dir: str,
    schema,
    keys: list[str],
    ts_col: str,
    attr_cols: list[str],
    seq_col: str | None = None,
) -> None:
    """Drain the change-log file stream at ``source_dir``
    (AvailableNow trigger) into the SCD2 history at ``history_path``.
    Safe to call repeatedly; the checkpoint resumes where the last
    drain stopped, and a replayed batch is a no-op fold."""

    def _process(batch_df, batch_id: int) -> None:
        maintain_history(
            spark, batch_df, history_path, keys, ts_col, attr_cols,
            seq_col=seq_col,
        )

    q = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
