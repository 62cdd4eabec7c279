"""Cache/checkpoint release helpers.

Spark has two distinct pinning layers and only one obvious release
API: ``Dataset.unpersist`` clears the SQL cache for a ``.persist()``-ed
frame, but a ``.localCheckpoint()``-ed frame is pinned at the RDD
layer (its plan is a ``LogicalRDD`` over the checkpointed RDD), which
``Dataset.unpersist`` does not reach — left alone it stays in
``getPersistentRDDs`` until the JVM object is garbage-collected.
``release_frame`` handles both, so loop bodies and long-lived sessions
can release staging frames deterministically instead of waiting on GC.

A released frame (and anything lazily derived from it) is UNUSABLE —
a localCheckpointed frame has no lineage left to recompute from.
Release only after every consumer has materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_frame(df: DataFrame) -> None:
    """Unpin ``df`` whether it was persisted or localCheckpointed.

    No-op for frames that are neither. Best-effort on the RDD layer
    (private plan access): if the internals shift in a future Spark,
    the ContextCleaner still reclaims checkpointed RDDs on GC."""
    df.unpersist()
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass
