"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference has no event-time state (its "stream" is a polled
version-watermark — SURVEY.md §2.7); this is the engine's custom
stateful surface for pipelines that need running per-key aggregates
over a micro-batch stream (e.g. per-user event counters feeding
quality/abuse filters in a training-data pipeline).

State design for determinism: the state tuple holds only
order-independent exact quantities (count, min/max of an integer id) —
never float accumulations, whose per-batch order would make results
run-dependent. Each emission carries the full cumulative state, so the
LAST emission per key equals the batch-recomputed aggregate — which is
what makes the operator oracle-checkable (last-wins over the sink ==
one-shot GROUP BY over all input).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, max_version long, min_version long"
)
STATE_SCHEMA = "n long, mx long, mn long"


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (uid,) = key
    if state.exists:
        n, mx, mn = state.get
    else:
        n, mx, mn = 0, None, None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        bmx = int(pdf["event_id"].max())
        bmn = int(pdf["event_id"].min())
        mx = bmx if mx is None else max(mx, bmx)
        mn = bmn if mn is None else min(mn, bmn)
    state.update((n, mx, mn))
    yield pd.DataFrame(
        {
            "user_id": [uid],
            "n_events": [n],
            "max_version": [mx],
            "min_version": [mn],
        }
    )


def running_user_stats_stream(
    spark: SparkSession,
    source_dir: str,
    sink_path: str,
    checkpoint_dir: str,
    schema: Any,
    available_now: bool = True,
):
    """Per-user running stats over a file-source micro-batch stream.

    Arrow-batched state updates (one pandas group per key per batch);
    emissions append to a parquet sink. Because every emission is the
    cumulative state, ``dedup_last_wins(sink, keys=['user_id'],
    version_col='n_events')`` reconstructs the exact final state no
    matter how the input was batched.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    updated = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        updated.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
