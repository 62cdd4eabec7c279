"""Stream-stream interval join (streaming/join_stream.py): the
streamed result equals the batch interval join, pairs split across
micro-batches still join via checkpointed state, and the column-
overlap guard fires early."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_api_postgres_etl_spark.streaming.join_stream import (
    stream_interval_join_run,
)


def _feeds(spark):
    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp").alias("ts"), "event_type",
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("view_id")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("r_ts"), F.col("event_id").alias("click_id")
    )
    return views, clicks


def _batch_join(views, clicks):
    return views.join(
        clicks,
        (views["user_id"] == clicks["user_id"])
        & (clicks["r_ts"] >= views["l_ts"])
        & (clicks["r_ts"] < views["l_ts"] + F.expr("INTERVAL 1 hour")),
        "inner",
    ).select("view_id", "click_id")


def _key(df):
    return sorted((r["view_id"], r["click_id"]) for r in df.collect())


def test_streamed_equals_batch_and_survives_batch_splits(spark, tmp_path):
    views, clicks = _feeds(spark)
    want = _key(_batch_join(views, clicks))
    assert len(want) > 20  # the events table has real attribution pairs

    root = str(tmp_path)
    ldir, rdir = f"{root}/views", f"{root}/clicks"
    sink, ckpt = f"{root}/sink", f"{root}/ckpt"
    # batch 1: the first half of the month, both sides; batch 2: the
    # rest — cross-boundary pairs must join via the buffered state
    mid = views.agg(
        F.expr("date_trunc('day', min(l_ts) + (max(l_ts) - min(l_ts)) / 2)")
    ).first()[0]
    views.filter(F.col("l_ts") < mid).write.parquet(ldir)
    clicks.filter(F.col("r_ts") < mid).write.parquet(rdir)
    lschema = views.schema
    rschema = clicks.schema

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream_interval_join_run(
            spark, ldir, rdir, sink, ckpt, lschema, rschema,
            key_col="user_id", left_time="l_ts", right_time="r_ts",
            within="1 hour",
        )
        got1 = _key(spark.read.parquet(sink).select("view_id", "click_id"))
        assert 0 < len(got1) < len(want)  # only first-half pairs so far
        assert set(got1) <= set(want)

        views.filter(F.col("l_ts") >= mid).write.mode("append").parquet(ldir)
        clicks.filter(F.col("r_ts") >= mid).write.mode("append").parquet(rdir)
        stream_interval_join_run(
            spark, ldir, rdir, sink, ckpt, lschema, rschema,
            key_col="user_id", left_time="l_ts", right_time="r_ts",
            within="1 hour",
        )
        got = _key(spark.read.parquet(sink).select("view_id", "click_id"))
        assert got == want  # exactly-once append, batch-equal
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_column_overlap_and_key_guards(spark, tmp_path):
    views, clicks = _feeds(spark)
    bad = clicks.withColumnRenamed("click_id", "view_id")
    with pytest.raises(ValueError, match="both sides"):
        stream_interval_join_run(
            spark, "x", "y", "s", "c", views.schema, bad.schema,
            key_col="user_id", left_time="l_ts", right_time="r_ts",
        )
    with pytest.raises(ValueError, match="key column"):
        stream_interval_join_run(
            spark, "x", "y", "s", "c", views.schema, clicks.schema,
            key_col="nope", left_time="l_ts", right_time="r_ts",
        )
