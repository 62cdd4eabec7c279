"""Bucketed point-in-interval range join: ground truth, DuckDB oracle
parity on the events table, bucket-width invariance, and the loud
failure on unbounded intervals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from web_api_postgres_etl_spark.operators.joins import interval_join


def test_interval_join_ground_truth(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 25.0), (4, 100.0)],
        "pid long, ts double",
    )
    intervals = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 9.0, 30.0), (30, 200.0, 300.0)],
        "iid long, s double, e double",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, "ts", "s", "e", bucket_seconds=7
        ).collect()
    )
    # boundaries inclusive on both ends
    assert got == [(1, 10), (2, 10), (2, 20), (3, 20)]


def test_interval_join_bucket_width_invariance(spark):
    """The result set cannot depend on the bucketing choice."""
    points = spark.range(200).select(
        F.col("id").alias("pid"), (F.col("id") * 3.7).alias("ts")
    )
    intervals = spark.range(40).select(
        F.col("id").alias("iid"),
        (F.col("id") * 17.0).alias("s"),
        (F.col("id") * 17.0 + 25.0).alias("e"),
    )
    expected = None
    for w in (1, 13, 1000):
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(
                points, intervals, "ts", "s", "e", bucket_seconds=w
            ).collect()
        )
        if expected is None:
            expected = got
        assert got == expected, f"bucket width {w} changed the result"
    assert len(expected) > 0


def test_interval_join_oracle_parity(spark, oracle):
    """Events within ±30 min of every 50th event's timestamp — exact
    match with DuckDB's naive BETWEEN join."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    # events.ts arrives as TIMESTAMP_NTZ; go through unix seconds so
    # both engines compare the same doubles
    points = ev.select(
        F.col("event_id").alias("pid"),
        F.unix_timestamp("ts").cast("double").alias("pts"),
    )
    intervals = ev.filter(F.col("event_id") % 50 == 0).select(
        F.col("event_id").alias("iid"),
        (F.unix_timestamp("ts").cast("double") - 1800).alias("s"),
        (F.unix_timestamp("ts").cast("double") + 1800).alias("e"),
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, "pts", "s", "e", bucket_seconds=900
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in oracle.execute(
            """
            WITH p AS (SELECT event_id AS pid,
                              floor(epoch(ts)) AS pts FROM events),
            iv AS (SELECT event_id AS iid, floor(epoch(ts)) - 1800 AS s,
                          floor(epoch(ts)) + 1800 AS e
                   FROM events WHERE event_id % 50 = 0)
            SELECT pid, iid FROM p JOIN iv ON pts BETWEEN s AND e
            """
        ).fetchall()
    )
    assert got == want
    assert len(got) > 0


def test_interval_join_degenerate_intervals_drop(spark):
    """NULL-bound and inverted intervals match nothing (consistent with
    a NULL point timestamp); a badly inverted interval must not expand
    into a descending bucket sequence (the pre-fix blowup: a negative
    span passed the `(e_b - s_b) < max` guard and F.sequence generated
    a huge DESCENDING array)."""
    points = spark.createDataFrame(
        [(1, 5.0), (2, None)], "pid long, ts double"
    )
    intervals = spark.createDataFrame(
        [
            (10, None, 10.0),     # NULL start
            (20, 0.0, None),      # NULL end
            (30, 30.0, 10.0),     # inverted
            (40, 1.0e15, 0.0),    # badly inverted — would OOM pre-fix
            (50, 0.0, 10.0),      # the one real interval
        ],
        "iid long, s double, e double",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, "ts", "s", "e",
            bucket_seconds=1, max_buckets_per_interval=1000,
        ).collect()
    )
    assert got == [(1, 50)]


def test_interval_join_rejects_column_overlap(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, ts double")
    with pytest.raises(ValueError, match="disjoint"):
        interval_join(df, df, "ts", "ts", "ts")


def test_interval_join_unbounded_interval_fails_loudly(spark):
    points = spark.createDataFrame([(1, 5.0)], "pid long, ts double")
    intervals = spark.createDataFrame(
        [(10, 0.0, 1e12)], "iid long, s double, e double"
    )
    with pytest.raises(Exception, match="interval_join|RAISE_ERROR|buckets"):
        interval_join(
            points, intervals, "ts", "s", "e",
            bucket_seconds=1, max_buckets_per_interval=1000,
        ).collect()
