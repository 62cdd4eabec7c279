"""Time-series resampling + gap detection: hand ground truth, the
forward-fill/alignment/duplicate rules, and a DuckDB mirror (native
ASOF JOIN) on the events table at sf0.01."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from web_api_postgres_etl_spark.operators.timeseries import (
    detect_gaps,
    resample_ffill,
)

T = lambda m, s=0: dt.datetime(2024, 1, 1, 10, m, s)


def _series(spark):
    return spark.createDataFrame(
        [
            (1, T(0, 30), 10.0, 1),
            (1, T(2, 0), 20.0, 2),    # exactly on a grid point
            (1, T(2, 0), 25.0, 3),    # same-ts duplicate, higher seq wins
            (1, T(7, 15), 30.0, 4),
            (2, T(3, 10), 99.0, 5),
        ],
        "k long, ts timestamp, v double, seq long",
    )


def test_resample_ffill_ground_truth(spark):
    out = {
        (r["k"], r["grid_ts"]): r["v"]
        for r in resample_ffill(
            _series(spark), "k", "ts", "v", step_seconds=60, tiebreaker="seq"
        ).collect()
    }
    # key 1: grid 10:00..10:07 (floored bounds), ffill with NULL head
    assert out[(1, T(0))] is None          # before first observation
    assert out[(1, T(1))] == 10.0
    assert out[(1, T(2))] == 25.0          # on-grid obs visible; seq tiebreak
    assert out[(1, T(6))] == 25.0          # carried through the gap
    assert out[(1, T(7))] == 25.0          # 10:07:15 obs is AFTER 10:07
    assert (1, T(8)) not in out            # grid ends at floor(max)
    # key 2: a single-point series still gets its one grid row
    assert out[(2, T(3))] is None and len([k for k in out if k[0] == 2]) == 1


def test_resample_grid_alignment_across_keys(spark):
    # keys starting at different offsets must land on the SAME grid
    df = spark.createDataFrame(
        [(1, T(0, 10), 1.0), (2, T(0, 50), 2.0)],
        "k long, ts timestamp, v double",
    )
    rows = resample_ffill(df, "k", "ts", "v", step_seconds=60).collect()
    assert {r["grid_ts"] for r in rows} == {T(0)}


def test_detect_gaps_ground_truth(spark):
    gaps = sorted(
        (r["k"], r["gap_start"], r["gap_end"], r["gap_seconds"])
        for r in detect_gaps(
            _series(spark), "k", "ts", min_gap_seconds=120
        ).collect()
    )
    # key 1 gaps >= 2 min: 10:02:00 -> 10:07:15 only (00:30->02:00 is 90s)
    assert gaps == [(1, T(2), T(7, 15), 315.0)]


def test_resample_matches_duckdb_asof_mirror(spark, oracle):
    from tests.conftest import SF_ORACLE

    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value", "event_id"
    )
    got = sorted(
        (r["user_id"], int(r["grid_ts"].timestamp() * 1_000_000), r["v"])
        for r in resample_ffill(
            events.withColumnRenamed("value", "v"),
            "user_id", "ts", "v",
            step_seconds=6 * 3600, tiebreaker="event_id",
        ).collect()
    )
    step_us = 6 * 3600 * 1_000_000
    want = sorted(
        map(
            tuple,
            oracle.sql(f"""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS t, max_by(value, event_id) AS v
  FROM events GROUP BY user_id, epoch_us(ts)),
b AS (
  SELECT user_id,
         CAST(floor(min(t) / {step_us}) * {step_us} AS BIGINT) AS t0,
         CAST(floor(max(t) / {step_us}) * {step_us} AS BIGINT) AS t1
  FROM o GROUP BY user_id),
g AS (
  SELECT user_id, unnest(generate_series(t0, t1, {step_us})) AS t FROM b)
SELECT g.user_id, g.t, o.v
FROM g ASOF LEFT JOIN o ON g.user_id = o.user_id AND o.t <= g.t
""").fetchall(),
        )
    )
    assert got == want and len(got) > 500


def test_detect_gaps_matches_duckdb_mirror(spark, oracle):
    from tests.conftest import SF_ORACLE

    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    got = sorted(
        (
            r["user_id"],
            int(r["gap_start"].timestamp() * 1_000_000),
            int(r["gap_end"].timestamp() * 1_000_000),
            r["gap_seconds"],
        )
        for r in detect_gaps(events, "user_id", "ts", 24 * 3600).collect()
    )
    want = sorted(
        map(
            tuple,
            oracle.sql("""
WITH t AS (SELECT DISTINCT user_id, epoch_us(ts) AS t FROM events),
l AS (SELECT user_id, t,
             lag(t) OVER (PARTITION BY user_id ORDER BY t) AS p
      FROM t)
SELECT user_id, p, t, (t - p) / 1000000.0 AS gap_seconds
FROM l WHERE t - p >= CAST(86400 AS BIGINT) * 1000000
""").fetchall(),
        )
    )
    assert got == want and len(got) > 10
