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


# --- sessionize + retention cohorts (operators/aggregates.py) ---------

def test_sessionize_ground_truth(spark):
    from web_api_postgres_etl_spark.operators.aggregates import sessionize

    df = spark.createDataFrame(
        [
            (1, T(0)), (1, T(10)), (1, T(40, 1)),   # 30m1s gap -> new session
            (1, T(40, 1)),                           # duplicate ts, same session
            (2, T(5)),
        ],
        "u long, ts timestamp",
    )
    rows = sessionize(df, "u", "ts", gap_seconds=1800).collect()
    got = sorted((r["u"], r["ts"], r["session_idx"], r["session_start"]) for r in rows)
    assert got == [
        (1, T(0), 0, T(0)),
        (1, T(10), 0, T(0)),
        (1, T(40, 1), 1, T(40, 1)),
        (1, T(40, 1), 1, T(40, 1)),
        (2, T(5), 0, T(5)),
    ]


def test_sessionize_matches_duckdb_and_session_window(spark, oracle):
    from tests.conftest import SF_ORACLE
    from web_api_postgres_etl_spark.operators.aggregates import sessionize

    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    sess = sessionize(events, "user_id", "ts", gap_seconds=1800)
    got = sorted(
        (r["user_id"], int(r["ts"].timestamp() * 1e6), r["session_idx"])
        for r in sess.collect()
    )
    want = sorted(
        map(
            tuple,
            oracle.sql("""
WITH o AS (SELECT user_id, epoch_us(ts) AS t,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS p
           FROM events),
b AS (SELECT user_id, t,
        CASE WHEN p IS NOT NULL AND t - p >= CAST(1800 AS BIGINT)*1000000
             THEN 1 ELSE 0 END AS brk FROM o)
SELECT user_id, t,
       CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS INT) AS session_idx
FROM b
""").fetchall(),
        )
    )
    assert got == want
    # cross-check: per-user session count equals F.session_window's
    n_sessions = sess.select("user_id", "session_idx").distinct().count()
    n_sw = (
        events.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .count()
    )
    assert n_sessions == n_sw


def test_retention_cohorts_ground_truth_and_mirror(spark, oracle):
    from tests.conftest import SF_ORACLE
    from web_api_postgres_etl_spark.operators.aggregates import (
        retention_cohorts,
    )

    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1)),    # Mon, cohort 2024-01-01
            (1, dt.datetime(2024, 1, 10)),   # next week -> idx 1
            (2, dt.datetime(2024, 1, 3)),    # same cohort week
            (2, dt.datetime(2024, 1, 21)),   # Sunday of week idx 2
            (3, dt.datetime(2024, 1, 9)),    # cohort 2024-01-08
        ],
        "u long, ts timestamp",
    )
    got = sorted(
        (str(r["cohort"]), r["period_idx"], r["n_users"])
        for r in retention_cohorts(df, "u", "ts", "week").collect()
    )
    assert got == [
        ("2024-01-01", 0, 2),
        ("2024-01-01", 1, 1),
        ("2024-01-01", 2, 1),
        ("2024-01-08", 0, 1),
    ]

    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    got_w = sorted(
        (str(r["cohort"]), r["period_idx"], r["n_users"])
        for r in retention_cohorts(events, "user_id", "ts", "week").collect()
    )
    want_w = sorted(
        (str(c), i, n)
        for c, i, n in oracle.sql("""
WITH a AS (SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS p FROM events),
f AS (SELECT user_id, min(p) AS cohort FROM a GROUP BY user_id)
SELECT cohort, CAST((a.p - f.cohort) / 7 AS INT) AS period_idx,
       count(DISTINCT a.user_id) AS n_users
FROM a JOIN f USING (user_id) GROUP BY 1, 2
""").fetchall()
    )
    assert got_w == want_w and len(got_w) > 3
    # month face: calendar-month arithmetic
    got_m = sorted(
        (str(r["cohort"]), r["period_idx"], r["n_users"])
        for r in retention_cohorts(events, "user_id", "ts", "month").collect()
    )
    want_m = sorted(
        (str(c), i, n)
        for c, i, n in oracle.sql("""
WITH a AS (SELECT DISTINCT user_id,
             CAST(date_trunc('month', ts) AS DATE) AS p FROM events),
f AS (SELECT user_id, min(p) AS cohort FROM a GROUP BY user_id)
SELECT cohort,
       (year(a.p)*12 + month(a.p)) - (year(f.cohort)*12 + month(f.cohort))
         AS period_idx,
       count(DISTINCT a.user_id) AS n_users
FROM a JOIN f USING (user_id) GROUP BY 1, 2
""").fetchall()
    )
    assert got_m == want_m


def test_resample_null_observation_resets_fill(spark):
    """Review regression: a NULL-valued observation is an observation
    — it must reset the fill to NULL, not let stale values leak."""
    df = spark.createDataFrame(
        [(1, T(0), 5.0, 1), (1, T(2), None, 2), (1, T(4), 7.0, 3)],
        "k long, ts timestamp, v double, seq long",
    )
    pins = []
    out = {
        r["grid_ts"]: r["v"]
        for r in resample_ffill(
            df, "k", "ts", "v", 60, tiebreaker="seq", pins=pins
        ).collect()
    }
    assert out[T(0)] == 5.0 and out[T(1)] == 5.0
    assert out[T(2)] is None and out[T(3)] is None   # reset, not stale
    assert out[T(4)] == 7.0
    from web_api_postgres_etl_spark.plans.curation import release_pins

    assert pins
    release_pins(pins)


def test_sessionize_drops_null_timestamps(spark):
    from web_api_postgres_etl_spark.operators.aggregates import sessionize

    df = spark.createDataFrame(
        [(1, T(0)), (1, None), (1, T(5))], "u long, ts timestamp"
    )
    rows = sessionize(df, "u", "ts", 1800).collect()
    assert len(rows) == 2 and all(r["ts"] is not None for r in rows)


def test_zone_map_update_raises_on_unlistable_path(spark, tmp_path):
    import pytest

    from web_api_postgres_etl_spark.operators.layout import (
        zone_map,
        zone_map_update,
    )

    path = str(tmp_path / "t")
    spark.range(10).select(F.col("id").alias("v")).coalesce(1).write.parquet(path)
    zm = zone_map(spark, path, ["v"])
    # pointing the update at a listing that yields nothing (wrong /
    # remote / moved path) must fail loudly, never return a stale map
    import os as _os

    empty = str(tmp_path / "elsewhere")
    _os.makedirs(empty)
    with pytest.raises(ValueError, match="no data files"):
        zone_map_update(spark, empty, zm, ["v"])


def test_rolling_agg_ground_truth_and_mirror(spark, oracle):
    from decimal import Decimal

    from tests.conftest import SF_ORACLE
    from web_api_postgres_etl_spark.operators.timeseries import rolling_agg

    df = spark.createDataFrame(
        [
            (1, T(0), 1.0), (1, T(1), 2.0), (1, T(1), 10.0),  # tie
            (1, T(2), 4.0), (1, T(30), 8.0),
        ],
        "k long, ts timestamp, v double",
    )
    rows = {
        (r["k"], r["ts"], r["v"]): (r["roll_n"], float(r["roll_sum"]))
        for r in rolling_agg(df, "k", "ts", "v", window_seconds=120).collect()
    }
    # both tie rows see each other regardless of order
    assert rows[(1, T(1), 2.0)] == (3, 13.0)
    assert rows[(1, T(1), 10.0)] == (3, 13.0)
    assert rows[(1, T(2), 4.0)] == (4, 17.0)
    assert rows[(1, T(30), 8.0)] == (1, 8.0)   # 10:28 is outside 2 min? no:
    # T(30) - 120s = 10:28:00; earlier events at 10:00..10:02 excluded
    got = sorted(
        (
            r["user_id"], int(r["ts"].timestamp() * 1e6), r["value"],
            r["roll_n"], r["roll_sum"], r["roll_min"], r["roll_max"],
        )
        for r in rolling_agg(
            spark.read.parquet(f"{SF_ORACLE}/events.parquet").select(
                "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
            ),
            "user_id", "ts", "value", window_seconds=6 * 3600,
        ).collect()
    )
    want = sorted(
        (u, t, v, n, Decimal(s).quantize(Decimal("1.0000000000")), mn, mx)
        for u, t, v, n, s, mn, mx in oracle.sql("""
SELECT user_id, epoch_us(ts) AS t, value,
       count(value) OVER w AS roll_n,
       sum(CAST(value AS DECIMAL(38,10))) OVER w AS roll_sum,
       min(value) OVER w AS roll_min,
       max(value) OVER w AS roll_max
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN CAST(21600 AS BIGINT)*1000000 PRECEDING
                   AND CURRENT ROW)
""").fetchall()
    )
    assert got == want and len(got) == 10000


def test_rolling_agg_total_and_collision_guard(spark):
    import pytest

    from web_api_postgres_etl_spark.operators.timeseries import rolling_agg

    df = spark.createDataFrame(
        [(1, T(0), 5.0), (1, None, 9.0)], "k long, ts timestamp, v double"
    )
    rows = {r["v"]: (r["roll_n"], r["roll_sum"]) for r in rolling_agg(
        df, "k", "ts", "v", 60
    ).collect()}
    assert len(rows) == 2                      # NULL-ts row preserved
    assert rows[9.0] == (None, None)           # ...with NULL aggregates
    assert rows[5.0][0] == 1
    with pytest.raises(ValueError, match="collide"):
        rolling_agg(df.withColumn("roll_n", F.lit(1)), "k", "ts", "v", 60)
