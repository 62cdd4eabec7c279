"""Time-series operators: regular-grid resampling with forward fill,
and gap detection.

Reference surface: the reference ETL's trades / indexvalues tables
(mabna_tables_etl.py) are daily financial series with holiday gaps —
it papers over them downstream in BI; a Spark-scale pipeline wants the
grid materialized once, correctly. North-star surface: sensor/event
firehoses resampled onto a fixed cadence for feature windows.

Semantics (``resample_ffill``): per key, a grid of timestamps at
``step_seconds`` cadence spanning floor(min ts) .. floor(max ts)
(epoch-floored to the step, so grids of different keys ALIGN — the
point of resampling); each grid point carries the most recent
observation at-or-before it (forward fill), NULL before the first
observation. Duplicate observations at one exact timestamp reduce
deterministically first (max value, or ``max_by(value, tiebreaker)``).

Scale shape: one groupBy for the per-key bounds, the grid explode is
span/step rows per key (caller-controlled density), and the fill is
ONE union + ONE window per key ordered by time — no equi-join fan-out
of every grid point onto every candidate observation, no range join.
All time arithmetic is integer microseconds (``unix_micros``), so any
engine reproduces the grid and the fill bit-for-bit; the DuckDB
oracle in tests mirrors it with epoch_us + native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .project import qcol


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    tiebreaker: str | None = None,
    cache_observations: bool = True,
    pins: list[DataFrame] | None = None,
) -> DataFrame:
    """(key, grid_ts, value) — the series resampled to a regular grid
    with forward fill. ``tiebreaker``: column deciding which of
    several same-timestamp observations wins (max wins; default: max
    of ``value_col`` itself, still deterministic).

    A NULL-VALUED observation is still an observation: it resets the
    fill to NULL (the feed explicitly reported no value) rather than
    letting an older value leak through — matching ASOF-join
    semantics, where the most recent row wins whatever it carries.

    ``cache_observations`` persists the deduplicated observation
    frame — it feeds both the grid-bounds aggregate and the fill
    union, and the repo's measured per-branch recompute would
    otherwise scan + reduce the source twice. Same ``pins`` release
    contract as the dedup operators."""
    if step_seconds < 1:
        raise ValueError(f"step_seconds must be >= 1, got {step_seconds}")
    step_us = int(step_seconds) * 1_000_000
    key, ts, val = qcol(key_col), qcol(ts_col), qcol(value_col)

    obs = df.select(
        key.alias("__k"),
        F.unix_micros(ts).alias("__t"),
        val.alias("__v"),
        (qcol(tiebreaker) if tiebreaker is not None else val).alias("__tb"),
    ).filter(F.col("__t").isNotNull())
    # deterministic pre-reduce of exact-timestamp duplicates
    obs = obs.groupBy("__k", "__t").agg(
        F.max_by("__v", "__tb").alias("__v")
    )
    if cache_observations:
        obs = obs.persist()
        if pins is not None:
            pins.append(obs)

    bounds = obs.groupBy("__k").agg(
        (F.floor(F.min("__t") / step_us) * step_us).alias("__t0"),
        (F.floor(F.max("__t") / step_us) * step_us).alias("__t1"),
    )
    grid = bounds.select(
        "__k",
        F.explode(
            F.sequence("__t0", "__t1", F.lit(step_us))
        ).alias("__t"),
    )

    # union observations (rank 0) under grid points (rank 1) and carry
    # the last non-null value forward — an observation AT a grid time
    # sorts before the grid row, so it is visible to it
    unioned = obs.select(
        "__k", "__t", F.lit(0).alias("__g"), "__v"
    ).unionByName(
        grid.select(
            "__k", "__t", F.lit(1).alias("__g"),
            F.lit(None).cast(obs.schema["__v"].dataType).alias("__v"),
        )
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # wrap observation rows in a struct so a NULL-VALUED observation
    # stays distinguishable from the grid placeholders — last(...,
    # ignorenulls) skips only the placeholders, never a real NULL
    filled = unioned.withColumn(
        "__f",
        F.last(
            F.when(F.col("__g") == 0, F.struct("__v")), ignorenulls=True
        ).over(w)["__v"],
    ).filter(F.col("__g") == 1)
    return filled.select(
        F.col("__k").alias(key_col),
        F.timestamp_micros(F.col("__t")).alias("grid_ts"),
        F.col("__f").alias(value_col),
    )


def detect_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    min_gap_seconds: int,
) -> DataFrame:
    """(key, gap_start, gap_end, gap_seconds) — consecutive-observation
    gaps of at least ``min_gap_seconds`` per key: the data-quality
    probe run BEFORE trusting a resampled series (a feed that went
    quiet forward-fills stale values; this says where). One window per
    key, integer-microsecond arithmetic, no join."""
    if min_gap_seconds < 1:
        raise ValueError(f"min_gap_seconds must be >= 1, got {min_gap_seconds}")
    key, ts = qcol(key_col), qcol(ts_col)
    w = Window.partitionBy("__k").orderBy("__t")
    out = (
        df.select(key.alias("__k"), F.unix_micros(ts).alias("__t"))
        .filter(F.col("__t").isNotNull())
        .distinct()
        .withColumn("__p", F.lag("__t").over(w))
        .filter(
            F.col("__t") - F.col("__p") >= min_gap_seconds * 1_000_000
        )
    )
    return out.select(
        F.col("__k").alias(key_col),
        F.timestamp_micros(F.col("__p")).alias("gap_start"),
        F.timestamp_micros(F.col("__t")).alias("gap_end"),
        ((F.col("__t") - F.col("__p")) / 1_000_000.0).alias("gap_seconds"),
    )


def rolling_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
) -> DataFrame:
    """Trailing time-RANGE rolling aggregates per key: for every
    observation, the count / DECIMAL sum / min / max of all values in
    ``[t - window_seconds, t]`` (inclusive both ends — every engine's
    RANGE ... PRECEDING AND CURRENT ROW). Appends (roll_n, roll_sum,
    roll_min, roll_max); divide sum/n downstream for a moving average.

    A RANGE frame (not ROWS): irregular series get true time windows,
    and equal-timestamp peers are always in each other's frame, so
    the result is insensitive to tie order. The sum runs over
    DECIMAL(38,10) — exact, order-independent, reproducible in any
    engine (the repo-wide money routing rule); a double sum would
    drift across engines on tie reordering. One (key, ts) sort, no
    join, no grid.

    Enrichment is TOTAL: NULL-timestamp rows pass through with NULL
    aggregates (they belong to no time window) instead of silently
    vanishing; they cost one extra filtered branch of the source."""
    if window_seconds < 1:
        raise ValueError(f"window_seconds must be >= 1, got {window_seconds}")
    out_cols = ("roll_n", "roll_sum", "roll_min", "roll_max")
    clash = (set(out_cols) | {"__roll_t"}) & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with rolling_agg's "
            "output/internal columns — rename them first"
        )
    key, ts, val = qcol(key_col), qcol(ts_col), qcol(value_col)
    with_t = df.withColumn("__roll_t", F.unix_micros(ts))
    w = (
        Window.partitionBy(key)
        .orderBy("__roll_t")
        .rangeBetween(-int(window_seconds) * 1_000_000, 0)
    )
    dec = val.cast("decimal(38,10)")
    windowed = (
        with_t.filter(F.col("__roll_t").isNotNull())
        .withColumn("roll_n", F.count(val).over(w))
        .withColumn("roll_sum", F.sum(dec).over(w))
        .withColumn("roll_min", F.min(val).over(w))
        .withColumn("roll_max", F.max(val).over(w))
    )
    untimed = (
        with_t.filter(F.col("__roll_t").isNull())
        .withColumn("roll_n", F.lit(None).cast("long"))
        .withColumn("roll_sum", F.lit(None).cast("decimal(38,10)"))
        .withColumn("roll_min", F.lit(None).cast(with_t.schema[value_col].dataType))
        .withColumn("roll_max", F.lit(None).cast(with_t.schema[value_col].dataType))
    )
    return windowed.unionByName(untimed).drop("__roll_t")
