"""Histograms (operators/aggregates.py): equi-width counts bit-exact
vs a DuckDB mirror, clamping/edge semantics, empty bins emitted,
equi-depth boundaries = exact percentiles with upper-inclusive bins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from web_api_postgres_etl_spark.operators.aggregates import (
    histogram_equi_depth,
    histogram_equi_width,
)


def test_equi_width_matches_duckdb_mirror(spark, oracle):
    df = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    got = sorted(
        (r["bin"], repr(r["bin_lo"]), repr(r["bin_hi"]), r["n"])
        for r in histogram_equi_width(df, "l_extendedprice", 16).collect()
    )
    want = sorted(
        (b, repr(lo), repr(hi), n)
        for b, lo, hi, n in oracle.execute("""
            WITH b AS (
              SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
                     CAST(max(l_extendedprice) AS DOUBLE) AS hi
              FROM lineitem),
            c AS (
              SELECT CAST(least(greatest(floor(
                       (CAST(l_extendedprice AS DOUBLE) - lo) * 16.0
                       / (hi - lo)), 0), 15) AS INT) AS bin,
                     count(*) AS n
              FROM lineitem, b
              WHERE l_extendedprice IS NOT NULL
              GROUP BY 1),
            grid AS (
              SELECT CAST(i AS INT) AS bin,
                     lo + i * (hi - lo) / 16.0 AS bin_lo,
                     lo + (i + 1) * (hi - lo) / 16.0 AS bin_hi
              FROM (SELECT unnest(generate_series(0, 15)) AS i), b)
            SELECT grid.bin, bin_lo, bin_hi, coalesce(n, 0)
            FROM grid LEFT JOIN c ON grid.bin = c.bin
        """).fetchall()
    )
    assert got == want
    total = sum(n for _, _, _, n in got)
    assert total == df.filter("l_extendedprice IS NOT NULL").count()


def test_equi_width_edges_and_empty_bins(spark):
    df = spark.createDataFrame(
        [(0.0,), (5.0,), (10.0,), (None,)], "v double"
    )
    rows = {r["bin"]: r["n"] for r in histogram_equi_width(df, "v", 2).collect()}
    # half-open bins: 5.0 sits exactly on bin 1's lower edge; v == hi
    # lands in the LAST bin, not a phantom bin 2; NULL excluded
    assert rows == {0: 1, 1: 2}
    # caller range: out-of-range values clamp into edge bins
    clamped = {
        r["bin"]: r["n"]
        for r in histogram_equi_width(df, "v", 2, lo=2.0, hi=4.0).collect()
    }
    assert clamped == {0: 1, 1: 2}
    # empty bins emitted
    sparse = spark.createDataFrame([(0.0,), (9.9,)], "v double")
    bins = histogram_equi_width(sparse, "v", 10).collect()
    assert len(bins) == 10 and sum(r["n"] for r in bins) == 2
    # degenerate range (all values equal): everything in bin 0
    one = spark.createDataFrame([(3.0,), (3.0,)], "v double")
    rows1 = {r["bin"]: r["n"] for r in histogram_equi_width(one, "v", 4).collect()}
    assert rows1 == {0: 2, 1: 0, 2: 0, 3: 0}
    with pytest.raises(ValueError, match="bins"):
        histogram_equi_width(df, "v", 0)
    with pytest.raises(ValueError, match="lo <= hi"):
        histogram_equi_width(df, "v", 2, lo=5.0, hi=1.0)
    # one caller bound + no non-NULL values: the grid anchors to the
    # supplied bound (degenerate [b, b]) instead of discarding it
    empty = spark.createDataFrame([(None,)], "v double")
    anchored = histogram_equi_width(empty, "v", 2, lo=7.0).collect()
    assert [(r["bin_lo"], r["bin_hi"], r["n"]) for r in anchored] == [
        (7.0, 7.0, 0), (7.0, 7.0, 0)
    ]
    anchored_hi = histogram_equi_width(empty, "v", 2, hi=3.0).collect()
    assert all(r["bin_lo"] == 3.0 and r["n"] == 0 for r in anchored_hi)


def test_equi_depth_boundaries_and_counts(spark, oracle):
    df = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    out = histogram_equi_depth(df, "o_totalprice", 4).collect()
    n_total = df.filter("o_totalprice IS NOT NULL").count()
    assert sum(r["n"] for r in out) == n_total
    # ~equal depth on continuous data (ties are rare in prices)
    for r in out:
        assert abs(r["n"] - n_total / 4) <= n_total * 0.01 + 2
    # boundaries == DuckDB quantile_cont bit-exact (the repo-pinned
    # PERCENTILE_CONT equivalence)
    want = oracle.execute("""
        SELECT quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25),
               quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5),
               quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75)
        FROM orders
    """).fetchone()
    edges = sorted({r["bin_hi"] for r in out} | {r["bin_lo"] for r in out})
    for q in want:
        assert q in edges
    # all-NULL column: bins exist, all empty
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    nb = histogram_equi_depth(nulls, "v", 3).collect()
    assert len(nb) == 3 and all(r["n"] == 0 for r in nb)
