"""Data-quality expectations: ground truth, NULL-fails semantics, the
raise gate, quarantine split, and a DuckDB mirror on lineitem."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_api_postgres_etl_spark.operators.quality import (
    expect,
    expect_or_raise,
    quarantine,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, -5.0, "b"),      # fails non_negative
            (3, None, "c"),      # NULL predicate -> fails non_negative
            (4, 7.0, None),      # fails tag_present
        ],
        "id long, amount double, tag string",
    )


def _rules():
    # built lazily: Column construction needs an active SparkContext
    return {
        "non_negative": F.col("amount") >= 0,
        "tag_present": "tag IS NOT NULL",
        "id_positive": F.col("id") > 0,
    }


def test_expect_report(spark):
    rows = {r["rule"]: (r["n_rows"], r["n_failed"], r["pass"])
            for r in expect(_df(spark), _rules()).collect()}
    assert rows == {
        "non_negative": (4, 2, False),   # -5 and NULL both fail
        "tag_present": (4, 1, False),
        "id_positive": (4, 0, True),
    }
    # report preserves mapping order
    order = [r["rule"] for r in expect(_df(spark), _rules()).collect()]
    assert order == list(_rules())


def test_expect_or_raise(spark):
    with pytest.raises(ValueError, match="non_negative: 2 rows"):
        expect_or_raise(_df(spark), _rules())
    ok = _df(spark).filter("amount >= 0 AND tag IS NOT NULL")
    assert expect_or_raise(ok, _rules()) is ok


def test_quarantine_split(spark):
    clean, bad = quarantine(_df(spark), _rules())
    assert sorted(r["id"] for r in clean.collect()) == [1]
    got = {r["id"]: sorted(r["failed_rules"]) for r in bad.collect()}
    assert got == {
        2: ["non_negative"],
        3: ["non_negative"],
        4: ["tag_present"],
    }
    assert "failed_rules" not in clean.columns


def test_expect_single_pass_plan(spark):
    """All rules ride ONE aggregate over one scan — no per-rule jobs."""
    df = _df(spark)
    report = expect(df, _rules())
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_expect_matches_duckdb_mirror(spark, oracle):
    from tests.conftest import SF_ORACLE

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    rules = {
        "qty_in_range": "l_quantity BETWEEN 1 AND 50",
        "price_positive": F.col("l_extendedprice") > 0,
        "discount_unit_interval": "l_discount BETWEEN 0 AND 1",
        "impossible": "l_quantity < 0",
    }
    got = sorted(
        (r["rule"], r["n_rows"], r["n_failed"], r["pass"])
        for r in expect(li, rules).collect()
    )
    want = sorted(
        map(
            tuple,
            oracle.sql("""
WITH a AS (
  SELECT count(*) AS n,
    sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE)
             THEN 1 ELSE 0 END) AS f1,
    sum(CASE WHEN NOT coalesce(l_extendedprice > 0, FALSE)
             THEN 1 ELSE 0 END) AS f2,
    sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 1, FALSE)
             THEN 1 ELSE 0 END) AS f3,
    sum(CASE WHEN NOT coalesce(l_quantity < 0, FALSE)
             THEN 1 ELSE 0 END) AS f4
  FROM lineitem)
SELECT 'qty_in_range', n, f1, f1 = 0 FROM a
UNION ALL SELECT 'price_positive', n, f2, f2 = 0 FROM a
UNION ALL SELECT 'discount_unit_interval', n, f3, f3 = 0 FROM a
UNION ALL SELECT 'impossible', n, f4, f4 = 0 FROM a
""").fetchall(),
        )
    )
    assert got == want
    # sanity: the impossible rule fails on EVERY row
    imp = next(r for r in got if r[0] == "impossible")
    assert imp[2] == imp[1] and not imp[3]


def test_expect_rule_names_are_data(spark):
    """Rule names are data, not SQL: any characters survive verbatim
    (the unpivot carries them as literals, no string splicing)."""
    for name in ("o'brien's \\ rule", "multi\nline", "tab\tname"):
        rows = expect(_df(spark), {name: "id > 0"}).collect()
        assert rows[0]["rule"] == name and rows[0]["pass"]


def test_expect_or_raise_rejects_empty_load(spark):
    empty = _df(spark).filter("id < 0")
    with pytest.raises(ValueError, match="0 rows"):
        expect_or_raise(empty, _rules())
    assert expect_or_raise(empty, _rules(), require_rows=False).count() == 0


def test_quarantine_rejects_reasons_col_collision(spark):
    df = _df(spark).withColumn("failed_rules", F.lit("x"))
    with pytest.raises(ValueError, match="failed_rules"):
        quarantine(df, _rules())
