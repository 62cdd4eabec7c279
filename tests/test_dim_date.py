"""dim_date generator: span, leap handling, join usability."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_api_postgres_etl_spark.sources.dim_date import generate_dim_date


def test_dim_date_small_span(spark):
    dim = generate_dim_date(spark, 1399, 1401)
    rows = dim.count()
    # 1399 leap (366) + 1400 (365) + 1401 (365)
    assert rows == 366 + 365 + 365
    leap_day = dim.filter(F.col("j_date") == "1399/12/30").collect()
    assert len(leap_day) == 1
    assert leap_day[0]["g_date"].isoformat() == "2021-03-20"
    nowruz = dim.filter(F.col("j_date") == "1400/01/01").first()
    assert nowruz["g_date"].isoformat() == "2021-03-21"
    assert nowruz["j_month_num"] == 1 and nowruz["season_num"] == 1
    assert nowruz["weekday_name_en"] == "Sunday"


def test_dim_date_join_with_staged_j_date(spark):
    dim = generate_dim_date(spark, 1401, 1401)
    facts = spark.createDataFrame(
        [("1401/01/01", 1.0), ("1401/06/31", 2.0)], "j_date string, v double"
    )
    out = facts.join(F.broadcast(dim), "j_date", "inner")
    assert out.count() == 2
