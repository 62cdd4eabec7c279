"""Bucketed co-located joins: same-key/same-count bucketed tables must
join with ZERO shuffle exchanges (the 100 TB fact⋈fact lever)."""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from web_api_postgres_etl_spark.sources.writers import write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    orders = spark.range(0, 2000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_val")
    )
    lines = spark.range(0, 6000).select(
        (F.col("id") % 2000).alias("l_key"), (F.col("id") % 13).alias("l_val")
    )
    write_bucketed(orders, "b_orders", "o_key", 8, path=str(tmp_path / "bo"))
    write_bucketed(lines, "b_lines", "l_key", 8, path=str(tmp_path / "bl"))
    yield spark.table("b_orders"), spark.table("b_lines")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    bo, bl = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo["o_key"] == bl["l_key"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
        # correctness: every line matched exactly once
        assert joined.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
