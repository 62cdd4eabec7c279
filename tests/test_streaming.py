"""Structured Streaming incremental: AvailableNow file stream →
foreachBatch append+compact; second delivery upserts."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from web_api_postgres_etl_spark.streaming.incremental import incremental_stream

SCHEMA = "id long, j_date string, name string, `meta.version` long, price double"


def _write_batch(spark, src_dir, rows, fname):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(f"{src_dir}/.staging_{fname}")
    # move the part file in as one new file (simulating an arriving batch)
    import glob
    import shutil

    os.makedirs(src_dir, exist_ok=True)
    part = glob.glob(f"{src_dir}/.staging_{fname}/part-*.parquet")[0]
    shutil.move(part, f"{src_dir}/{fname}.parquet")
    shutil.rmtree(f"{src_dir}/.staging_{fname}")


def test_streaming_incremental_upsert(spark, tmp_path):
    src = str(tmp_path / "incoming")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    _write_batch(
        spark, src,
        [(1, "1401/01/01", "a", 1, 10.0), (2, "1401/01/02", "b", 2, 20.0)],
        "batch1",
    )
    q = incremental_stream(
        spark, src, sink, ckpt,
        transform=lambda df: df.filter(F.col("price") > 0),
        keys=["j_date", "name"],
        schema=SCHEMA,
    )
    q.awaitTermination(120)
    out1 = {r["name"]: r["meta.version"] for r in spark.read.parquet(sink).collect()}
    assert out1 == {"a": 1, "b": 2}

    # second delivery: new version of key (1401/01/01, a) + new key c
    _write_batch(
        spark, src,
        [(3, "1401/01/01", "a", 3, 11.0), (4, "1401/01/03", "c", 4, 30.0)],
        "batch2",
    )
    q2 = incremental_stream(
        spark, src, sink, ckpt,
        transform=lambda df: df.filter(F.col("price") > 0),
        keys=["j_date", "name"],
        schema=SCHEMA,
    )
    q2.awaitTermination(120)
    final = {r["name"]: (r["meta.version"], r["price"]) for r in spark.read.parquet(sink).collect()}
    assert final == {"a": (3, 11.0), "b": (2, 20.0), "c": (4, 30.0)}
