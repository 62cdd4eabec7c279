"""Count-min sketch (operators/sketch.py): exact mergeability, the
one-sided estimate guarantee, a bit-exact DuckDB mirror of the cell
table, and heavy-hitter no-false-negatives."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from web_api_postgres_etl_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
    cms_merge,
)


def _cells(df):
    return sorted((r["row"], r["bucket"], r["cnt"]) for r in df.collect())


def test_merge_equals_one_shot(spark):
    """sketch(b1 ∪ b2) ≡ sketch(b1) ⊕ sketch(b2), bit-for-bit — the
    incremental-maintenance property."""
    full = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    b1 = full.filter(F.col("doc_id") % 2 == 0)
    b2 = full.filter(F.col("doc_id") % 2 == 1)
    one = cms_build(full, "lang", depth=3, width=64)
    merged = cms_merge(
        cms_build(b1, "lang", depth=3, width=64),
        cms_build(b2, "lang", depth=3, width=64),
    )
    assert _cells(one) == _cells(merged)
    with pytest.raises(ValueError, match="at least one"):
        cms_merge()


def test_estimate_upper_bound_and_exactness(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    true = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    sk = cms_build(docs, "lang", depth=4, width=1024)
    vals = docs.select("lang").distinct()
    est = {
        r["value"]: r["est"]
        for r in cms_estimate(sk, vals, "lang", depth=4, width=1024).collect()
    }
    assert set(est) == set(true)
    for k in true:
        assert est[k] >= true[k]  # one-sided guarantee
    # a handful of values in a wide sketch: no collisions -> exact
    assert est == true
    # unseen value estimates 0 (or a collision's count; wide -> 0 here)
    ghost = spark.createDataFrame([("klingon",)], "lang string")
    g = cms_estimate(sk, ghost, "lang", depth=4, width=1024).first()
    assert g["est"] == 0


def test_cells_match_duckdb_mirror(spark, oracle):
    got = _cells(cms_build(
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet"),
        "lang", depth=3, width=64,
    ))
    want = sorted(
        tuple(r)
        for r in oracle.execute("""
            WITH ev AS (
              SELECT CAST(lang AS VARCHAR) AS v FROM documents
              WHERE lang IS NOT NULL),
            cells AS (
              SELECT j.j AS row,
                     CAST(CAST(('0x' || substr(md5('cms' || j.j || '|' || v), 1, 13))
                          AS BIGINT) % 64 AS INT) AS bucket
              FROM ev, (SELECT unnest([0, 1, 2]) AS j) j)
            SELECT row, bucket, count(*) AS cnt
            FROM cells GROUP BY row, bucket
        """).fetchall()
    )
    assert got == want and len(got) > 0


def test_heavy_hitters_no_false_negatives(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    true = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    floor = sorted(true.values())[len(true) // 2]  # median count
    heavy_true = {k for k, n in true.items() if n >= floor}
    # narrow sketch FORCES collisions: survivors must still cover
    # every truly-heavy value (one-sided estimates never understate)
    got = {
        r["value"]
        for r in cms_heavy_hitters(
            docs, "source", docs.select("source").distinct(),
            min_count=floor, depth=2, width=8,
        ).collect()
    }
    assert heavy_true <= got


def test_parameter_guards(spark):
    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(ValueError, match="depth"):
        cms_build(df, "v", depth=0)
    with pytest.raises(ValueError, match="width"):
        cms_build(df, "v", width=1)
    # NULLs are not events
    withnull = spark.createDataFrame([("x",), (None,)], "v string")
    total = (
        cms_build(withnull, "v", depth=1, width=8)
        .agg(F.sum("cnt")).first()[0]
    )
    assert total == 1


def test_streaming_cms_maintenance(spark, tmp_path):
    """Two-batch ingest: merged store ≡ one-shot sketch of all input
    bit-for-bit; replay (fresh checkpoint read of the same files) is
    idempotent per checkpoint; a mismatched family refuses to write."""
    from web_api_postgres_etl_spark.streaming.sketch_stream import (
        cms_maintain_run,
        read_cms_family,
        read_cms_state,
    )

    full = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "lang"
    )
    root = str(tmp_path)
    src, state, ckpt = f"{root}/src", f"{root}/state", f"{root}/ckpt"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        full.filter(F.col("doc_id") % 2 == 0).write.parquet(src)
        cms_maintain_run(
            spark, src, state, ckpt, full.schema, "lang", depth=3, width=64
        )
        full.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
        cms_maintain_run(
            spark, src, state, ckpt, full.schema, "lang", depth=3, width=64
        )
        merged = read_cms_state(spark, state)
        one_shot = cms_build(full, "lang", depth=3, width=64)
        assert _cells(merged) == _cells(one_shot)
        assert read_cms_family(spark, state) == ("lang", 3, 64)
        # draining again with nothing new leaves the store unchanged
        cms_maintain_run(
            spark, src, state, ckpt, full.schema, "lang", depth=3, width=64
        )
        assert _cells(read_cms_state(spark, state)) == _cells(one_shot)
        # family mismatch refuses loudly
        with pytest.raises(ValueError, match="family"):
            cms_maintain_run(
                spark, src, state, f"{root}/ckpt2", full.schema,
                "lang", depth=4, width=64,
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_streaming_cms_empty_and_guard_semantics(spark, tmp_path):
    """Review regressions: an initialized store with no cells reads as
    the empty sketch; a mis-pointed path raises; cells without a
    sidecar refuse a new family; equivalent checkpoint spellings share
    one partition tag (no double-count)."""
    from web_api_postgres_etl_spark.streaming.sketch_stream import (
        cms_maintain_run,
        read_cms_state,
    )

    root = str(tmp_path)
    src, state, ckpt = f"{root}/src", f"{root}/state", f"{root}/ckpt"
    schema = "doc_id long, lang string"
    empty = spark.createDataFrame([], schema)
    empty.write.parquet(src)  # only _SUCCESS: zero-row batch
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        cms_maintain_run(spark, src, state, ckpt, empty.schema, "lang",
                         depth=2, width=16)
        out = read_cms_state(spark, state)
        assert out.count() == 0 and out.columns == ["row", "bucket", "cnt"]
        # mis-pointed path (no sidecar, no cells) still raises
        with pytest.raises(Exception):
            read_cms_state(spark, f"{root}/nowhere")
        # trailing-slash spelling = same checkpoint tag: re-drain with
        # the alternate spelling adds nothing
        spark.createDataFrame([(1, "en")], schema).write.mode(
            "append"
        ).parquet(src)
        cms_maintain_run(spark, src, state, ckpt + "/", empty.schema,
                         "lang", depth=2, width=16)
        total = read_cms_state(spark, state).agg(F.sum("cnt")).first()[0]
        assert total == 2  # one event x depth 2, counted once

        # cells present but sidecar lost: refuse to adopt a new family
        import shutil

        shutil.rmtree(state + "_meta")
        with pytest.raises(ValueError, match="refusing to adopt"):
            cms_maintain_run(spark, src, state, f"{root}/ckpt2",
                             empty.schema, "lang", depth=5, width=32)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
