"""Multimodal plumbing: binary columns, mapInPandas batch kernel,
frame-sample fan-out — real Spark mechanics around a stubbed codec."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from web_api_postgres_etl_spark.operators.multimodal import (
    decode_image,
    extract_image_features,
    fake_image_features,
    frame_sample_plan,
    media_stats,
)


def _media(spark):
    rows = [
        (1, b"\x89PNG-fake-bytes-1", ("image/png", 64, 64, None, None, "png")),
        (2, b"\x89PNG-fake-bytes-22", ("image/png", 32, 32, None, None, "png")),
        (3, b"RIFF-fake-audio", ("audio/wav", None, None, 16000, 2500, "pcm")),
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, content binary, media_meta "
        "struct<mime:string,width:int,height:int,sample_rate:int,duration_ms:int,codec:string>",
    )


def test_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"x", None)


def test_fake_features_deterministic():
    a = fake_image_features(b"same-bytes")
    b = fake_image_features(b"same-bytes")
    assert a == b and len(a) == 8
    assert all(0.0 <= x < 1.0 for x in a)


def test_extract_image_features_mapinpandas(spark):
    out = {r["media_id"]: r for r in extract_image_features(_media(spark)).collect()}
    assert len(out) == 3
    assert out[1]["sha256"] == hashlib.sha256(b"\x89PNG-fake-bytes-1").hexdigest()
    assert out[1]["n_bytes"] == len(b"\x89PNG-fake-bytes-1")
    assert len(out[1]["feature"]) == 8
    # kernel output matches the driver-side reference implementation
    assert out[2]["feature"] == pytest.approx(fake_image_features(b"\x89PNG-fake-bytes-22"))


def test_frame_sample_plan_fanout(spark):
    frames = frame_sample_plan(_media(spark), every_ms=1000).collect()
    # only the audio row has duration (2500ms) → frames at 0,1000,2000
    assert [(r["media_id"], r["frame_ts_ms"]) for r in frames] == [
        (3, 0), (3, 1000), (3, 2000)
    ]


def test_media_stats_jvm_only(spark):
    stats = {r["mime"]: r for r in media_stats(_media(spark)).collect()}
    assert stats["image/png"]["n"] == 2
    assert stats["audio/wav"]["total_bytes"] == len(b"RIFF-fake-audio")


def test_resize_plan_geometry_exact(spark):
    """Aspect-preserving fit: floor(dim * min(512/w, 512/h, 1))."""
    from web_api_postgres_etl_spark.operators.multimodal import resize_image_plan
    from pyspark.sql import functions as F

    rows = [(1, 1024, 512), (2, 256, 128), (3, 100, 700)]
    media = spark.createDataFrame(
        rows, "media_id long, w int, h int"
    ).select(
        "media_id",
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.col("w").alias("width"),
            F.col("h").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("media_meta"),
    )
    got = {
        r["media_id"]: (r["src_w"], r["src_h"], r["dst_w"], r["dst_h"])
        for r in resize_image_plan(media, 512, 512).collect()
    }
    assert got[1] == (1024, 512, 512, 256)
    assert got[2] == (256, 128, 256, 128)   # no upscale
    assert got[3] == (100, 700, 73, 512)    # floor(100 * 512/700) = 73


def test_resize_plan_oracle_parity(spark, oracle):
    """The retired driver slot's check, kept at test level: the resize
    entry still matches its DuckDB oracle exactly (q_multimodal_resize
    was swapped out of queries() for semantic_dup_pairs, not deleted)."""
    import __spark_entry__ as em

    s = sorted(
        tuple(r)
        for r in em.q_multimodal_resize(
            spark, "/root/testdata/sf0.01"
        ).collect()
    )
    d = sorted(tuple(r) for r in oracle.execute(em.SQL_RESIZE).fetchall())
    assert s == d


def test_image_near_dups_finds_byte_duplicates(spark):
    """Identical bytes → identical fake features → cosine 1.0 pair;
    distinct content stays unpaired at a high threshold."""
    from web_api_postgres_etl_spark.operators.multimodal import (
        image_near_dups,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, b"imagebytes-alpha" * 100),
        (2, b"imagebytes-alpha" * 100),   # byte-dup of 1
        (3, b"imagebytes-beta" * 100),
        (4, b"imagebytes-gamma" * 90),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, content binary"
    ).withColumn("media_meta", F.lit(None).cast(
        "struct<mime:string,width:int,height:int,sample_rate:int,"
        "duration_ms:int,codec:string>"
    ))
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in image_near_dups(media, threshold=0.999).collect()
    }
    assert pairs.get((1, 2)) == 1.0
    assert all(p == (1, 2) for p in pairs)
