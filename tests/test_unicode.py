"""Unicode normalization pandas UDFs (`functions/unicode.py`):
hand-built ground truth against Python's unicodedata reference,
NULL totality, idempotence, dedup-key motivation."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_api_postgres_etl_spark.functions.unicode import (
    fold_case,
    nfkc_normalize,
    strip_accents,
)


def _vals(spark, texts, fn):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [r.o for r in df.select(fn("t").alias("o")).collect()]


def test_nfkc_ground_truth(spark):
    got = _vals(
        spark,
        ["ﬁle", "Ｈｅｌｌｏ １２３", "x²", "éclair", None],
        nfkc_normalize,
    )
    # ligature expands, full-width narrows, superscript decomposes,
    # combining accent composes, NULL passes through
    assert got == ["file", "Hello 123", "x2", "éclair", None]


def test_fold_case_ground_truth(spark):
    got = _vals(spark, ["STRASSE", "straße", "İstanbul", None], fold_case)
    assert got[0] == "strasse"
    assert got[1] == "strasse"  # ß folds to ss: equality lower() misses
    assert got[2] == "i̇stanbul"
    assert got[3] is None
    # folding is idempotent (the double-NFKC guard)
    again = _vals(spark, got[:3], fold_case)
    assert again == got[:3]


def test_strip_accents_ground_truth(spark):
    got = _vals(
        spark, ["café", "naïve", "Škoda", "already plain", None], strip_accents
    )
    assert got == ["cafe", "naive", "Skoda", "already plain", None]


def test_normalization_unifies_dedup_keys(spark):
    """The motivating bug: compatibility variants hash apart without
    NFKC, silently splitting duplicate clusters."""
    df = spark.createDataFrame(
        [(1, "the ﬁle is ready"), (2, "the file is ready")],
        "doc_id long, text string",
    )
    raw = df.select(F.md5("text").alias("h")).distinct().count()
    norm = (
        df.select(F.md5(nfkc_normalize("text")).alias("h")).distinct().count()
    )
    assert raw == 2 and norm == 1
