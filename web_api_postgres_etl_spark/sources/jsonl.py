"""JSONL corpus source — the wire format web-scale text corpora
actually arrive in (Common Crawl derivatives, Dolma, RedPajama all
ship newline-delimited JSON), read with explicit corrupt-record
capture instead of silent row loss.

The reference ingests JSON only from its REST API via pandas
(mabna_tables_create.py:58 ``pd.json_normalize``) and would drop or
crash on a malformed line; at 100 TB a few corrupt lines per shard
are CERTAIN (truncated uploads, encoding damage), and the difference
between "quietly vanished" and "quarantined with the raw line" is an
auditable pipeline.

Spark-first: ``spark.read.json`` with PERMISSIVE mode and
``columnNameOfCorruptRecord`` — the JVM JSON parser does the work,
schema pruning and predicate pushdown still apply to the clean rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    corrupt_col: str = CORRUPT_COL,
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): parse a JSONL path; rows that fail to parse
    land in ``quarantine`` with the raw line preserved in
    ``corrupt_col`` (plus any fields that did parse), clean rows come
    back without the bookkeeping column.

    Pass ``schema`` in production — schema inference is an extra full
    read of the data, and an inferred schema drifts with the batch
    (a field null in every row of one shard infers as string in the
    next). The corrupt column is appended to the schema here; don't
    include it yourself.

    Implementation note: the frames are built from ``spark.read.text``
    + a ``from_json`` EXPRESSION rather than the JSON file source's
    internal corrupt-record machinery — the file-source form forbids
    any query whose pruned schema is only the corrupt column
    (``quarantine.count()`` would throw QUERY_ONLY_CORRUPT_RECORD_
    COLUMN); the expression form has no such restriction, and the
    line scan costs the same bytes. Blank lines are skipped, matching
    the native JSON reader."""
    if schema is None:
        # inference needs a parse pass anyway — let the native reader
        # derive the field layout, then re-read through the text path
        schema = T.StructType(
            [
                f
                for f in spark.read.json(path).schema.fields
                if f.name != corrupt_col
            ]
        )
    if corrupt_col in schema.fieldNames():
        raise ValueError(
            f"schema must not already contain {corrupt_col!r} — "
            "it is appended automatically"
        )
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    parsed = (
        spark.read.text(path)
        .filter(F.trim(F.col("value")) != "")
        .select(
            F.col("value").alias("__raw"),
            F.from_json(
                F.col("value"),
                full,
                {"columnNameOfCorruptRecord": corrupt_col},
            ).alias("__j"),
        )
    )
    # the JSON literal `null` parses to a NULL struct (no corrupt
    # column populated) — a truncation artifact, not a record;
    # quarantine it rather than letting it dissolve into null padding
    bad_flag = F.col(f"__j.{corrupt_col}").isNotNull() | F.col("__j").isNull()
    data_cols = [F.col(f"__j.{f.name}").alias(f.name) for f in schema.fields]
    good = parsed.filter(~bad_flag).select(*data_cols)
    quarantine = parsed.filter(bad_flag).select(
        *data_cols, F.col("__raw").alias(corrupt_col)
    )
    return good, quarantine


def stream_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Streaming face of :func:`read_jsonl_corpus` — the from_json
    expression is stream-safe by construction (no corrupt-record file
    machinery, no batch-only column pruning rules), so continuous
    JSONL ingest gets the identical parse + quarantine semantics.

    Returns ONE streaming frame: the schema's columns plus
    ``corrupt_col`` (NULL for clean rows, the raw line for corrupt
    ones) — split it in the sink (``foreachBatch`` writing clean rows
    to the corpus and corrupt ones to a quarantine path), because two
    filtered streaming frames would be two queries each re-reading
    the source. Schema is REQUIRED: a stream cannot infer one."""
    if corrupt_col in schema.fieldNames():
        raise ValueError(
            f"schema must not already contain {corrupt_col!r} — "
            "it is appended automatically"
        )
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    lines = spark.readStream.text(path).filter(F.trim(F.col("value")) != "")
    parsed = lines.select(
        F.col("value").alias("__raw"),
        F.from_json(
            F.col("value"), full, {"columnNameOfCorruptRecord": corrupt_col}
        ).alias("__j"),
    )
    data_cols = [F.col(f"__j.{f.name}").alias(f.name) for f in schema.fields]
    return parsed.select(
        *data_cols,
        F.when(
            F.col(f"__j.{corrupt_col}").isNotNull() | F.col("__j").isNull(),
            F.col("__raw"),
        ).alias(corrupt_col),
    )


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
    sep: str = ",",
    header: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """CSV sibling of :func:`read_jsonl_corpus` — same (good,
    quarantine) contract via a ``from_csv`` expression over a text
    scan, so malformed rows (wrong arity, uncastable fields) keep
    their raw line instead of dissolving into nulls. Schema is
    required: headers name columns, they cannot type them.

    A row is quarantined when the parser flags it, when any schema
    field fails to cast (from_csv pads missing trailing fields with
    nulls rather than flagging, so arity errors surface as cast
    failures on typed columns), or when the line carries an ODD number
    of quote characters — the signature of a quoted field split
    across physical lines. RECORDS MUST BE SINGLE-LINE: the text scan
    splits on newlines before the CSV parser runs, so a writer that
    embeds raw newlines inside quoted fields needs
    ``spark.read.csv(multiLine=True)`` instead (at the cost of losing
    splittable scans AND this function's quarantine contract); the
    parity check turns such records into quarantine entries instead
    of silently truncated "good" rows.

    Header lines are matched by VALUE (a distributed text scan has no
    file-order guarantee to hang a "first row" off; part-file
    concatenation emits many header lines): the schema's exact
    rendering, plain / fully-quoted / BOM-prefixed. A differently
    spelled header lands in quarantine — visible, not silent. With an
    all-string schema a data row could be indistinguishable from a
    header, so that combination raises: strip headers upstream and
    pass ``header=False``."""
    if corrupt_col in schema.fieldNames():
        raise ValueError(
            f"schema must not already contain {corrupt_col!r} — "
            "it is appended automatically"
        )
    if header and all(
        isinstance(f.dataType, T.StringType) for f in schema.fields
    ):
        raise ValueError(
            "header=True with an all-string schema cannot distinguish "
            "a header line from a data row whose values equal the "
            "column names — strip headers upstream and pass "
            "header=False"
        )
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    lines = spark.read.text(path).filter(F.trim(F.col("value")) != "")
    if header:
        header_plain = sep.join(f.name for f in schema.fields)
        header_quoted = sep.join(f'"{f.name}"' for f in schema.fields)
        lines = lines.filter(
            ~F.col("value").isin(
                header_plain, header_quoted, "﻿" + header_plain
            )
        )
    parsed = lines.select(
        F.col("value").alias("__raw"),
        F.from_csv(
            F.col("value"),
            full.simpleString(),
            {"columnNameOfCorruptRecord": corrupt_col, "sep": sep},
        ).alias("__j"),
    )
    # odd quote count == an unclosed quoted field (a record split
    # across lines, or plain damage) — from_csv may still "parse" the
    # fragment, so catch it explicitly
    odd_quotes = (
        (
            F.length("__raw")
            - F.length(F.replace(F.col("__raw"), F.lit('"'), F.lit("")))
        )
        % 2
        == 1
    )
    bad_flag = (
        F.col(f"__j.{corrupt_col}").isNotNull()
        | F.col("__j").isNull()
        | odd_quotes
    )
    data_cols = [F.col(f"__j.{f.name}").alias(f.name) for f in schema.fields]
    good = parsed.filter(~bad_flag).select(*data_cols)
    quarantine = parsed.filter(bad_flag).select(
        *data_cols, F.col("__raw").alias(corrupt_col)
    )
    return good, quarantine


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Export a frame as JSONL — the interchange face for downstream
    tokenizer/training jobs that read text, not parquet. One file per
    partition; compose with ``coalesce``/``compact_small_files``
    sizing upstream when file counts matter."""
    df.write.mode(mode).json(path)
