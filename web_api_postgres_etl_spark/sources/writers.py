"""S4/S5 — table sinks (overwrite / append), parquet-native with JDBC parity.

Reference: ``df.to_sql(name, con, if_exists='replace'|'append',
schema=…)`` (mabna_tables_create.py:60-61 and 10 more sites;
mabna_tables_update.py:58-59 and 6 more). ``replace`` drops and
recreates the table non-atomically (readers can observe a missing
table — SURVEY.md §7.4.6); Spark's per-directory parquet overwrite is
kept atomic per table path here.

The engine's canonical storage is parquet (zstd) laid out as
``{warehouse}/{layer}_{name}`` mirroring the reference's
source/staging/production schemas. ``jdbc_*`` variants provide actual-
Postgres parity when a JDBC URL is supplied (not exercised in this
container — no Postgres — but the option plumbing is the real one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def table_path(warehouse: str, layer: str, name: str) -> str:
    return f"{warehouse}/{layer}_{name}"


_FORMATS = ("parquet", "orc", "json", "csv")


def _writer(df: DataFrame, mode: str, partition_by, fmt: str):
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w


def write_overwrite(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Full-refresh sink (S4). ``partition_by`` is the 100 TB lever: prd
    tables partition by Jalali month (j_date prefix) so compaction and
    BI range scans touch only the partitions they need. ``fmt`` picks
    the built-in file format (parquet default; orc for ORC-standard
    warehouses, json/csv for export feeds — columnar formats keep
    predicate pushdown + column pruning, the text formats do not and
    are export-only by design)."""
    _writer(df, "overwrite", partition_by, fmt).save(path)


def write_append(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Incremental append sink (S5) — delta rows only; the last-wins
    compactor (operators.dedup.dedup_last_wins) repairs duplicates."""
    _writer(df, "append", partition_by, fmt).save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", "true").option("inferSchema", "true")
    return r.load(path)


def recover_swap(path: str) -> None:
    """Repair a crashed compact swap before starting a new one.

    The swap sequence (write ``path.tmp`` → move ``path`` → ``path.old``
    → move ``path.tmp`` → ``path`` → rm ``path.old``) has a crash window
    in which ``path`` is gone and the live data sits in ``.old`` (new
    data in ``.tmp``). Compactors call this at entry: restore ``.old``
    to ``path`` when ``path`` vanished mid-swap, then drop any stale
    ``.old``/``.tmp`` so a fresh swap can't nest the live dir inside a
    leftover or fail on an existing target."""
    import os
    import shutil

    old, tmp = path + ".old", path + ".tmp"
    if os.path.exists(old) and not os.path.exists(path):
        shutil.move(old, path)
    for stale in (old, tmp):
        if os.path.exists(stale):
            shutil.rmtree(stale)


def swap_compacted(path: str) -> None:
    """Swap ``path.tmp`` into ``path`` via rename-old → move-new →
    delete-old, so the table path is missing only between two instant
    renames, never for the whole delete. Pair with ``recover_swap`` at
    compact entry for crash safety."""
    import shutil

    old = path + ".old"
    shutil.move(path, old)
    shutil.move(path + ".tmp", path)
    shutil.rmtree(old)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Bucketed managed table — the co-located-join lever.

    Two tables bucketed (and sorted) on the same key with the same
    bucket count join WITHOUT a shuffle on either side: each task zips
    bucket i with bucket i (SortMergeJoin over pre-sorted buckets, no
    Exchange in the plan — asserted in tests/test_bucketed.py). At
    100 TB this removes the dominant cost of repeated fact-fact joins
    (e.g. trades self-conciliation or fact⋈fact enrichments the
    reference never attempts). Requires ``saveAsTable`` (bucket
    metadata lives in the catalog, not in parquet)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


# ------------------------------------------------------------ JDBC parity
def jdbc_options(
    url: str,
    table: str,
    user: str = "",
    password: str = "",
    driver: str = "org.postgresql.Driver",
) -> dict[str, str]:
    """Connection-option dict (S9) — secrets come from env/config, mirroring
    the reference's Airflow connection (mabna_tables_create.py:40-43).
    ``driver`` defaults to Postgres (the reference's engine); tests
    exercise the identical path against the in-process Derby that ships
    with Spark (tests/test_jdbc.py)."""
    opts = {"url": url, "dbtable": table, "driver": driver}
    if user:
        opts["user"] = user
    if password:
        opts["password"] = password
    return opts


def jdbc_write(df: DataFrame, opts: dict[str, str], mode: str) -> None:
    """S4/S5 over JDBC: ``mode`` in {overwrite, append}. ``truncate``
    avoids the reference's drop/recreate DDL churn on overwrite."""
    (
        df.write.format("jdbc")
        .options(**opts)
        .option("truncate", "true")
        .option("batchsize", "10000")
        .mode(mode)
        .save()
    )


def jdbc_read(
    spark: SparkSession,
    opts: dict[str, str],
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """S6 — parallel JDBC scan. The reference reads whole tables on one
    connection (pd.read_sql_query — mabna_tables_create.py:141-144);
    here ``partitionColumn`` on the monotone ``meta.version`` splits the
    read across executors."""
    r = spark.read.format("jdbc").options(**opts)
    if partition_column:
        r = (
            r.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound or 0))
            .option("upperBound", str(upper_bound or 1))
        )
    return r.load()
