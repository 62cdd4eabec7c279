"""SparkSession factory tuned for the engine.

The reference runs single-process pandas per Airflow task (no in-query
parallelism — mabna_tables_create.py:141-154 reads whole tables into
worker RAM). Here one SparkSession owns all query execution; AQE picks
broadcast joins for the small dimension tables and coalesces
post-shuffle partitions, which is the scale story the reference lacks.

Local-mode notes: tests/bench run on ``local[N]`` (single JVM). The
configs below are still the ones you would ship to a 1000-executor
cluster — shuffle partitions sized by data volume, AQE for skew,
zstd parquet, Arrow for any pandas exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "web-api-postgres-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real cluster
    pass ``master=None`` with ``spark-submit`` owning the master URL.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Adaptive query execution: runtime re-plan, partition coalescing,
        # skew-join splitting — the 100 TB safety net.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # Deterministic timestamp semantics for oracle comparison.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas_udf / toPandas exchange (multimodal path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimension tables here are tiny; raise broadcast threshold so the
        # star join never sort-merges a lookup table.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # testdata events.ts is TIMESTAMP(NANOS) — read as long ns
        # (converted to TimestampType by the loaders)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the testdata parquet tables of ``sf_dir`` as a dict of DataFrames."""
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}
