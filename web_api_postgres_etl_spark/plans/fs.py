"""Warehouse-path probes that work on ANY Hadoop filesystem.

The pipeline's skip/bootstrap decisions ("is this stg table present
yet?", "is this sink empty or corrupt?") were originally
``os.path.exists`` checks — correct on local[?] but silently wrong the
day the warehouse moves to HDFS/S3: every path reads as absent, every
prd refresh is skipped behind a green run (the stale-prd hazard the
r13 hardening set out to close). These helpers route the same checks
through the Hadoop FileSystem API resolved FROM the path itself, so
``file:``, ``hdfs:`` and ``s3a:`` warehouses all answer truthfully;
bare paths resolve against ``fs.defaultFS`` exactly as Spark's own
readers do.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on its own filesystem (scheme-aware:
    the filesystem is resolved from the path, falling back to
    ``fs.defaultFS`` for bare paths — the resolution Spark's readers
    themselves use, so "exists" here agrees with what a subsequent
    ``spark.read`` would see)."""
    fs, hpath = _hadoop_path(spark, path)
    return bool(fs.exists(hpath))


def has_data_files(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` holds at least one DATA file (recursive,
    skipping ``_*``/``.*`` bookkeeping such as ``_SUCCESS`` and
    checksums). Distinguishes the two faces Spark reports identically
    as ``UNABLE_TO_INFER_SCHEMA``: a zero-row partitioned write that
    left only ``_SUCCESS`` (legitimately empty → probe None) versus a
    directory whose data files exist but cannot be read as parquet
    (corrupt → must raise, never silently re-ingest)."""
    fs, hpath = _hadoop_path(spark, path)
    if not fs.exists(hpath):
        return False
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if not (name.startswith("_") or name.startswith(".")):
            return True
    return False
