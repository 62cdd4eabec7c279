"""T2 — high-watermark manager.

The reference re-derives watermarks from the sink itself each run:
``SELECT MAX("meta.version")`` per production table
(mabna_tables_update.py:69-98), passed between tasks as a dict (XCom).
Self-describing state — no separate store to drift out of sync; we keep
that design: probe the sink parquet footers (cheap: column min/max
stats) and return a plain dict.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.aggregates import max_watermark
from .fs import has_data_files, path_exists


def _error_condition(exc) -> str | None:
    """Top-level error condition of a PySpark exception (e.g.
    ``UNRESOLVED_COLUMN.WITH_SUGGESTION`` → ``UNRESOLVED_COLUMN``), or
    None when the exception carries no condition. Message-substring
    classification is version-dependent (and a condition name quoted
    inside an unrelated message would misclassify); the condition field
    is the stable contract."""
    for getter in ("getCondition", "getErrorClass"):
        fn = getattr(exc, getter, None)
        if fn is None:
            continue
        try:
            cond = fn()
        except Exception:
            continue
        if cond:
            return str(cond).split(".", 1)[0]
    return None


class WatermarkManager:
    """Probe-and-carry watermark state for one warehouse directory."""

    def __init__(self, spark: SparkSession, warehouse: str, version_col: str = "meta.version"):
        self.spark = spark
        self.warehouse = warehouse
        self.version_col = version_col

    def probe(self, table_paths: dict[str, str]) -> dict[str, int | None]:
        """{table → max(version) | None-if-missing/empty} — the XCom
        dict. Only a table that does not exist YET downgrades to None —
        missing path, a dir holding no data files (a zero-row
        partitioned write leaves just _SUCCESS → UNABLE_TO_INFER_SCHEMA),
        or one without the version column (pre-versioned bootstrap).
        Any other probe failure propagates (r13, the _read_index_meta
        rule): a corrupt sink silently probing None would re-ingest
        the entire source — correct by last-wins idempotence, but a
        full-corpus rescan at 100 TB must be a DECISION, not a
        swallowed error."""
        from pyspark.errors import AnalysisException

        out: dict[str, int | None] = {}
        for name, path in table_paths.items():
            # scheme-aware (plans.fs): on an HDFS/S3 warehouse a local
            # os.path.exists would read EVERY sink as absent and probe
            # None across the board — a silent full re-ingest
            if not path_exists(self.spark, path):
                out[name] = None
                continue
            try:
                df = self.spark.read.parquet(path)
                out[name] = max_watermark(df, self.version_col)
            except AnalysisException as exc:
                cond = _error_condition(exc)
                if cond in ("PATH_NOT_FOUND", "UNRESOLVED_COLUMN",
                            "FIELD_NOT_FOUND"):
                    # vanished between probe and read / pre-versioned
                    # bootstrap (no version column yet) → not-yet
                    out[name] = None
                elif cond == "UNABLE_TO_INFER_SCHEMA" and not has_data_files(
                    self.spark, path
                ):
                    # a zero-row partitioned write leaves only _SUCCESS
                    # — a legitimately empty sink, not a corrupt one
                    out[name] = None
                else:
                    # UNABLE_TO_INFER_SCHEMA over PRESENT data files
                    # (unreadable-as-parquet), or any other condition:
                    # a corrupt sink must be a decision, not a
                    # swallowed full re-ingest
                    raise
        return out
