"""T2 — high-watermark manager.

The reference re-derives watermarks from the sink itself each run:
``SELECT MAX("meta.version")`` per production table
(mabna_tables_update.py:69-98), passed between tasks as a dict (XCom).
Self-describing state — no separate store to drift out of sync; we keep
that design: probe the sink parquet footers (cheap: column min/max
stats) and return a plain dict.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..operators.aggregates import max_watermark


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
            if not os.path.exists(path):
                out[name] = None
                continue
            try:
                df = self.spark.read.parquet(path)
                out[name] = max_watermark(df, self.version_col)
            except AnalysisException as exc:
                msg = str(exc)
                if (
                    "PATH_NOT_FOUND" in msg
                    or "UNABLE_TO_INFER_SCHEMA" in msg
                    or "UNRESOLVED_COLUMN" in msg
                    or "FIELD_NOT_FOUND" in msg
                ):
                    out[name] = None
                else:
                    raise
        return out
