"""Numeric derivations (F2 — pct-change ratio).

Reference (mabna_tables_create.py:153-154):
``close_price_change_percent = close_price_change / (close_price - close_price_change)``
i.e. change over *previous* close. pandas yields ``inf`` on a zero
denominator; Spark SQL division yields ``null``. Per SURVEY.md §7.4.4
the engine pins the **null** semantics (documented divergence — an inf
would poison any downstream aggregate anyway) and makes it explicit
with ``nullif`` so the oracle SQL can reproduce it verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_div(num: Column, den: Column) -> Column:
    """``num / den`` with NULL (not inf/error) on zero denominators.

    ``nullif(den, 0)`` keeps semantics identical across Spark and ANSI
    SQL engines (DuckDB/Postgres), which matters for oracle parity.
    """
    return num / F.nullif(den, F.lit(0))


def pct_change(change: Column | str, close: Column | str) -> Column:
    """F2: percent change relative to previous close."""
    ch = F.col(change) if isinstance(change, str) else change
    cl = F.col(close) if isinstance(close, str) else close
    return safe_div(ch, cl - ch)
