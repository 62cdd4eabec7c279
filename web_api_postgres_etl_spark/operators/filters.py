"""Filters / predicates (P4 null-drop, P5 range, P6 watermark).

All three compile to simple Catalyst predicates that push down to the
parquet (or JDBC) scan — check ``df.explain("formatted")`` for
``PushedFilters: [IsNotNull(...), GreaterThan(...)]``. At 100 TB these
filters ARE the query: the watermark predicate (P6) is what turns a
full-history scan into a delta scan.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .project import qcol


def drop_required_nulls(df: DataFrame, columns: Iterable[str]) -> DataFrame:
    """P4: drop rows with NULL **or float-NaN** in any required column.

    pandas ``dropna`` (mabna_tables_create.py:147-148) removes NaN;
    Spark ``na.drop`` removes null only — for float/double columns a
    literal NaN would survive. Per SURVEY.md §7.4.3 this drops both, so
    semantics match the reference on JSON-ingested numerics.
    """
    cols = list(columns)
    fields = {f.name: f.dataType for f in df.schema.fields}
    pred: Column | None = None
    for name in cols:
        c = qcol(name)
        cond = c.isNotNull()
        if isinstance(fields.get(name), (T.FloatType, T.DoubleType)):
            cond = cond & ~F.isnan(c)
        pred = cond if pred is None else (pred & cond)
    return df.filter(pred) if pred is not None else df


def in_range(df: DataFrame, column: str, low, high) -> DataFrame:
    """P5: closed-interval range predicate (``BETWEEN``).

    Reference: ``WHERE j_date BETWEEN '1399/01/01' AND '{fa_today}'``
    (mabna_tables_create.py:244) — lexicographic compare on zero-padded
    Jalali strings; Spark string ``between`` preserves that exactly.
    """
    return df.filter(qcol(column).between(low, high))


def newer_than(df: DataFrame, column: str, watermark) -> DataFrame:
    """P6: high-watermark delta predicate ``column > watermark``
    (mabna_tables_update.py:137). On parquet this is the
    pushdown/partition-prune path; the REST source applies the same
    predicate server-side via URL params (sources/rest.py).
    """
    return df.filter(qcol(column) > F.lit(watermark))
