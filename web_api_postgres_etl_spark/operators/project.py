"""Projections (P1 explicit list, P2 alias, P3 drop).

Reference sites: pandas ``df[['id','date_time',…]]``
(mabna_tables_create.py:145-146), SQL alias lists
(mabna_tables_create.py:227-234, e.g.
``instruments."stock.company.id" AS "company.id"``), drops
(mabna_tables_create.py:118,247-248; mabna_tables_update.py:250-251).

Dotted column names (flattened JSON — ``meta.version``,
``instrument.id``) are literal names in the contract; ``qcol`` keeps the
backtick discipline in one place (SURVEY.md §7.4.5).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def qcol(name: str) -> Column:
    """Column reference that tolerates dotted literal names.

    ``qcol("meta.version")`` → ```meta.version``` (one flat column), not
    struct-field access. Plain names pass through untouched.
    """
    if "." in name:
        return F.col(f"`{name}`")
    return F.col(name)


def project(df: DataFrame, columns: Iterable[str]) -> DataFrame:
    """P1: keep exactly ``columns`` in the given order."""
    return df.select(*[qcol(c).alias(c) for c in columns])


def project_alias(df: DataFrame, mapping: Mapping[str, str | Column]) -> DataFrame:
    """P2: SELECT-list with renames — ``{out_name: in_name_or_expr}``.

    Mirrors the production SQL alias lists: pass
    ``{"company.id": "stock.company.id", "category": "short_name", ...}``
    or computed Columns as values.
    """
    cols = []
    for out, src in mapping.items():
        c = qcol(src) if isinstance(src, str) else src
        cols.append(c.alias(out))
    return df.select(*cols)


def drop_columns(df: DataFrame, columns: Iterable[str], when: bool = True) -> DataFrame:
    """P3: drop listed columns; ``when=False`` is the conditional-schema
    path (commodity/currency variants keep the columns —
    mabna_tables_update.py:250-251 wraps the drop in a Python ``if``)."""
    if not when:
        return df
    return df.drop(*list(columns))


def qident(name: str) -> str:
    """Backtick-quoted SQL-text identifier (safe for dotted names) —
    the ONE definition, shared by every SQL-string expression kit
    (similarity, joins); sibling of :func:`qcol` for the Column API."""
    return "`" + name.replace("`", "``") + "`"
