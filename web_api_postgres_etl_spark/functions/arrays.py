"""Array column functions (F3 — first-element extraction).

Reference (mabna_tables_create.py:113-118) loops over
``assets['categories']`` rows appending ``item[1][0]['id']`` to a list
and positionally re-inserts it — a pattern with a known row-misalignment
bug after ``dropna`` (SURVEY.md §7.4.8). The Spark expression is
row-correct by construction and stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def first_element(col: Column | str) -> Column:
    """``array[0]`` (1-based element_at; NULL on empty/NULL arrays)."""
    c = F.col(col) if isinstance(col, str) else col
    # try_element_at: NULL (not error) when the array is empty.
    return F.try_element_at(c, F.lit(1))


def first_element_field(col: Column | str, field: str) -> Column:
    """``array_of_structs[0].field`` — e.g. ``categories[0].id`` → category.id."""
    return first_element(col).getField(field)
