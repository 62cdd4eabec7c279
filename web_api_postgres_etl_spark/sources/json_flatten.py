"""S3 — recursive JSON flattener with dotted column names.

The reference flattens nested API JSON with ``pd.json_normalize(data)``
(mabna_tables_create.py:58,110; mabna_tables_update.py:55): nested
objects become flat columns named ``a.b.c``; arrays are left as-is
(the lone array, assets.categories, is extracted separately —
mabna_tables_create.py:113-118 / functions.arrays.first_element_field).

This reproduces that contract on a Spark DataFrame: every StructType
leaf is promoted to a top-level column whose literal name is the dotted
path. Dotted names then require backtick discipline everywhere
(operators.project.qcol).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """Promote all nested struct fields to flat dotted-name columns.

    Arrays are NOT exploded (matches json_normalize, which leaves lists
    embedded); arrays-of-structs stay whole for functions like
    ``first_element_field`` to pick at. One ``select`` — a single
    codegen'd projection regardless of nesting depth.
    """
    out_cols: list[Column] = []
    for field in df.schema.fields:
        _emit(F.col(_q(field.name)), field.name, field.dataType, sep, out_cols)
    return df.select(*out_cols)


def _emit(expr: Column, path: str, dtype: T.DataType, sep: str, out: list[Column]) -> None:
    if isinstance(dtype, T.StructType):
        for field in dtype.fields:
            _emit(expr.getField(field.name), f"{path}{sep}{field.name}", field.dataType, sep, out)
    else:
        out.append(expr.alias(path))


def _q(name: str) -> str:
    return f"`{name}`" if "." in name else name
