"""Unicode text normalization for multilingual corpora: NFKC/NFC
forms, case folding, accent stripping.

Spark has no Unicode-normalization builtin (``lower`` is not case
folding — e.g. ß vs ss — and nothing exposes NFKC's compatibility
decompositions: ligatures, full-width forms, superscripts). This is
the one text stage where Python is genuinely unavoidable, so it runs
as the documented slow-path done right: Arrow-batched ``pandas_udf``
(vectorized transport, per-batch Python loop over Python's own
``unicodedata`` — the reference implementation of the Unicode
database), never a row-at-a-time Python UDF.

Where it sits in the pipeline: normalize BEFORE any digest-based
dedup or shingling — "ﬁle" vs "file" and full-width vs ASCII digits
otherwise hash apart, silently splitting duplicate clusters.
``functions.text.normalized_tokens`` strips non-ASCII-alnum entirely
(by design, for its latin-centric heuristics); this module is the
multilingual-preserving complement.

Totality: NULL in → NULL out for every function (pandas ``None``
passes through the masks untouched).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def _series_map(s: pd.Series, fn) -> pd.Series:
    # None-preserving map; pandas' map already skips NaN/None under
    # na_action, keeping NULL totality without per-row guards
    return s.map(fn, na_action="ignore")


@F.pandas_udf(StringType())
def _nfkc(s: pd.Series) -> pd.Series:
    return _series_map(s, lambda x: unicodedata.normalize("NFKC", x))


@F.pandas_udf(StringType())
def _nfkc_casefold(s: pd.Series) -> pd.Series:
    # NFKC → casefold → NFKC again: casefolding can re-introduce
    # compatibility characters' expansions in un-normalized order
    # (the Unicode standard's own caveat on fold stability)
    return _series_map(
        s,
        lambda x: unicodedata.normalize(
            "NFKC", unicodedata.normalize("NFKC", x).casefold()
        ),
    )


@F.pandas_udf(StringType())
def _strip_accents(s: pd.Series) -> pd.Series:
    def fn(x: str) -> str:
        decomposed = unicodedata.normalize("NFD", x)
        kept = "".join(
            c for c in decomposed if unicodedata.category(c) != "Mn"
        )
        return unicodedata.normalize("NFC", kept)

    return _series_map(s, fn)


def nfkc_normalize(col) -> Column:
    """NFKC normalization: canonical + compatibility composition
    (ligatures expand, full-width forms narrow, precomposed accents
    compose). The standard pre-dedup normal form."""
    return _nfkc(F.col(col) if isinstance(col, str) else col)


def fold_case(col) -> Column:
    """Full Unicode case folding over NFKC (ß → ss, İ → i̇ …) — the
    correct "case-insensitive equality" key, where ``lower`` is only a
    simple mapping. Output is re-normalized, so folded strings compare
    byte-wise."""
    return _nfkc_casefold(F.col(col) if isinstance(col, str) else col)


def strip_accents(col) -> Column:
    """Remove combining marks (café → cafe, naïve → naive) via
    NFD-decompose → drop Mn → NFC-recompose. Accent-insensitive match
    keys for entity resolution (compose with ``fuzzy_join``)."""
    return _strip_accents(F.col(col) if isinstance(col, str) else col)
