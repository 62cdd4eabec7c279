"""Scalar / column-level functions (SURVEY.md §2.6 + north-star text ops).

All functions return Column expressions built from native
``pyspark.sql.functions`` — zero Python UDFs, so every derivation stays
inside whole-stage codegen and survives predicate pushdown. Sole
exception: ``unicode.py`` (NFKC/casefold/accent-strip), where the JVM
has no equivalent — those are Arrow-batched pandas UDFs, the slow path
done right.
"""

from .arrays import first_element_field
from .dates import fa_today, jalali_compact_to_slashed, jalali_reformat
from .math import pct_change, safe_div
from .unicode import fold_case, nfkc_normalize, strip_accents
from .urls import (
    dedup_by_url,
    domain_quota,
    normalize_url,
    url_host,
    url_registrable_domain,
)

__all__ = [
    "dedup_by_url",
    "domain_quota",
    "fa_today",
    "first_element_field",
    "fold_case",
    "jalali_compact_to_slashed",
    "jalali_reformat",
    "nfkc_normalize",
    "normalize_url",
    "pct_change",
    "safe_div",
    "strip_accents",
    "url_host",
    "url_registrable_domain",
]
