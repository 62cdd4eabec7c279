"""Winnowing document fingerprints (rolling-hash k-gram selection).

Implements the local fingerprinting algorithm of Schleimer, Wilkerson
& Aiken, "Winnowing: Local Algorithms for Document Fingerprinting"
(SIGMOD 2003): hash every character k-gram of the normalized text,
slide a window of ``window`` consecutive hashes, and keep the minimum
of each window. The guarantee is *local*: any shared substring of
length >= k + window - 1 between two documents yields at least one
shared fingerprint, while the selected set is only ~2/(window+1) of
all k-gram hashes — a density the caller tunes, independent of
document length.

This is the third candidate-generation family next to MinHash-LSH
(set-similarity) and SimHash (vector-similarity): winnowing detects
*contiguous* overlap (quotations, mirrored boilerplate, plagiarized
passages) that set-based sketches dilute on long documents.

Reference surface: none — the reference ETL (mabna_tables_*.py) has
no fingerprinting; this belongs to the north-star training-data
pipeline surface (document fingerprinting via rolling hash).

Scale shape: everything up to the fingerprint table is row-local
column expressions — no shuffle, no Python. The per-document arrays
are O(n_chars) longs and never leave the row; the only shuffled bytes
are the selected (fingerprint, id) pairs (~2n/(w+1) longs per doc).
The pair join is the same banded equi-self-join every LSH candidate
generator here funnels through — linear shuffle, never all-pairs.

Hash portability: gram hash = first 13 hex chars of md5(gram) as a
BIGINT (52 bits — exactly the repo-wide ``_md5_key`` construction,
sampling.py:30), so any engine with md5 reproduces the fingerprint
set bit-for-bit; the DuckDB oracle mirrors it term for term.

Tie-breaking note: classic winnowing breaks min ties by rightmost
*position*; positions only matter for locating matches, not for the
fingerprint SET (equal hashes are equal fingerprints), so this
implementation returns the distinct hash set per document and omits
positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import ensure_parallelism
from .project import qcol

# MOSS-style normalization: case-fold then keep only [a-z0-9], so
# whitespace / punctuation / markup differences never perturb grams.
DEFAULT_STRIP_PATTERN = "[^a-z0-9]"


def _gram_hash(gram) -> F.Column:
    """First 13 hex chars of md5(gram) as BIGINT — the portable 52-bit
    rolling-hash stand-in (same construction as sampling._md5_key)."""
    return F.conv(F.substring(F.md5(gram), 1, 13), 16, 10).cast("long")


def _let(value, body) -> F.Column:
    """Let-binding for column expressions: evaluate ``value`` ONCE and
    hand it to ``body`` as a HOF lambda variable (a materialized
    VALUE, not a re-inlined subtree). Catalyst has no common
    subexpression elimination inside expressions, so referencing a
    subtree N times evaluates it N times — referencing it from inside
    another HOF lambda evaluates it once PER ELEMENT (the repo's
    measured quadratic trap; the unbound form of this file took
    >400 s on 500 docs, the bound form ~2 s)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def winnow_fingerprints(
    text_col: F.Column | str,
    k: int = 8,
    window: int = 4,
    strip_pattern: str = DEFAULT_STRIP_PATTERN,
) -> F.Column:
    """array<bigint> of distinct winnowing fingerprints for one text
    column — pure column expression, usable in streaming plans.

    ``strip_pattern`` is removed (after lowercasing) before gramming;
    pass ``r"\\s"`` to keep non-Latin scripts (the default ASCII fold
    erases them). Texts shorter than ``k`` normalized chars select no
    fingerprints; texts with >= 1 gram but fewer than ``window``
    windows select the global minimum (the standard short-doc rule).

    The window-min pass is an array HOF — interpreted, but O(n_grams
    x window) with window a small constant, row-local, and shuffle
    free; the rows-and-Window alternative would shuffle one row per
    CHARACTER of the corpus. The normalized string and the gram-hash
    array are ``_let``-bound so each stage is evaluated exactly once
    per row — inlining them would re-run the whole gram/md5/regexp
    chain per WINDOW (quadratic; measured >400 s vs ~2 s on 500
    docs).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    c = qcol(text_col) if isinstance(text_col, str) else text_col
    empty = F.array().cast("array<bigint>")

    def _wins_of(h) -> F.Column:
        m = F.size(h)
        return (
            F.when(
                m >= window,
                F.transform(
                    F.sequence(F.lit(1), m - window + 1),
                    lambda i: F.array_min(F.slice(h, i, window)),
                ),
            )
            .when(m > 0, F.array(F.array_min(h)))
            .otherwise(empty)
        )

    def _grams_of(s) -> F.Column:
        n = F.length(s)
        # Guard: Spark sequence(1, stop) DESCENDS when stop < 1 —
        # empty arrays must be explicit (DuckDB generate_series is
        # empty there).
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: _gram_hash(s.substr(i, F.lit(k))),
            ),
        ).otherwise(empty)

    norm = F.regexp_replace(F.lower(c), strip_pattern, "")
    wins = _let(norm, lambda s: _let(_grams_of(s), _wins_of))
    return F.array_distinct(wins)


def winnow_fingerprint_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    strip_pattern: str = DEFAULT_STRIP_PATTERN,
) -> DataFrame:
    """(id, fp) — one row per distinct fingerprint per document.

    Documents selecting no fingerprints (empty/short/NULL text after
    normalization) are absent — they cannot participate in overlap.
    Row-local until the explode; nothing shuffles until the caller
    aggregates.
    """
    src = ensure_parallelism(df).select(
        qcol(id_col).alias("__id"), qcol(text_col).alias("__t")
    )
    fps = src.select(
        "__id",
        winnow_fingerprints("__t", k, window, strip_pattern).alias("__fps"),
    )
    return fps.select(
        F.col("__id").alias(id_col), F.explode("__fps").alias("fp")
    )


def winnow_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_fingerprint_df: int | None = None,
    strip_pattern: str = DEFAULT_STRIP_PATTERN,
    cache_fingerprints: bool = True,
    pins: list[DataFrame] | None = None,
) -> DataFrame:
    """(id_a, id_b, shared) — document pairs sharing >= ``min_shared``
    winnowing fingerprints, id_a < id_b.

    Shape: fingerprint table → (optional) drop fingerprints occurring
    in more than ``max_fingerprint_df`` documents — the stopword /
    boilerplate skew guard: a site-wide footer fingerprint would
    otherwise put its whole domain in one join bucket, the classic
    hot-key blowup — → equi-self-join on fp → count per pair. The
    join shuffles (fp, id) longs only; ``shared`` is exact because
    fingerprints are distinct per document.

    ``cache_fingerprints`` persists the (small) fingerprint table:
    the self-join otherwise recomputes the gram/winnow subtree once
    PER SIDE (no automatic subplan reuse across join branches — the
    repo's measured 2x trap). Pass a ``pins`` list to receive the
    persisted frame and release it (``plans.curation.release_pins``)
    after materializing the result — session hygiene for long-lived
    drivers, same contract as ``near_dup_pairs``.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    fps = winnow_fingerprint_table(
        df, id_col, text_col, k, window, strip_pattern
    )
    if cache_fingerprints:
        fps = fps.persist()
        if pins is not None:
            pins.append(fps)
    if max_fingerprint_df is not None:
        keep = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_fingerprint_df)
            .select("fp")
        )
        fps = fps.join(keep, "fp", "left_semi")
    banded = fps.select(qcol(id_col).alias("__id"), F.col("fp").alias("__band"))
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.__band") == F.col("r.__band"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .groupBy(
            F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b")
        )
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return pairs


def winnow_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    max_fingerprint_df: int | None = None,
    strip_pattern: str = DEFAULT_STRIP_PATTERN,
    cache_fingerprints: bool = True,
    pins: list[DataFrame] | None = None,
) -> DataFrame:
    """Distinct (id_a, id_b) pairs sharing >= 1 fingerprint — the
    candidate face matching the other LSH generators' contract, for
    feeding ``jaccard_on_pairs`` or an exact-overlap verifier.
    Delegates to ``winnow_dup_pairs`` (min_shared=1), inheriting its
    fingerprint persist — the self-join would otherwise recompute the
    dominant gram/winnow pass once per branch."""
    return winnow_dup_pairs(
        df, id_col, text_col, k, window,
        min_shared=1,
        max_fingerprint_df=max_fingerprint_df,
        strip_pattern=strip_pattern,
        cache_fingerprints=cache_fingerprints,
        pins=pins,
    ).select("id_a", "id_b")
