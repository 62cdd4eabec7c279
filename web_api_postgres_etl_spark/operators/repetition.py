"""Gopher REPETITION filters (Rae et al. 2021, table A1) — the
within-document repetition rules that complement the quality rules in
``functions.text.gopher_flags``: boilerplate-heavy and
degenerate-generation pages repeat lines, paragraphs, and n-grams far
above natural-prose rates, and dropping them is a standard stage of
every modern LLM data pipeline (Gopher, RefinedWeb, Dolma, RedPajama).

The reference has no text surface; the inventory here follows the
paper's 13 signals, with DELIBERATELY PINNED arithmetic (public
implementations differ in the fiddly details, so these exact semantics
are the contract — deterministic and mirrored term-for-term by the
DuckDB oracles in tests):

- duplicate line / paragraph fraction: occurrences beyond the first
  occurrence of identical content are duplicates —
  ``(n - n_distinct) / n``. Lines split on ``\\n``, paragraphs on
  blank lines (``\\n{2,}``); both trimmed, empties dropped.
- duplicate line / paragraph CHARACTER fraction: characters in those
  surplus occurrences over total kept-content characters —
  ``(Σ len(all) - Σ len(distinct)) / Σ len(all)``.
- top n-gram character fraction (n = 2, 3, 4): characters covered by
  all occurrences of the single most frequent word n-gram, as
  ``count(g*) · wordchars(g*) / wordchars(doc)`` where wordchars sums
  word lengths (separators excluded on both sides of the ratio).
  Ties on count resolve to the lexicographically greatest gram —
  irrelevant to the fraction unless tied grams differ in length, in
  which case max(count·chars) is taken directly (order-free).
- duplicated n-gram character fraction (n = 5 … 10): characters
  covered by all occurrences of every n-gram that occurs more than
  once, ``Σ_{count(g) ≥ 2} count(g) · wordchars(g) / wordchars(doc)``
  (overlaps are counted per occurrence, not deduplicated — the
  unambiguous, engine-mirrorable form of the paper's rule).

Scale shape: the line/paragraph fractions are PURE column expressions
(array HOFs, one scan, no shuffle). The n-gram fractions need
within-document group counts, which a HOF would do quadratically per
document — instead ONE explode into (doc, n, gram) rows with a
map-side-combining count and two small per-(doc, n) aggregates, then a
pivot-shaped join back: shuffles carry grams and integer counts, never
text bodies. All fractions are single divisions of exact integers —
bit-reproducible in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_tokens
from .project import qcol

# thresholds from Rae et al. 2021 (table A1): a document is dropped
# when the fraction EXCEEDS the threshold
GOPHER_REPETITION_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}
TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)


def _units(text: Column, sep: str) -> Column:
    """Trimmed, non-empty content units (lines or paragraphs)."""
    return F.filter(
        F.transform(F.split(text, sep), lambda u: F.trim(u)),
        lambda u: u != "",
    )


def _dup_fracs(units: Column, prefix: str) -> list[Column]:
    """(dup fraction, dup character fraction) for one unit kind —
    pure expressions; NULL when the document has no units (single-line
    docs pass paragraph rules vacuously downstream)."""
    n = F.size(units)
    distinct = F.array_distinct(units)
    nn = F.nullif(n, F.lit(0)).cast("double")
    chars = F.aggregate(units, F.lit(0).cast("long"), lambda a, u: a + F.length(u))
    dchars = F.aggregate(
        distinct, F.lit(0).cast("long"), lambda a, u: a + F.length(u)
    )
    nchars = F.nullif(chars, F.lit(0)).cast("double")
    return [
        ((n - F.size(distinct)) / nn).alias(f"{prefix}_frac"),
        ((chars - dchars) / nchars).alias(f"{prefix}_char_frac"),
    ]


def gopher_repetition(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, the 13 repetition fractions) — one row per input row.

    Enrichment is TOTAL: token-less and NULL documents keep their row
    with NULL fractions (no content to measure; the gate treats NULL
    as vacuous pass, same convention as ``gopher_flags``' line rules).

    Shuffle shape: one explode into (id, n, gram) for the 9 n-gram
    sizes — ~9 gram rows per word, linear in corpus size — counted
    with map-side combine, reduced to ≤ 9 rows per document, joined
    back broadcast-free on the id. The line/paragraph fractions ride
    the original scan as column expressions.
    """
    out_cols = set(GOPHER_REPETITION_THRESHOLDS)
    clash = (out_cols | {"__toks", "__wordchars"}) & set(df.columns)
    if clash:
        raise ValueError(
            f"gopher_repetition: input columns {sorted(clash)} collide "
            "with output/internal columns — rename them first"
        )
    text = qcol(text_col)
    # internal plain alias: every downstream groupBy/pivot/join refers
    # to the id by name, and a dotted id_col (first-class elsewhere in
    # the repo) would parse as struct-field access there — rename once,
    # restore on the way out
    base = df.select(
        qcol(id_col).alias("__id"),
        *_dup_fracs(_units(text, r"\n"), "dup_line"),
        *_dup_fracs(_units(text, r"\n{2,}"), "dup_para"),
        normalized_tokens(text).alias("__toks"),
    ).withColumn(
        "__wordchars",
        F.aggregate(
            F.col("__toks"), F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        ),
    )

    # (id, n, gram, gram wordchars) for every n in one explode: grams
    # as space-joined token slices; char weight excludes separators on
    # both sides of the ratio so the fraction is a pure word-mass ratio
    ns = F.array(*[F.lit(n) for n in TOP_NS + DUP_NS])
    grams = (
        base.select("__id", "__toks")
        .filter(F.size("__toks") > 0)
        .select("__id", "__toks", F.explode(ns).alias("__n"))
        .filter(F.size("__toks") >= F.col("__n"))
        .select(
            "__id",
            "__n",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("__toks") - F.col("__n") + 1),
                    lambda i: F.slice(F.col("__toks"), i, F.col("__n")),
                )
            ).alias("__gram_arr"),
        )
        .select(
            "__id",
            "__n",
            F.concat_ws(" ", "__gram_arr").alias("__gram"),
            F.aggregate(
                F.col("__gram_arr"),
                F.lit(0).cast("long"),
                lambda a, w: a + F.length(w),
            ).alias("__gchars"),
        )
    )
    counted = grams.groupBy("__id", "__n", "__gram", "__gchars").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    per_doc_n = counted.groupBy("__id", "__n").agg(
        F.max(F.col("__cnt") * F.col("__gchars")).alias("__top_mass"),
        F.sum(
            F.when(F.col("__cnt") >= 2, F.col("__cnt") * F.col("__gchars"))
            .otherwise(F.lit(0))
        ).alias("__dup_mass"),
    )
    wide = per_doc_n.groupBy("__id").pivot(
        "__n", list(TOP_NS + DUP_NS)
    ).agg(
        F.first("__top_mass").alias("top"),
        F.first("__dup_mass").alias("dup"),
    )

    wc = F.nullif(F.col("__wordchars"), F.lit(0)).cast("double")
    sel = [F.col("__id").alias(id_col)]
    for k in ("dup_line_frac", "dup_line_char_frac",
              "dup_para_frac", "dup_para_char_frac"):
        sel.append(F.col(k))
    for n in TOP_NS:
        sel.append((F.col(f"{n}_top") / wc).alias(f"top_{n}gram_char_frac"))
    for n in DUP_NS:
        sel.append((F.col(f"{n}_dup") / wc).alias(f"dup_{n}gram_char_frac"))
    return base.join(wide, on="__id", how="left").select(*sel)


def gopher_repetition_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """(id, <rule>_ok … , keep) — one boolean per repetition rule
    (True = passes, i.e. fraction does NOT exceed the threshold) and
    the AND of all of them. A NULL fraction (no lines / no paragraphs
    / doc shorter than n words / empty doc) passes VACUOUSLY — absence
    of content is not repetition; the word-count floor lives in
    ``gopher_flags``, not here."""
    th = dict(GOPHER_REPETITION_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(th)
        if unknown:
            raise ValueError(
                f"gopher_repetition_flags: unknown rules {sorted(unknown)}; "
                f"valid: {sorted(th)}"
            )
        th.update(thresholds)
    fr = gopher_repetition(df, id_col, text_col)
    flags = [
        F.coalesce(F.col(k) <= F.lit(v), F.lit(True)).alias(f"{k}_ok")
        for k, v in th.items()
    ]
    out = fr.select(qcol(id_col).alias(id_col), *flags)
    keep = None
    for k in th:
        c = F.col(f"{k}_ok")
        keep = c if keep is None else (keep & c)
    return out.withColumn("keep", keep)


def gopher_repetition_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Keep documents passing every repetition rule, schema unchanged.
    One semi-join on the id — the flags subplan never carries text."""
    if "__keep_id" in df.columns:
        raise ValueError(
            "gopher_repetition_gate: input column '__keep_id' collides "
            "with the gate's internal join column — rename it first"
        )
    keep = gopher_repetition_flags(df, id_col, text_col, thresholds).filter(
        F.col("keep")
    )
    kept_ids = keep.select(qcol(id_col).alias("__keep_id"))
    return df.join(
        kept_ids, qcol(id_col) == F.col("__keep_id"), "left_semi"
    )
