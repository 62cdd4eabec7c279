"""Text-analysis column functions (north-star: training-data pipeline).

The reference carries free text (news ``title``/``text`` —
mabna_tables_create.py:173) but never analyzes it; these are the
operations a 100 TB LLM-data pipeline runs over a documents table:
tokenization, quality scoring, language ID, fingerprinting.

All are native Column expressions (codegen'd, no UDFs); every
normalization step is chosen to be reproducible in ANSI SQL so the
DuckDB oracle can verify results bit-for-bit. Sole exception:
``compression_ratio`` at the bottom of this module — zlib has no JVM
expression, so it is an Arrow-batched pandas UDF (same carve-out as
``functions/unicode.py``) and is verified against Python's zlib
directly instead of DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    if isinstance(col, str):
        return F.col(f"`{col}`") if "." in col else F.col(col)
    return col


def normalized_tokens(text_col: Column | str, lowercase: bool = True) -> Column:
    """text → array of normalized word tokens.

    Semantics (unchanged since r1, mirrored by the oracle's TOK chain:
    lower / regexp_replace(…,'g') / regexp_split_to_array): tokens are
    the maximal runs of [a-z0-9] in the lowered text — every other
    character is a separator, boundary empties dropped.

    r14 (guide §1.2 "per-task work"): computed as ONE split on
    `[^a-z0-9]+` + empty-drop instead of the original two full
    regexp_replace passes (strip-to-space, collapse-\\s+) + trim +
    split-on-space. Output-identical by construction — both forms
    split on maximal non-alphanumeric runs and filter the "" that a
    leading/trailing/empty separator run leaves — but one regex pass
    over the text instead of two plus an intermediate string
    materialization. Tokenization sits under text_stats AND the whole
    shingle/minhash dedup family, so this is the per-byte kernel of
    the corpus scans (measured: text_stats full-profile noop pass
    2.44 s → see OPTIMIZATION_r14.md; parity 50/50 green after).
    """
    # Single-round-trip fast path for plain column names (guide §1.2
    # step 2 — driver-side construction latency): one F.expr parse
    # builds the whole filter(split(lower(c))) tree in the JVM instead
    # of ~10 py4j calls. The SQL string is the exact same expression
    # tree the Column form below builds (lambda variable deliberately
    # named `t` to match the Python lambda's signature), so analyzed
    # plans are bit-identical — pinned by tests/test_r14_optimizations.
    # backtick-quoted (r15, ADVICE): isidentifier() admits names Spark
    # SQL rejects unquoted (non-ASCII like 'café'; reserved words under
    # ansi.enforceReservedKeywords) — quoting is purely lexical, same
    # Catalyst tree, and isidentifier() guarantees no backtick in the
    # name, so no escaping is needed
    if isinstance(text_col, str) and text_col.isidentifier():
        inner = f"lower(`{text_col}`)" if lowercase else f"`{text_col}`"
        return F.expr(f"filter(split({inner}, '[^a-z0-9]+'), t -> t != '')")
    c = _c(text_col)
    if lowercase:
        c = F.lower(c)
    toks = F.split(c, r"[^a-z0-9]+")
    return F.filter(toks, lambda t: t != "")


def token_count(text_col: Column | str) -> Column:
    """Whitespace-token count over the normalized token array."""
    return F.size(normalized_tokens(text_col))


def bpe_ish_token_count(text_col: Column | str) -> Column:
    """BPE-ish token estimate: count of regex word/number/punct pieces.

    A deterministic proxy for subword tokenizer counts (≈ GPT-style
    pre-tokenization): sequences of letters, digits, or single
    non-space symbols each count once.
    """
    c = _c(text_col)
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return F.size(pieces)


def char_count(text_col: Column | str) -> Column:
    return F.length(_c(text_col))


def punct_ratio(text_col: Column | str) -> Column:
    """Fraction of characters that are neither alphanumeric nor space.

    NULL on empty text (nullif guard) — matches the oracle exactly.
    """
    c = _c(text_col)
    npunct = F.length(c) - F.length(F.regexp_replace(c, r"[^A-Za-z0-9\s]", ""))
    return npunct / F.nullif(F.length(c), F.lit(0))


STOPWORDS_EN = [
    "the", "of", "and", "a", "to", "in", "is", "that", "it", "was",
    "for", "on", "are", "as", "with", "at", "by", "be", "this", "an",
]
STOPWORDS_DE = [
    "der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit",
    "im", "den", "von", "zu", "des", "auf", "sich",
]
STOPWORDS_FR = [
    "le", "la", "les", "des", "et", "est", "un", "une", "dans", "que",
    "pour", "du", "au", "avec", "sur", "pas",
]
STOPWORDS_ES = [
    "el", "los", "las", "y", "es", "en", "un", "una", "que", "por",
    "con", "para", "del", "se", "su", "no",
]


# --- tokens-based signal forms (r15, guide §1.2 per-task work) -------
# Every quality signal is a pure function of the normalized token array
# (plus, for some, the raw text). The ``*_from_tokens`` forms take that
# array as a Column so a multi-signal profile can bind the tokenizer to
# ONE projected column and feed every signal from the attribute —
# Catalyst's CollapseProject keeps a non-cheap alias referenced more
# than once, and codegen's subexpression elimination then dedupes the
# per-signal array passes. Without this, a 9-signal profile inlines the
# split(lower(text)) subtree ~30× per row (the r14 text_stats plan).
# The text-taking wrappers below delegate with a fresh tokenization, so
# single-signal callers are unchanged expression-for-expression.


def stopword_ratio_from_tokens(
    toks: Column, stopwords: list[str] | None = None
) -> Column:
    """``stopword_ratio`` over an already-tokenized array column."""
    sw = stopwords or STOPWORDS_EN
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return hits / F.nullif(F.size(toks), F.lit(0))


def stopword_ratio(text_col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English) stopwords — a standard
    quality signal; NULL for token-less documents."""
    return stopword_ratio_from_tokens(normalized_tokens(text_col), stopwords)


def quality_score_from_tokens(toks: Column, text_col: Column | str) -> Column:
    """``quality_score`` with the token-dependent terms fed from an
    already-tokenized array column (``text_col`` still supplies the
    character-level punct_ratio term)."""
    n = F.nullif(F.size(toks), F.lit(0))
    mean_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n
    sw = stopword_ratio_from_tokens(toks)
    pr = F.coalesce(punct_ratio(text_col), F.lit(1.0))
    sw_term = F.least(F.coalesce(sw, F.lit(0.0)) / F.lit(0.4), F.lit(1.0))
    pr_term = F.lit(1.0) - F.least(pr / F.lit(0.3), F.lit(1.0))
    len_term = F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(
        F.lit(0.4) * sw_term + F.lit(0.3) * pr_term + F.lit(0.3) * F.coalesce(len_term, F.lit(0.0)),
        6,
    )


def quality_score(text_col: Column | str) -> Column:
    """Composite [0,1] quality heuristic (Gopher/C4-style signals):
    mean-word-length sanity + stopword presence + low punctuation noise.

    score = 0.4·clamp(stopword_ratio/0.4) + 0.3·(1−clamp(punct_ratio/0.3))
          + 0.3·[3 ≤ mean_word_len ≤ 10]
    """
    return quality_score_from_tokens(normalized_tokens(text_col), text_col)


def lang_id_from_tokens(toks: Column) -> Column:
    """``lang_id`` over an already-tokenized array column."""

    def _hits(sw: list[str]):
        # closure (not default-arg) so the lambda keeps 1-arg arity —
        # a 2-param lambda would be bound as (value, index) by Spark
        return F.size(F.filter(toks, lambda t: t.isin(sw)))

    scores = {
        lang: _hits(sw)
        for lang, sw in [
            ("en", STOPWORDS_EN),
            ("de", STOPWORDS_DE),
            ("fr", STOPWORDS_FR),
            ("es", STOPWORDS_ES),
        ]
    }
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reversed so earlier languages win ties via later .when precedence
    expr = (
        F.when((scores["en"] > 0) & (scores["en"] == best), "en")
        .when((scores["de"] > 0) & (scores["de"] == best), "de")
        .when((scores["fr"] > 0) & (scores["fr"] == best), "fr")
        .when((scores["es"] > 0) & (scores["es"] == best), "es")
        .otherwise(out)
    )
    return expr


def lang_id(text_col: Column | str) -> Column:
    """Heuristic language ID over {en,de,fr,es}: argmax of stopword hit
    counts, 'und' (undetermined) when no list scores > 0. Deterministic
    tie-break by fixed language order (en > de > fr > es).
    """
    return lang_id_from_tokens(normalized_tokens(text_col))


def fingerprint_from_tokens(toks: Column) -> Column:
    """``fingerprint`` over an already-tokenized array column."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return F.md5(canon)


def fingerprint(text_col: Column | str) -> Column:
    """Canonical document fingerprint: md5 over the sorted distinct
    normalized token set (the classic 'key collision' fingerprint —
    robust to word order and punctuation)."""
    return fingerprint_from_tokens(normalized_tokens(text_col))


def content_hash(text_col: Column | str) -> Column:
    """Exact content digest (md5 of raw text) — exact-dedup key."""
    return F.md5(_c(text_col))


# Gopher-style rule-based quality gate (Rae et al. 2021, table A1 — the
# public rule set most 100 TB curation pipelines start from). Every rule
# is a pure Column expression over one scan; thresholds are the paper's.
GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _raw_words(text_col: Column | str) -> Column:
    """Whitespace-split words of the RAW text (case/punct preserved) —
    Gopher's rules run over surface words, not normalized tokens."""
    c = _c(text_col)
    return F.filter(F.split(c, r"\s+"), lambda w: w != "")


def gopher_flags(
    text_col: Column | str, tokens: Column | None = None
) -> Column:
    """Struct of the seven Gopher quality-filter rules plus the overall
    ``keep`` verdict (AND of all rules). Each field is a boolean "this
    rule passes" flag so downstream can report WHY a document was
    dropped, not just that it was.

    ``tokens`` optionally supplies an already-tokenized
    ``normalized_tokens`` array (the r_required_words rule's input) so
    a multi-signal profile shares one tokenizer projection.

    Rules (thresholds from the paper):
      r_word_count      50 ≤ #words ≤ 100000
      r_mean_word_len   3 ≤ mean word length ≤ 10
      r_symbol_ratio    (#'#' + #'...') / #words < 0.1
      r_bullet_lines    < 90% of lines start with a bullet (• - *)
      r_ellipsis_lines  < 30% of lines end with ... or …
      r_alpha_words     ≥ 80% of words contain a letter
      r_required_words  ≥ 2 distinct hits in {the,be,to,of,and,that,have,with}

    NULL/empty text fails ``keep`` (word count 0). One scan, no
    shuffle, fully codegen'd; the whole struct is ANSI-SQL mirrorable
    for the DuckDB oracle (tests/test_curation.py pins it).
    """
    c = _c(text_col)
    words = _raw_words(c)
    n_words = F.size(words)
    nw = F.nullif(n_words, F.lit(0)).cast("double")
    mean_len = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / nw
    n_hash = F.length(c) - F.length(F.regexp_replace(c, r"#", ""))
    n_ellipsis = F.size(
        F.regexp_extract_all(c, F.lit(r"\.\.\.|…"), 0)
    )
    symbol_ratio = (n_hash + n_ellipsis) / nw
    lines = F.filter(F.split(c, r"\n"), lambda l: F.trim(l) != "")
    nl = F.nullif(F.size(lines), F.lit(0)).cast("double")
    bullet_frac = (
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[•\-\*]")))
        / nl
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$")))
        / nl
    )
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))) / nw
    )
    toks = tokens if tokens is not None else normalized_tokens(c)
    req_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS]),
        )
    )
    r = {
        "r_word_count": F.coalesce(
            (n_words >= 50) & (n_words <= 100_000), F.lit(False)
        ),
        "r_mean_word_len": F.coalesce(
            (mean_len >= 3) & (mean_len <= 10), F.lit(False)
        ),
        "r_symbol_ratio": F.coalesce(symbol_ratio < 0.1, F.lit(False)),
        # line rules PASS vacuously for single/no-line docs (frac NULL)
        "r_bullet_lines": F.coalesce(bullet_frac < 0.9, F.lit(True)),
        "r_ellipsis_lines": F.coalesce(ellipsis_frac < 0.3, F.lit(True)),
        "r_alpha_words": F.coalesce(alpha_frac >= 0.8, F.lit(False)),
        "r_required_words": F.coalesce(req_hits >= 2, F.lit(False)),
    }
    keep = None
    for flag in r.values():
        keep = flag if keep is None else (keep & flag)
    return F.struct(
        *[v.alias(k) for k, v in r.items()], keep.alias("keep")
    )


# Heuristic PII scrubbing for corpus curation: replaced in the order
# email → IPv4 → phone, because the phone pattern's charset includes
# dots and would otherwise swallow IPs, and emails contain digit runs.
# These are recall-oriented regexes (a scrubber, not a validator):
# some number-dense prose will be over-redacted by design.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def redact_pii(text_col: Column | str) -> Column:
    """Replace emails, IPv4 addresses, and phone-number-shaped digit
    runs with typed placeholder tags — chained ``regexp_replace``
    (JVM-side, codegen; no UDF). Pattern order is load-bearing, see
    ``PII_PATTERNS``."""
    c = _c(text_col)
    for _, pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


# C4-style text normalization: the clean-before-analyze step most web
# corpora need. Chained regexp_replace (JVM, codegen), no UDFs; each
# rule is separable so pipelines can compose a subset.
def strip_control_chars(text_col: Column | str) -> Column:
    """Remove C0/C1 control characters except tab and newline."""
    return F.regexp_replace(
        _c(text_col), r"[\x00-\x08\x0B-\x1F\x7F-\x9F]", ""
    )


def normalize_unicode_spaces(text_col: Column | str) -> Column:
    """Map exotic Unicode spaces (NBSP, thin/zero-width, ideographic)
    to plain spaces, and zero-width characters to nothing."""
    c = F.regexp_replace(
        _c(text_col), "[​‌‍﻿]", ""
    )
    return F.regexp_replace(
        c, "[   -   　]", " "
    )


def collapse_blank_lines(text_col: Column | str, max_blank: int = 1) -> Column:
    """Collapse runs of blank lines to at most ``max_blank`` (C4 keeps
    paragraph structure but drops whitespace walls); also trims
    trailing spaces per line."""
    c = F.regexp_replace(_c(text_col), r"[ \t]+\n", "\n")
    return F.regexp_replace(
        c, r"\n{" + str(max_blank + 2) + r",}", "\n" * (max_blank + 1)
    )


def clean_text(text_col: Column | str) -> Column:
    """The composed normalization: control chars → unicode spaces →
    blank-line collapse → outer trim. Idempotent (cleaning twice equals
    cleaning once — pinned by tests)."""
    return F.trim(
        collapse_blank_lines(
            normalize_unicode_spaces(strip_control_chars(text_col))
        )
    )


def c4_clean_lines(text_col: Column | str, min_words: int = 5) -> Column:
    """C4's LINE-level retention rules (Raffel et al. 2020, §2.2) as
    one pure column expression — keep a line only when it

    - ends in terminal punctuation (period / ! / ? / closing quote),
    - has at least ``min_words`` whitespace words, and
    - does not mention 'javascript' (case-insensitive) — the cookie/
      JS-warning boilerplate line.

    Returns the text rebuilt from the surviving lines (NULL in, NULL
    out; a page of pure boilerplate becomes ''). Narrow map only — no
    shuffle, unlike the corpus-frequency line dedup
    (``operators.dedup.dedup_corpus_lines``), which needs a count
    pass; the two compose (rules first, frequency second). The
    per-line lambda is a cheap fixed-size predicate — the documented
    HOF trap is expensive probes against large literals, not this."""
    # split on every newline convention (CRLF / lone CR / LF) so no
    # stray \r survives into a line — a trailing \r would both defeat
    # the '$' punctuation anchor in RE2-family engines and leak into
    # the rebuilt "clean" text
    lines = F.split(_c(text_col), "\r\n|\r|\n")

    def _keep(line: Column) -> Column:
        t = F.trim(line)
        words = F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))
        return (
            t.rlike('[.!?”"\']$')
            & (F.size(words) >= min_words)
            & ~F.lower(t).contains("javascript")
        )

    return F.array_join(F.filter(lines, _keep), "\n")


def _c4_flags_from_clean(
    text_col: Column | str, cleaned: Column, min_lines: int
) -> Column:
    """Flag struct given an ALREADY-cleaned column — lets a plan that
    also needs the rebuilt text compute :func:`c4_clean_lines` exactly
    once (Catalyst does no common-subexpression elimination across a
    Filter, so handing the same expression to flags and rebuild would
    evaluate the whole line pipeline twice per page)."""
    low = F.lower(_c(text_col))
    n_kept = F.when(
        cleaned.isNull() | (cleaned == ""), F.lit(0)
    ).otherwise(F.size(F.split(cleaned, "\n")))
    return F.struct(
        low.contains("{").alias("has_brace"),
        low.contains("lorem ipsum").alias("has_lorem"),
        (n_kept < min_lines).alias("too_short"),
    )


def c4_page_flags(
    text_col: Column | str, min_lines: int = 3, min_words: int = 5
) -> Column:
    """C4's PAGE-level drop rules as a struct of booleans:
    ``has_brace`` (source-code smell: '{' anywhere), ``has_lorem``
    ('lorem ipsum' placeholder), ``too_short`` (fewer than
    ``min_lines`` lines survive :func:`c4_clean_lines`). A page is
    kept when none are true — the disposition every C4 reproduction
    applies before dedup."""
    return _c4_flags_from_clean(
        text_col, c4_clean_lines(text_col, min_words=min_words), min_lines
    )


# ---------------------------------------------------- zlib signal
def compression_ratio(text_col: Column | str, level: int = 6) -> Column:
    """uncompressed_bytes / zlib_bytes (DOUBLE; NULL for NULL text) —
    the Gopher/FineWeb repetitiveness signal the expression-side
    proxies approximate: boilerplate and template spam compress far
    better than prose (ratio ≳ 4–5 is a strong drop signal; English
    prose sits near 2–3). Complements ``repetition_signals``'s n-gram
    fractions, which see only word-level repeats — zlib also catches
    character-level and long-range structure.

    This is the module's one non-expression function: zlib has no JVM
    expression, so it runs as an Arrow-batched pandas UDF (never
    row-at-a-time). zlib output length for a fixed level is
    deterministic for a given zlib build — fine for gating, but do NOT
    use the ratio as a dedup KEY across heterogeneous clusters; gate
    thresholds tolerate the ±few-bytes variance between zlib versions,
    digests do not. Empty text compresses to a header, giving ratios
    < 1 — gate on high ratios only.
    """
    import zlib

    import pandas as pd
    from pyspark.sql.types import DoubleType

    def _ratio(s):
        def fn(x):
            raw = x.encode("utf-8")
            return len(raw) / len(zlib.compress(raw, level))

        return s.map(fn, na_action="ignore")

    # real class annotations (not this module's PEP-563 strings), so
    # pandas_udf can infer the scalar eval type with pandas imported
    # locally
    _ratio.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_ratio, DoubleType())(_c(text_col))


# ------------------------------------------------- sentence segmentation
# Sentence-ish chunks: a run without terminal punctuation followed by a
# terminal-punctuation run (plus trailing close-quotes/brackets), OR a
# final unterminated run. Backref/lookaround-free on purpose — Java
# regex (Spark) and RE2 (DuckDB) extract the identical chunks, so
# sentence-level dedup digests are engine-reproducible. Newlines are
# ordinary whitespace here (segment AFTER any line-level processing).
SENTENCE_PAT = r"""[^.!?]+[.!?]+["')\]]*|[^.!?]+"""


def split_sentences(text_col: Column | str) -> Column:
    """text → array of trimmed sentences (regex-level segmentation —
    the C4/CCNet granularity for sentence dedup and decontamination
    audits, NOT a trained segmenter: abbreviations like 'Dr.' split, a
    deliberate and documented seam; every consumer here digests or
    counts sentences, where a consistent rule matters more than
    linguistic perfection). Empty/whitespace chunks are dropped; NULL
    in → NULL out; '' → empty array."""
    c = _c(text_col)
    return F.filter(
        F.transform(
            F.regexp_extract_all(c, F.lit(SENTENCE_PAT), F.lit(0)),
            lambda s: F.trim(F.regexp_replace(s, r"\s+", " ")),
        ),
        lambda s: s != "",
    )


def sentence_count(text_col: Column | str) -> Column:
    """Number of sentences (0 for '', NULL for NULL) — a quality
    signal next to token_count."""
    return F.size(split_sentences(text_col))
