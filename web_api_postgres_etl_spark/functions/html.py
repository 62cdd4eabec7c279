"""HTML → visible-text extraction for web-corpus curation.

The one pipeline stage every web corpus runs BEFORE the C4 line rules
(WARC/crawl HTML → visible text → curation): strip non-content
containers (script/style/head/comments), break the page into lines at
block-level tag boundaries, drop boilerplate lines (link-dense nav
menus, short legal/cookie/share chrome — the jusText/boilerpipe
heuristics at regex granularity), and rebuild the survivors as
newline-joined text that feeds :func:`..functions.text.c4_clean_lines`
directly.

Everything is ONE pure column expression chain — native regexes +
higher-order functions, no UDFs, streaming-safe, codegen'd where Spark
supports it. Per-line work happens inside ``transform`` lambdas whose
bodies read only their own argument (a materialized VALUE — the
documented HOF re-evaluation trap is outer expression subtrees, not
bound lambda variables), and the line array is staged ONCE per derived
level so no regex chain runs twice.

Determinism contract: every pattern is backreference- and
lookaround-free, so Java regex (Spark) and RE2 (DuckDB) agree — the
tests mirror the full chain in DuckDB per constructed branch (the
``url_curation`` discipline). Link density is compared as INTEGER
arithmetic (``2·link_words >= words``), never a float division.

Known seams (regex-level extraction, the C4/CCNet practice — not a
browser): a bare ``<`` in prose followed by a later ``>`` is eaten as
a tag; only the common named entities plus ``&#34;``/``&#39;`` are
decoded (numeric entity decoding needs chr(), not expressible as a
column); malformed nesting (an unclosed ``<script>``) strips to the
next closing tag like every regex extractor.

At 100 TB this is exactly what you want: a narrow map over the raw
HTML column with no shuffle at all — extraction cost scales with
bytes scanned and parallelizes embarrassingly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import _c

# Containers whose CONTENT is never visible text. Stripped whole,
# one non-greedy pass each (no backrefs — RE2 compatibility).
# Script/style first: legacy pages wrap script bodies in "<!--"
# comment guards, and stripping comments first would truncate them.
_CONTAINERS = ["script", "style", "noscript", "svg", "iframe", "head"]

# Block-level tags: both opening and closing forms become line breaks,
# so "<li>a</li><li>b</li>" yields two lines, not "ab".
_BLOCK_TAGS = (
    "br|p|div|li|ul|ol|dl|dt|dd|h[1-6]|tr|td|th|table|thead|tbody|"
    "blockquote|pre|section|article|aside|header|footer|nav|form|"
    "figure|figcaption|hr|title|option|select"
)
_BLOCK_SPLIT = rf"(?i)</?(?:{_BLOCK_TAGS})\b[^>]*/?>"

# Short-line legal/nav/social chrome (boilerpipe's "short + marker"
# heuristic). Applied only to lines of <= boiler_max_words words —
# a sentence in running prose that mentions cookies is not chrome.
BOILER_PAT = (
    r"(?i)(copyright|©|all rights reserved|cookie|privacy policy|"
    r"terms of (use|service)|skip to (main )?content|share (this|on)|"
    r"related (articles|posts|stories)|sign (in|up)|log ?in|"
    r"subscribe|newsletter|advertisement|back to top|read more)"
)

# Named entities decoded after tag stripping; '&amp;' LAST so
# double-encoded text ('&amp;lt;') decodes exactly one level — the
# standard single-pass order.
_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#34;", '"'),
    ("&apos;", "'"), ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def strip_containers(html_col: Column | str) -> Column:
    """Remove script/style/noscript/svg/iframe/head blocks and HTML
    comments — the non-content containers — leaving the body markup."""
    c = _c(html_col)
    for tag in _CONTAINERS:
        c = F.regexp_replace(c, rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>", " ")
    return F.regexp_replace(c, r"(?s)<!--.*?-->", " ")


def decode_entities(text_col: Column | str) -> Column:
    """Decode the common named HTML entities (one level — see module
    docstring for the numeric-entity seam)."""
    c = _c(text_col)
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _strip_tags(c: Column) -> Column:
    # [^>]* already crosses newlines (negated class), no (?s) needed;
    # tags become spaces so "a</td><td>b" cannot fuse into "ab"
    return F.regexp_replace(c, r"<[^>]*>", " ")


def _norm_space(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _n_words(c: Column) -> Column:
    return F.when(c == "", F.lit(0)).otherwise(F.size(F.split(c, r"\s+")))


def html_lines(html_col: Column | str) -> Column:
    """array<struct<text, n_words, n_link_words>> — the page broken at
    block-tag boundaries, each line's visible text plus its word count
    and the word count of its ANCHOR text (text inside ``<a>…</a>``),
    the raw material of the link-density boilerplate signal. Staged in
    two ``transform`` levels so the tag-strip/entity chain runs once
    per line, and the counts read the already-materialized struct."""
    parts = F.transform(
        F.split(strip_containers(html_col), _BLOCK_SPLIT),
        lambda ln: F.struct(
            _norm_space(decode_entities(_strip_tags(ln))).alias("text"),
            _norm_space(
                decode_entities(
                    _strip_tags(
                        F.array_join(
                            F.regexp_extract_all(
                                ln, F.lit(r"(?is)<a\b[^>]*>(.*?)</a\s*>"),
                                F.lit(1),
                            ),
                            " ",
                        )
                    )
                )
            ).alias("link_text"),
        ),
    )
    return F.transform(
        parts,
        lambda p: F.struct(
            p["text"].alias("text"),
            _n_words(p["text"]).alias("n_words"),
            _n_words(p["link_text"]).alias("n_link_words"),
        ),
    )


def html_to_text(
    html_col: Column | str,
    boiler_max_words: int = 12,
    max_link_density_pct: int = 50,
) -> Column:
    """The composed extraction: visible text rebuilt from the lines
    that survive the boilerplate rules —

    - non-empty after tag stripping,
    - anchor-text share below ``max_link_density_pct`` percent
      (integer cross-multiplication, engine-exact: a line where
      ``100·link_words >= pct·words`` is a nav menu); ``100`` disables
      the rule entirely — under a strict ``<`` no accepted value could
      otherwise keep fully-linked lines (link directories, reference
      lists),
    - NOT (short — ``<= boiler_max_words`` words — AND matching the
      legal/cookie/share chrome markers of :data:`BOILER_PAT`).

    NULL in, NULL out; a pure-chrome page becomes ''. Output lines are
    newline-joined, ready for the C4 line rules."""
    if not 0 < max_link_density_pct <= 100:
        raise ValueError(
            "max_link_density_pct must be in (0, 100], got "
            f"{max_link_density_pct}"
        )
    if boiler_max_words < 0:
        raise ValueError(
            f"boiler_max_words must be >= 0, got {boiler_max_words}"
        )
    if max_link_density_pct == 100:
        # rule off: a fully-linked line (link_words == words) fails any
        # strict-< cut, so 100 must mean "keep everything" explicitly
        density_ok = lambda s: F.lit(True)  # noqa: E731
    else:
        density_ok = lambda s: (  # noqa: E731
            s["n_link_words"] * 100
            < F.lit(int(max_link_density_pct)) * s["n_words"]
        )
    kept = F.filter(
        html_lines(html_col),
        lambda s: (s["n_words"] > 0)
        & density_ok(s)
        & ~(
            (s["n_words"] <= F.lit(int(boiler_max_words)))
            & s["text"].rlike(BOILER_PAT)
        ),
    )
    return F.array_join(F.transform(kept, lambda s: s["text"]), "\n")


def html_title(html_col: Column | str) -> Column:
    """The page title (first ``<title>`` content, entity-decoded,
    whitespace-normalized; '' when absent, NULL html → NULL) — taken
    from the RAW html, before :func:`strip_containers` removes the
    head."""
    return _norm_space(
        decode_entities(
            F.regexp_extract(
                _c(html_col), r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1
            )
        )
    )
