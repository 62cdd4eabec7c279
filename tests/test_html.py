"""HTML → visible-text extraction (functions/html.py): planted-page
ground truth, a full DuckDB mirror of the same regex/HOF chain (the
per-constructed-branch discipline), and the curation stage wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_api_postgres_etl_spark.functions.html import (
    BOILER_PAT,
    _BLOCK_SPLIT,
    html_lines,
    html_title,
    html_to_text,
)

PAGE = """<!DOCTYPE html>
<html><head><title>Harbor &amp; Tide — a chronicle</title>
<style>body { color: red; }</style>
<script>var tracking = "<!-- legacy guard -->";</script>
</head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact us</a></nav>
<!-- editorial comment that must vanish -->
<h1>Harbor &amp; Tide</h1>
<p>Every merchant kept a ledger of salt &amp; grain through the season,
and the ships would wait for wind.</p>
<div>The harbormaster read the sky while patient crews mended their
nets beneath the tall white light.</div>
<ul><li>salt</li><li>grain &lt;measured&gt;</li></ul>
<p>Subscribe to our newsletter</p>
<p>&copy; 2024 Harbor Press. All rights reserved.</p>
<footer><a href="/privacy">Privacy policy</a></footer>
</body></html>"""

# what the extractor must keep, in order: title line is inside <head>
# (stripped); nav/footer are link-dense; the two chrome lines are
# short + marker; list items survive as their own lines
EXPECTED_LINES = [
    "Harbor & Tide",
    "Every merchant kept a ledger of salt & grain through the season, "
    "and the ships would wait for wind.",
    "The harbormaster read the sky while patient crews mended their "
    "nets beneath the tall white light.",
    "salt",
    "grain <measured>",
]


def test_html_to_text_planted_ground_truth(spark):
    df = spark.createDataFrame(
        [(1, PAGE), (2, None), (3, "<nav><a href='/'>Home</a></nav>")],
        "id long, html string",
    )
    rows = {
        r["id"]: r["t"]
        for r in df.select("id", html_to_text("html").alias("t")).collect()
    }
    assert rows[1] == "\n".join(EXPECTED_LINES)
    assert rows[2] is None          # NULL html → NULL text
    assert rows[3] == ""            # pure-chrome page → ''

    # title comes from the RAW head, entity-decoded
    got = df.filter(F.col("id") == 1).select(html_title("html")).first()[0]
    assert got == "Harbor & Tide — a chronicle"
    # absent title → ''
    assert (
        df.filter(F.col("id") == 3).select(html_title("html")).first()[0]
        == ""
    )


def test_html_line_stats_link_density(spark):
    """The nav line's anchor words equal its words (density 1); the
    prose line has zero link words."""
    df = spark.createDataFrame([(PAGE,)], "html string")
    lines = [
        x
        for x in df.select(html_lines("html").alias("l")).first()["l"]
        if x["n_words"] > 0
    ]
    nav = next(x for x in lines if x["text"].startswith("Home"))
    assert nav["n_link_words"] == nav["n_words"] == 4
    prose = next(x for x in lines if x["text"].startswith("Every merchant"))
    assert prose["n_link_words"] == 0 and prose["n_words"] == 19


def test_html_guards():
    with pytest.raises(ValueError, match="max_link_density_pct"):
        html_to_text("h", max_link_density_pct=0)
    with pytest.raises(ValueError, match="boiler_max_words"):
        html_to_text("h", boiler_max_words=-1)


def test_html_link_density_100_disables_the_rule(spark):
    """100 means OFF: a fully-linked line (link_words == words) fails
    any strict-< cut, so no other accepted value can keep link
    directories — pct=100 must keep them explicitly."""
    page = ("<p><a href='/a'>alpha beta gamma delta epsilon zeta eta "
            "theta iota kappa lambda mu nu</a></p>")
    df = spark.createDataFrame([(page,)], "html string")
    assert df.select(html_to_text("html")).first()[0] == ""
    kept = df.select(
        html_to_text("html", max_link_density_pct=100)
    ).first()[0]
    assert kept.startswith("alpha beta")


def _mirror_sql(pages_rel: str) -> str:
    """The DuckDB mirror of the exact html_to_text chain — same
    backref-free patterns, same integer link-density arithmetic, same
    entity order (&amp; last); array_to_string(NULL-on-empty) is
    coalesced per the documented DuckDB-vs-concat_ws difference."""
    containers = ["script", "style", "noscript", "svg", "iframe", "head"]
    body = "html"
    for tag in containers:
        body = (
            f"regexp_replace({body}, "
            f"'(?is)<{tag}\\b[^>]*>.*?</{tag}\\s*>', ' ', 'g')"
        )
    body = f"regexp_replace({body}, '(?s)<!--.*?-->', ' ', 'g')"

    def decode(e: str) -> str:
        for ent, ch in [
            ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#34;", '"'),
            ("&apos;", "''"), ("&#39;", "''"), ("&nbsp;", " "),
            ("&amp;", "&"),
        ]:
            e = f"replace({e}, '{ent}', '{ch}')"
        return e

    def norm(e: str) -> str:
        return f"trim(regexp_replace({e}, '\\s+', ' ', 'g'))"

    def striptags(e: str) -> str:
        return f"regexp_replace({e}, '<[^>]*>', ' ', 'g')"

    def nwords(e: str) -> str:
        return (
            f"CASE WHEN {e} = '' THEN 0 "
            f"ELSE len(string_split_regex({e}, '\\s+')) END"
        )

    block = _BLOCK_SPLIT
    link = "coalesce(array_to_string(regexp_extract_all(x, '(?is)<a\\b[^>]*>(.*?)</a\\s*>', 1), ' '), '')"
    return f"""
WITH s AS (SELECT id, {body} AS body FROM {pages_rel}),
l AS (SELECT id, string_split_regex(body, '{block}') AS lines FROM s),
p AS (SELECT id, list_transform(lines, x -> struct_pack(
        t := {norm(decode(striptags('x')))},
        lt := {norm(decode(striptags(link)))})) AS parts FROM l),
c AS (SELECT id, list_transform(parts, q -> struct_pack(
        t := q.t,
        nw := {nwords('q.t')},
        nl := {nwords('q.lt')})) AS parts FROM p)
SELECT id, array_to_string(list_transform(list_filter(parts,
         q -> q.nw > 0 AND q.nl * 100 < 50 * q.nw
              AND NOT (q.nw <= 12 AND regexp_matches(q.t, '{BOILER_PAT}'))),
       q -> q.t), chr(10)) AS text
FROM c
"""


def test_html_to_text_matches_duckdb_mirror(spark, oracle):
    """The full chain is engine-reproducible: DuckDB (RE2) rebuilds
    the identical extracted text from the same patterns — every
    pattern is backref/lookaround-free by design."""
    pages = [
        (1, PAGE),
        (2, "<p>plain prose with no markup beyond this paragraph.</p>"),
        (3, "<div>a &amp;amp; double-encoded ampersand stays once-decoded"
            " here.</div>"),
        (4, "<table><tr><td>alpha beta</td><td>gamma</td></tr></table>"),
        (5, "<p>Read more</p><p>An actual sentence mentioning cookie "
            "recipes at length, well past the short-line chrome "
            "threshold set above.</p>"),
        (6, "text with a bare < sign that eats to the next > then prose "
            "resumes with enough words."),
    ]
    df = spark.createDataFrame(pages, "id long, html string")
    got = sorted(
        (r["id"], r["t"])
        for r in df.select("id", html_to_text("html").alias("t")).collect()
    )
    oracle.execute("CREATE OR REPLACE TABLE __html_pages(id BIGINT, html VARCHAR)")
    oracle.executemany(
        "INSERT INTO __html_pages VALUES (?, ?)", pages
    )
    want = sorted(oracle.execute(_mirror_sql("__html_pages")).fetchall())
    assert [(i, repr(t)) for i, t in got] == [(i, repr(t)) for i, t in want]
    oracle.execute("DROP TABLE __html_pages")


def test_curation_html_stage(spark):
    """html_extract=True strips markup before every downstream stage
    (no '<' survives into chunks); off by default the stage is a no-op
    (the spine-protection rule — raw text passes through untouched)."""
    from dataclasses import replace as dc_replace

    from web_api_postgres_etl_spark.plans.curation import (
        CurationConfig,
        prepare_training_data,
    )

    prose = (
        "every merchant kept a ledger of salt and grain through the "
        "season and the ships would wait for wind while the harbormaster "
        "read the sky and patient crews mended their nets beneath the "
        "tall white light of the morning as gulls carried on above"
    )
    html_doc = (
        "<html><head><script>x=1;</script></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        f"<p>{prose}</p>"
        "<p>Subscribe to our newsletter</p></body></html>"
    )
    prose2 = (
        "the quick brown fox jumps over the lazy dog and that dog would "
        "have to be quick with the pace of every chase through fields of "
        "tall grass while the sun was up and the wind kept low so every "
        "creature could rest in the shade of the old oak near the bend"
    )
    docs = spark.createDataFrame(
        [(1, html_doc), (2, prose2)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("benchmark question about the capital of france and the longest "
          "river of europe with exactly enough words to form distinctive "
          "eight grams",)],
        "text string",
    )
    cfg = CurationConfig(
        html_extract=True, min_gopher_rules=0, chunk_words=64,
        window_tokens=256, num_shards=2,
    )
    out = prepare_training_data(docs, bench, config=cfg).collect()
    assert {r["doc_id"] for r in out} == {1, 2}
    doc1 = " ".join(
        r["chunk_text"] for r in sorted(
            (r for r in out if r["doc_id"] == 1),
            key=lambda r: r["chunk_idx"],
        )
    )
    assert "<" not in doc1 and "Home" not in doc1 and "newsletter" not in doc1
    assert "harbormaster" in doc1

    # default-off: the raw text (markup and all) passes through
    off = prepare_training_data(
        docs, bench, config=dc_replace(cfg, html_extract=False)
    ).collect()
    joined = " ".join(r["chunk_text"] for r in off if r["doc_id"] == 1)
    assert "Home" in joined  # markup text survived — stage really off
