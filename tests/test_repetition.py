"""Gopher repetition filters (operators/repetition.py): planted
ground truth for every rule family, a bit-exact DuckDB mirror of the
full 13-signal computation on the real documents table, totality on
NULL/empty docs, and the gate/flags contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from web_api_postgres_etl_spark.operators.repetition import (
    GOPHER_REPETITION_THRESHOLDS,
    gopher_repetition,
    gopher_repetition_flags,
    gopher_repetition_gate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_line_and_paragraph_fractions(spark):
    df = _docs(spark, [
        # 4 lines, "dup" twice: dup_line_frac = (4-3)/4; chars: all=12
        # (dup,dup,one,four->3+3+3+4=13? lines: dup(3),dup(3),one(3),
        # four(4) -> total 13, distinct 10 -> char frac 3/13
        (1, "dup\ndup\none\nfour"),
        # two identical paragraphs separated by a blank line
        (2, "para one\n\npara one"),
        (3, "all lines differ\ncompletely here"),
    ])
    rows = {r["doc_id"]: r for r in gopher_repetition(df, "doc_id", "text").collect()}
    assert rows[1]["dup_line_frac"] == pytest.approx(1 / 4)
    assert rows[1]["dup_line_char_frac"] == pytest.approx(3 / 13)
    assert rows[2]["dup_para_frac"] == pytest.approx(1 / 2)
    assert rows[2]["dup_para_char_frac"] == pytest.approx(0.5)
    assert rows[3]["dup_line_frac"] == 0.0
    # single-paragraph docs: paragraph rules measure 0 (one distinct)
    assert rows[1]["dup_para_frac"] == 0.0


def test_planted_ngram_fractions(spark):
    # "ab ab ab ab" -> 3 bigrams, all "ab ab" (4 wordchars), doc
    # wordchars 8: top_2gram = 3*4/8 = 1.5 (overlaps counted per
    # occurrence, deliberately can exceed 1); 5-grams absent -> NULL
    df = _docs(spark, [
        (1, "ab ab ab ab"),
        (2, "one two three four five six seven eight nine ten"),
    ])
    rows = {r["doc_id"]: r for r in gopher_repetition(df, "doc_id", "text").collect()}
    assert rows[1]["top_2gram_char_frac"] == pytest.approx(3 * 4 / 8)
    assert rows[1]["dup_5gram_char_frac"] is None  # only 4 words
    # all grams unique: top = one gram's mass, dup = 0
    ten = rows[2]
    assert ten["dup_5gram_char_frac"] == 0.0
    assert ten["dup_10gram_char_frac"] == 0.0
    assert 0 < ten["top_2gram_char_frac"] < 0.5


def test_totality_and_collision_guard(spark):
    df = _docs(spark, [(1, None), (2, ""), (3, "   "), (4, "real text here")])
    rows = {r["doc_id"]: r for r in gopher_repetition(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3, 4}  # nothing silently dropped
    assert rows[1]["top_2gram_char_frac"] is None
    assert rows[2]["dup_line_frac"] is None
    flags = {
        r["doc_id"]: r["keep"]
        for r in gopher_repetition_flags(df, "doc_id", "text").collect()
    }
    # NULL signals pass vacuously (word-count floors live in gopher_flags);
    # the 3-word doc has content and FAILS naturally — its one "real
    # text" bigram covers 8/12 of the word mass, far over the 0.20 bar
    # (Gopher pairs these rules with the 50-word floor for a reason)
    assert flags == {1: True, 2: True, 3: True, 4: False}

    bad = spark.createDataFrame([(1, "x", 0.5)], "doc_id long, text string, dup_line_frac double")
    with pytest.raises(ValueError, match="collide"):
        gopher_repetition(bad, "doc_id", "text")
    with pytest.raises(ValueError, match="unknown rules"):
        gopher_repetition_flags(df, "doc_id", "text", {"nope": 0.1})


def test_dotted_column_names_are_first_class(spark):
    """A flat column literally named 'doc.id' (the repo's first-class
    dotted case) must flow through repetition/flags/gate without being
    parsed as struct-field access."""
    spam = " ".join(["buy cheap pills now"] * 30)
    prose = (
        "the committee reviewed seventeen distinct proposals before "
        "narrowing its focus to two finalists whose budgets differed "
        "substantially in scope and ambition across regional programs "
        "researchers later measured thermal conductivity of each alloy "
        "over a wide temperature range then published every dataset "
        "students compared primary sources from municipal archives to "
        "reconstruct the chronology of harbor expansion while engineers "
        "documented bridge inspection findings and proposed maintenance "
        "schedules for aging support cables near the river delta"
    )
    df = spark.createDataFrame([(1, spam), (2, prose)], ["doc.id", "doc.text"])
    fr = gopher_repetition(df, "doc.id", "doc.text")
    assert fr.columns[0] == "doc.id" and fr.count() == 2
    fl = gopher_repetition_flags(df, "doc.id", "doc.text")
    keep = {r["doc.id"]: r["keep"] for r in fl.collect()}
    assert keep[1] is False
    gated = gopher_repetition_gate(df, "doc.id", "doc.text")
    assert gated.columns == ["doc.id", "doc.text"]
    assert [r["doc.id"] for r in gated.collect()] == [2]


def test_gate_drops_planted_boilerplate(spark):
    spam = " ".join(["buy cheap pills now"] * 30)          # massive dup grams
    # long enough (50+ words, all bigrams unique) that no single gram
    # dominates the char mass — the regime the thresholds target
    prose = (
        "the committee reviewed seventeen distinct proposals before "
        "narrowing its focus to two finalists whose budgets differed "
        "substantially in scope and ambition across regional programs "
        "researchers later measured thermal conductivity of each alloy "
        "over a wide temperature range then published every dataset "
        "students compared primary sources from municipal archives to "
        "reconstruct the chronology of harbor expansion while engineers "
        "documented bridge inspection findings and proposed maintenance "
        "schedules for aging support cables near the river delta"
    )
    df = _docs(spark, [(1, spam), (2, prose)])
    kept = sorted(
        r["doc_id"]
        for r in gopher_repetition_gate(df, "doc_id", "text").collect()
    )
    assert kept == [2]
    # loosened thresholds keep both; schema preserved
    loose = gopher_repetition_gate(
        df, "doc_id", "text",
        {k: 10.0 for k in GOPHER_REPETITION_THRESHOLDS},
    )
    assert loose.columns == df.columns and loose.count() == 2


def test_full_mirror_on_documents(spark, oracle):
    """All 13 fractions bit-exact vs a DuckDB mirror at sf0.01 — the
    fractions are single divisions of exact integer masses, so the
    doubles must agree to the bit (repr equality)."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = {
        r["doc_id"]: tuple(
            repr(r[k]) for k in GOPHER_REPETITION_THRESHOLDS
        )
        for r in gopher_repetition(docs, "doc_id", "text").collect()
    }
    tok = ("list_filter(regexp_split_to_array(trim(regexp_replace("
           "regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), "
           "'\\s+', ' ', 'g')), ' '), x -> x <> '')")
    units = lambda sep: (
        f"list_filter(list_transform(regexp_split_to_array(text, '{sep}'),"
        " u -> trim(u)), u -> u <> '')"
    )
    gram_cte = """
g AS (
  SELECT doc_id, n,
         array_to_string(toks[i : i + n - 1], ' ') AS gram,
         (SELECT coalesce(sum(length(w)), 0)
          FROM unnest(toks[i : i + n - 1]) AS t(w)) AS gchars
  FROM t, unnest([2,3,4,5,6,7,8,9,10]) AS ns(n),
       unnest(generate_series(1, greatest(len(toks) - n + 1, 0))) AS u(i)
  WHERE len(toks) >= n),
gc AS (
  SELECT doc_id, n, gram, gchars, count(*) AS cnt
  FROM g GROUP BY ALL),
pdn AS (
  SELECT doc_id, n, max(cnt * gchars) AS top_mass,
         sum(CASE WHEN cnt >= 2 THEN cnt * gchars ELSE 0 END) AS dup_mass
  FROM gc GROUP BY doc_id, n)
"""
    top_cols = ", ".join(
        f"max(CASE WHEN n = {n} THEN top_mass END) AS top_{n}" for n in (2, 3, 4)
    )
    dup_cols = ", ".join(
        f"max(CASE WHEN n = {n} THEN dup_mass END) AS dup_{n}"
        for n in range(5, 11)
    )
    frac_cols = ", ".join(
        [f"top_{n} / wc AS top_{n}gram_char_frac" for n in (2, 3, 4)]
        + [f"dup_{n} / wc AS dup_{n}gram_char_frac" for n in range(5, 11)]
    )
    # single-escape: SQL text '\n' = regex newline; '\\n' would match
    # a literal backslash and silently kill the line/para rules
    lines_expr = units("\\n")
    paras_expr = units("\\n{2,}")
    sql = f"""
WITH t AS (
  SELECT doc_id, {tok} AS toks,
         {lines_expr} AS lines,
         {paras_expr} AS paras
  FROM documents),
{gram_cte},
wide AS (SELECT doc_id, {top_cols}, {dup_cols} FROM pdn GROUP BY doc_id),
base AS (
  SELECT doc_id,
    (len(lines) - len(list_distinct(lines)))
      / CAST(nullif(len(lines), 0) AS DOUBLE) AS dup_line_frac,
    ((SELECT coalesce(sum(length(u)), 0) FROM unnest(lines) AS l(u))
     - (SELECT coalesce(sum(length(u)), 0) FROM unnest(list_distinct(lines)) AS d(u)))
      / CAST(nullif((SELECT coalesce(sum(length(u)), 0) FROM unnest(lines) AS l2(u)), 0) AS DOUBLE)
      AS dup_line_char_frac,
    (len(paras) - len(list_distinct(paras)))
      / CAST(nullif(len(paras), 0) AS DOUBLE) AS dup_para_frac,
    ((SELECT coalesce(sum(length(u)), 0) FROM unnest(paras) AS p(u))
     - (SELECT coalesce(sum(length(u)), 0) FROM unnest(list_distinct(paras)) AS q(u)))
      / CAST(nullif((SELECT coalesce(sum(length(u)), 0) FROM unnest(paras) AS p2(u)), 0) AS DOUBLE)
      AS dup_para_char_frac,
    CAST(nullif((SELECT coalesce(sum(length(w)), 0) FROM unnest(toks) AS tw(w)), 0) AS DOUBLE) AS wc
  FROM t)
SELECT base.doc_id, dup_line_frac, dup_para_frac, dup_line_char_frac,
       dup_para_char_frac, {frac_cols}
FROM base LEFT JOIN wide ON base.doc_id = wide.doc_id
"""
    res = oracle.execute(sql)
    cols = [d[0] for d in res.description]
    want = {}
    for row in res.fetchall():
        d = dict(zip(cols, row))
        want[d["doc_id"]] = tuple(
            repr(d[k]) for k in GOPHER_REPETITION_THRESHOLDS
        )
    assert set(got) == set(want) and len(got) == 500
    mismatch = [k for k in got if got[k] != want[k]]
    assert not mismatch, (mismatch[:3], got[mismatch[0]] if mismatch else None,
                          want[mismatch[0]] if mismatch else None)


def test_contract_cte_handles_multiline_docs(spark, tmp_path):
    """Review regression: the sf corpora contain no newlines, so the
    contract mirror's line/paragraph rules could go dead (a
    double-escaped '\\\\n' matches a literal backslash) without any
    parity test noticing. Pin the generated CTE against the operator
    on PLANTED multi-line documents."""
    import duckdb

    import __spark_entry__ as em

    rows = [
        (1, "dup\ndup\none\nfour"),
        (2, "para one\n\npara one"),
        (3, "spam line\nspam line\nspam line\nspam line"),
        (4, "all different\nlines here\nno repeats at all"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pq = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq}/*.parquet'")
    want = dict(con.execute(
        "WITH " + em._sql_repetition_cte().strip().lstrip(",")
        + " SELECT doc_id, n_repetition_rules FROM rep"
    ).fetchall())
    flags = gopher_repetition_flags(df, "doc_id", "text")
    n = None
    for k in GOPHER_REPETITION_THRESHOLDS:
        t = F.col(f"{k}_ok").cast("int")
        n = t if n is None else (n + t)
    got = {
        r["doc_id"]: r["n"]
        for r in flags.select("doc_id", n.alias("n")).collect()
    }
    assert got == want
    # the line/para rules actually FIRE on the planted dups (dup_line
    # 3/4 > 0.30 and dup_para 1/2 > 0.30): mirrors with dead rules
    # would report all-13 passes here
    assert want[3] < 13 and want[2] < 13
    con.close()


def test_curation_stage_composes(spark):
    """gopher_repetition=True gates inside prepare_training_data
    without disturbing the spine when off."""
    from web_api_postgres_etl_spark.plans.curation import (
        CurationConfig,
        prepare_training_data,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").limit(80)
    bench = spark.createDataFrame([("never matches anything",)], "text string")
    pins: list = []
    # min_gopher_rules=4: the synthetic vocabulary hits only one of the
    # required-English words, so the strict 7/7 QUALITY gate empties the
    # corpus (same setting the training_data_e2e contract entry uses)
    base_cfg = CurationConfig(num_shards=2, min_gopher_rules=4)
    # and the ~30-token vocabulary makes natural dup-gram fractions
    # huge — loosened thresholds make the REPETITION stage selective
    # rather than total on this data
    loose = {k: 0.9 for k in GOPHER_REPETITION_THRESHOLDS}
    on_cfg = CurationConfig(
        num_shards=2, min_gopher_rules=4,
        gopher_repetition=True, repetition_thresholds=loose,
    )
    strict_cfg = CurationConfig(
        num_shards=2, min_gopher_rules=4, gopher_repetition=True
    )
    base = prepare_training_data(docs, bench, config=base_cfg, pins=pins)
    on = prepare_training_data(docs, bench, config=on_cfg, pins=pins)
    strict = prepare_training_data(docs, bench, config=strict_cfg, pins=pins)
    nb, no, ns = base.count(), on.count(), strict.count()
    assert 0 < no <= nb   # the gate can only remove documents
    assert ns <= no       # tighter thresholds remove at least as many
    from web_api_postgres_etl_spark.plans.curation import release_pins

    release_pins(pins)
