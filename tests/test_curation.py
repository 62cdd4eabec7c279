"""Curation operators: Gopher rule gate, benchmark decontamination,
cross-corpus incremental dedup — ground truth on crafted docs plus
DuckDB oracle parity on the testdata documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_api_postgres_etl_spark.functions.text import gopher_flags
from web_api_postgres_etl_spark.operators.dedup import (
    contamination_hits,
    decontaminate,
    dedup_against_corpus,
    minhash_table,
)

GOOD = " ".join(
    "the quick brown fox jumps over the lazy dog and that dog would have "
    "to be quick with the pace of every chase through fields of tall grass "
    "while the sun was up and the wind kept low so that every creature "
    "could rest in the shade of the old oak tree near the river bend".split()
)


def test_gopher_good_doc_keeps(spark):
    df = spark.createDataFrame([(1, GOOD)], "id long, text string")
    row = df.select(gopher_flags("text").alias("g")).collect()[0]["g"]
    assert row["keep"] is True
    assert all(row[k] for k in row.asDict() if k.startswith("r_"))


def test_gopher_rule_failures(spark):
    bullets = "\n".join(f"- item {i} ok" for i in range(20))
    ellipses = "\n".join(f"line {i} trails off..." for i in range(10))
    numbers = " ".join(str(i) for i in range(80))
    cases = [
        (1, "too short", "r_word_count"),
        (2, bullets, "r_bullet_lines"),
        (3, ellipses, "r_ellipsis_lines"),
        (4, numbers, "r_alpha_words"),
        (5, GOOD + " " + "#" * 40, "r_symbol_ratio"),
        (6, None, "r_word_count"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "id long, text string"
    )
    got = {
        r["id"]: r["g"]
        for r in df.select("id", gopher_flags("text").alias("g")).collect()
    }
    for i, _, rule in cases:
        assert got[i][rule] is False, f"doc {i} should fail {rule}"
        assert got[i]["keep"] is False


GOPHER_SQL = """
WITH base AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS words,
    list_filter(regexp_split_to_array(text, '\\n'), l -> trim(l) <> '') AS lines,
    list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(
      lower(text),'[^a-z0-9\\s]',' ','g'),'\\s+',' ','g')),' '), x -> x <> '') AS toks,
    length(text) - length(regexp_replace(text, '#', '', 'g')) AS n_hash,
    len(regexp_extract_all(text, '\\.\\.\\.|…')) AS n_ell
  FROM documents),
m AS (
  SELECT doc_id,
    len(words) AS nw,
    list_sum(list_transform(words, w -> length(w)))
      / CAST(nullif(len(words), 0) AS DOUBLE) AS mean_len,
    (n_hash + n_ell) / CAST(nullif(len(words), 0) AS DOUBLE) AS sym,
    len(list_filter(lines, l -> regexp_matches(trim(l), '^[•\\-\\*]')))
      / CAST(nullif(len(lines), 0) AS DOUBLE) AS bullet,
    len(list_filter(lines, l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
      / CAST(nullif(len(lines), 0) AS DOUBLE) AS ell,
    len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
      / CAST(nullif(len(words), 0) AS DOUBLE) AS alpha,
    len(list_intersect(list_distinct(toks),
        ['the','be','to','of','and','that','have','with'])) AS req
  FROM base)
SELECT doc_id,
  coalesce(nw BETWEEN 50 AND 100000, false) AS r_word_count,
  coalesce(mean_len BETWEEN 3 AND 10, false) AS r_mean_word_len,
  coalesce(sym < 0.1, false) AS r_symbol_ratio,
  coalesce(bullet < 0.9, true) AS r_bullet_lines,
  coalesce(ell < 0.3, true) AS r_ellipsis_lines,
  coalesce(alpha >= 0.8, false) AS r_alpha_words,
  coalesce(req >= 2, false) AS r_required_words
FROM m
"""


def test_gopher_oracle_parity(spark, oracle):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = {
        r["doc_id"]: r["g"].asDict()
        for r in docs.select(
            "doc_id", gopher_flags("text").alias("g")
        ).collect()
    }
    want = {
        r[0]: dict(
            zip(
                [
                    "r_word_count", "r_mean_word_len", "r_symbol_ratio",
                    "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
                    "r_required_words",
                ],
                r[1:],
            )
        )
        for r in oracle.execute(GOPHER_SQL).fetchall()
    }
    assert set(got) == set(want)
    for doc_id, flags in want.items():
        for rule, v in flags.items():
            assert got[doc_id][rule] == v, (doc_id, rule)


# --------------------------------------------------- decontamination
BENCH_SNIPPET = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu"
)  # exactly 13 words → one 13-gram


def _train(spark):
    rows = [
        (1, "completely clean document about spark and parquet with many "
            "ordinary words that never overlap the benchmark at all here"),
        (2, "prefix words then " + BENCH_SNIPPET + " then suffix words"),
        (3, BENCH_SNIPPET),
        (4, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame(
        [(BENCH_SNIPPET,), ("some unrelated benchmark question here",)],
        "text string",
    )


def test_decontaminate_drops_overlapping_docs(spark):
    kept = decontaminate(
        _train(spark), _bench(spark), "doc_id", "text", ngram_n=13
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 4]  # 2 and 3 contain the benchmark 13-gram


def test_contamination_hits_counts(spark):
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_hits(
            _train(spark), _bench(spark), "doc_id", "text", ngram_n=13
        ).collect()
    }
    assert hits == {2: 1, 3: 1}


def test_decontaminate_min_hits_gate(spark):
    kept = decontaminate(
        _train(spark), _bench(spark), "doc_id", "text",
        ngram_n=13, min_hits=2,
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 2, 3, 4]  # nobody reaches 2 distinct gram hits


DECON_SQL_TMPL = """
WITH bt AS (
  SELECT list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(
    lower(text),'[^a-z0-9\\s]',' ','g'),'\\s+',' ','g')),' '), x -> x <> '') AS toks
  FROM documents WHERE doc_id % 10 = 0),
bg AS (
  SELECT DISTINCT unnest(list_transform(
    generate_series(1, greatest(len(toks)-{nm1}, 0)),
    i -> array_to_string(toks[i:i+{nm1}],' '))) AS g
  FROM bt),
tt AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(
    lower(text),'[^a-z0-9\\s]',' ','g'),'\\s+',' ','g')),' '), x -> x <> '') AS toks
  FROM documents WHERE doc_id % 10 <> 0),
tg AS (
  SELECT DISTINCT doc_id, unnest(list_transform(
    generate_series(1, greatest(len(toks)-{nm1}, 0)),
    i -> array_to_string(toks[i:i+{nm1}],' '))) AS g
  FROM tt)
SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (g) ORDER BY doc_id
"""


def test_decontaminate_oracle_parity(spark, oracle):
    """Benchmark = every 10th testdata document; train = the rest.
    The contaminated-id set must match an exact SQL n-gram overlap."""
    n = 5
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 10 == 0).select("text")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    hits = contamination_hits(train, bench, "doc_id", "text", ngram_n=n)
    got = sorted(r["doc_id"] for r in hits.collect())
    want = [
        r[0]
        for r in oracle.execute(DECON_SQL_TMPL.format(nm1=n - 1)).fetchall()
    ]
    assert got == want
    kept = decontaminate(train, bench, "doc_id", "text", ngram_n=n)
    assert kept.count() == train.count() - len(want)


REPORT_SQL_TMPL = """
WITH bt AS (
  SELECT doc_id AS bench_id,
    list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(
    lower(text),'[^a-z0-9\\s]',' ','g'),'\\s+',' ','g')),' '), x -> x <> '') AS toks
  FROM documents WHERE doc_id % 10 = 0),
bg AS (
  SELECT DISTINCT bench_id, unnest(list_transform(
    generate_series(1, greatest(len(toks)-{nm1}, 0)),
    i -> array_to_string(toks[i:i+{nm1}],' '))) AS g
  FROM bt),
tt AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace(
    lower(text),'[^a-z0-9\\s]',' ','g'),'\\s+',' ','g')),' '), x -> x <> '') AS toks
  FROM documents WHERE doc_id % 10 <> 0),
tg AS (
  SELECT DISTINCT doc_id, unnest(list_transform(
    generate_series(1, greatest(len(toks)-{nm1}, 0)),
    i -> array_to_string(toks[i:i+{nm1}],' '))) AS g
  FROM tt)
SELECT tg.doc_id, bg.bench_id, COUNT(*) AS n
FROM tg JOIN bg USING (g)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def test_contamination_report_provenance(spark, oracle):
    """r13: the provenance face — (train_id, bench_id,
    n_shared_ngrams) names WHICH benchmark doc leaked. Planted case:
    doc 2 and 3 each hit ONLY the snippet benchmark row; on real
    testdata the full pair table matches an exact SQL n-gram overlap
    mirror; per-doc totals re-aggregate to contamination_hits; the
    colliding-id-name guard raises."""
    import pytest as pt

    from web_api_postgres_etl_spark.operators.dedup import (
        contamination_report,
    )

    bench = spark.createDataFrame(
        [(100, BENCH_SNIPPET), (200, "some unrelated benchmark question")],
        "bench_id long, text string",
    )
    got = sorted(
        tuple(r)
        for r in contamination_report(
            _train(spark), bench, "doc_id", "text", "bench_id", ngram_n=13
        ).collect()
    )
    assert got == [(2, 100, 1), (3, 100, 1)]
    with pt.raises(ValueError, match="alias one side"):
        contamination_report(
            _train(spark), bench, "doc_id", "text", "doc_id"
        )
    # real-corpus pair-level mirror (benchmark = every 10th doc)
    n = 5
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    bench_rl = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    train_rl = docs.filter(F.col("doc_id") % 10 != 0)
    rep = contamination_report(
        train_rl, bench_rl, "doc_id", "text", "bench_id", ngram_n=n
    )
    got_rl = sorted(tuple(r) for r in rep.collect())
    want_rl = [
        tuple(r)
        for r in oracle.execute(REPORT_SQL_TMPL.format(nm1=n - 1)).fetchall()
    ]
    assert got_rl == want_rl
    # provenance covers exactly the contaminated-doc set, and per-doc
    # pair sums bound the distinct-gram hit counts from above (one
    # train gram hitting TWO bench docs counts once in hits, twice in
    # the pair table — the provenance is strictly finer-grained)
    per_doc = {}
    for tid, _, cnt in got_rl:
        per_doc[tid] = per_doc.get(tid, 0) + cnt
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in contamination_hits(
            train_rl, bench_rl.select("text"), "doc_id", "text", ngram_n=n
        ).collect()
    }
    assert set(hits) == set(per_doc)
    assert all(per_doc[k] >= v for k, v in hits.items())


# ---------------------------------------------- cross-corpus dedup
def test_dedup_against_corpus_drops_exact_dup(spark):
    corpus = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog every day"),
            (101, "spark engines read parquet files with columnar batches"),
        ],
        "doc_id long, text string",
    )
    sigs = minhash_table(corpus, "doc_id", "text", shingle_n=2, num_hashes=8)
    new = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog every day"),
            (2, "an entirely novel document mentioning neither foxes nor "
                "parquet in any recognizable overlapping phrasing"),
        ],
        "doc_id long, text string",
    )
    kept = dedup_against_corpus(
        new, sigs, "doc_id", "text", shingle_n=2, num_hashes=8, bands=4,
        threshold=0.9,
    )
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_dedup_against_corpus_estimator_matches_self_signature(spark):
    """An exact duplicate matches all k minhashes (estimate 1.0) and is
    dropped at ANY threshold; a disjoint doc matches none and survives
    threshold 0+."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    sigs = minhash_table(corpus, "doc_id", "text", shingle_n=2, num_hashes=8)
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),
            (11, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    kept = dedup_against_corpus(
        new, sigs, "doc_id", "text", shingle_n=2, num_hashes=8, bands=4,
        threshold=1.0,
    )
    assert [r["doc_id"] for r in kept.collect()] == [11]


def test_dedup_against_corpus_validates_signature_width(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    sigs = minhash_table(corpus, "doc_id", "text", shingle_n=2, num_hashes=4)
    import pytest

    with pytest.raises(ValueError, match="num_hashes"):
        dedup_against_corpus(
            corpus, sigs, "doc_id", "text", num_hashes=8
        )


# ------------------------------------- flag form + streaming decontam
from web_api_postgres_etl_spark.operators.dedup import (  # noqa: E402
    benchmark_ngram_digests,
    contaminated_flag,
)


def test_contaminated_flag_equals_join_form(spark):
    """The pure-expression face and the join face of decontamination
    agree document-for-document on real data (sf0.001)."""
    n = 5
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 10 == 0).select("text")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    digests = [
        r["__bg"] for r in benchmark_ngram_digests(bench, "text", n).collect()
    ]
    flag_clean = sorted(
        r["doc_id"]
        for r in train.filter(
            ~contaminated_flag("text", digests, ngram_n=n)
        ).collect()
    )
    join_clean = sorted(
        r["doc_id"]
        for r in decontaminate(train, bench, "doc_id", "text", ngram_n=n).collect()
    )
    assert flag_clean == join_clean


def test_decontaminate_output_shares_no_benchmark_gram(spark):
    """Invariant: after the scrub, NO surviving document shares any
    n-gram with the benchmark (recomputed independently)."""
    n = 4
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 10 == 0).select("text")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    kept = decontaminate(train, bench, "doc_id", "text", ngram_n=n)
    digests = [
        r["__bg"] for r in benchmark_ngram_digests(bench, "text", n).collect()
    ]
    offenders = kept.filter(contaminated_flag("text", digests, ngram_n=n))
    assert offenders.count() == 0


def test_streaming_decontamination(spark, tmp_path):
    """contaminated_flag runs unchanged inside Structured Streaming
    (AvailableNow over a parquet source): the streamed survivors equal
    the batch decontaminate of the same input."""
    n = 13
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    train = _train(spark).filter(F.col("text").isNotNull())
    train.write.parquet(src)
    digests = [
        r["__bg"]
        for r in benchmark_ngram_digests(_bench(spark), "text", n).collect()
    ]
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        stream.filter(~contaminated_flag("text", digests, ngram_n=n))
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(
        r["doc_id"] for r in spark.read.parquet(sink).collect()
    )
    batch = sorted(
        r["doc_id"]
        for r in decontaminate(
            train, _bench(spark), "doc_id", "text", ngram_n=n
        ).collect()
    )
    assert streamed == batch == [1]


def test_dedup_against_corpus_oracle_parity(spark, oracle):
    """Incremental dedup vs a full SQL mirror of the minhash-estimate
    plan: corpus = even doc_ids' signatures, new batch = odd doc_ids;
    the surviving id set must match DuckDB exactly."""
    import __spark_entry__ as em

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    sigs = minhash_table(corpus, "doc_id", "text", shingle_n=2, num_hashes=8)
    kept = dedup_against_corpus(
        new, sigs, "doc_id", "text",
        shingle_n=2, num_hashes=8, bands=4, threshold=0.5,
    )
    got = sorted(r["doc_id"] for r in kept.collect())
    sql = f"""
    WITH t AS (SELECT doc_id, {em.TOK.format(col="text")} AS toks FROM documents),
    s AS (SELECT doc_id, {em._shingle_sql("toks", 2)} AS sh FROM t),
    m AS (SELECT doc_id, {em._mh_cols} FROM s WHERE len(sh) > 0),
    corp AS (SELECT * FROM m WHERE doc_id % 2 = 0),
    newm AS (SELECT * FROM m WHERE doc_id % 2 = 1),
    cb AS (SELECT doc_id, unnest([{em._band_keys}]) AS band FROM corp),
    nb AS (SELECT doc_id, unnest([{em._band_keys}]) AS band FROM newm),
    cand AS (SELECT DISTINCT nb.doc_id AS nid, cb.doc_id AS cid
             FROM nb JOIN cb USING (band)),
    est AS (
      SELECT cand.nid,
        ({" + ".join(f"CASE WHEN n.mh_{i} = c.mh_{i} THEN 1 ELSE 0 END" for i in range(8))})
          / 8.0 AS e
      FROM cand JOIN newm n ON n.doc_id = cand.nid
                JOIN corp c ON c.doc_id = cand.cid),
    dups AS (SELECT DISTINCT nid FROM est WHERE e >= 0.5)
    SELECT doc_id FROM documents
    WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT nid FROM dups)
    ORDER BY doc_id
    """
    want = [r[0] for r in oracle.execute(sql).fetchall()]
    assert got == want
    assert len(got) < new.count()  # the corpus DID absorb some near-dups


# ------------------------------------------------ text normalization
def test_clean_text_rules_and_idempotence(spark):
    from web_api_postgres_etl_spark.functions.text import clean_text

    dirty = (
        "hello\x00world\x1f ok here​zw\n"
        "line with trailing   \n\n\n\n\n"
        "after the wall　wide"
    )
    df = spark.createDataFrame([(1, dirty)], "id long, text string")
    once = df.select(clean_text("text").alias("t")).collect()[0]["t"]
    assert "\x00" not in once and "\x1f" not in once
    assert " " not in once and "​" not in once
    assert "helloworld ok here" in once
    assert "zw" in once                      # zero-width removed, joined
    assert "\n\n\n" not in once              # blank wall collapsed
    assert "after the wall wide" in once     # ideographic space → space
    assert "trailing\n" in once or once.endswith("trailing")
    twice = (
        spark.createDataFrame([(1, once)], "id long, text string")
        .select(clean_text("text").alias("t"))
        .collect()[0]["t"]
    )
    assert twice == once                     # idempotent


# ------------------------------------------------ C4 line/page rules
C4_DOCS = [
    (1, "Good sentence number one here.\nshort line\n"
        "Another full sentence that survives the filter!\n"
        "Please enable javascript to view this site properly.\n"
        "Is this a question with enough words?"),
    (2, "function f() {\nThis page looks like source code overall.\n}"),
    (3, "Lorem Ipsum dolor sit amet filler text here.\n"
        "A second real sentence to keep the page long."),
    (4, "Only one surviving sentence lives on this page.\n"
        "tiny\nno punct either"),
    (5, None),
    (6, ""),
]


def test_c4_clean_lines_planted(spark):
    from web_api_postgres_etl_spark.functions.text import c4_clean_lines

    df = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", c4_clean_lines("text").alias("t")).collect()
    }
    # doc 1: keeps the 3 full sentences, drops the short + javascript lines
    assert got[1] == (
        "Good sentence number one here.\n"
        "Another full sentence that survives the filter!\n"
        "Is this a question with enough words?"
    )
    # doc 2: only the prose line ends with '.' and has >= 5 words
    assert got[2] == "This page looks like source code overall."
    assert got[4] == "Only one surviving sentence lives on this page."
    assert got[5] is None            # NULL in, NULL out
    assert got[6] == ""              # empty page -> no lines survive


def test_c4_clean_lines_crlf_and_tabs(spark):
    """Review findings: CRLF pages must not leak \\r into the output
    (or defeat the '$' punctuation anchor), and tab-separated words
    count as words (the docstring promises WHITESPACE words)."""
    from web_api_postgres_etl_spark.functions.text import c4_clean_lines

    crlf = ("Good sentence here with enough words.\r\n"
            "Another good long sentence right here.\r\n")
    tabs = "alpha\tbeta\tgamma\tdelta\tepsilon ends with punctuation."
    df = spark.createDataFrame(
        [(1, crlf), (2, tabs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["t"]
        for r in df.select("doc_id", c4_clean_lines("text").alias("t")).collect()
    }
    assert got[1] == ("Good sentence here with enough words.\n"
                      "Another good long sentence right here.")
    assert "\r" not in got[1]
    assert got[2] == tabs


def test_c4_page_flags_planted(spark):
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.functions.text import c4_page_flags

    df = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    flags = {
        r["doc_id"]: (r["f"]["has_brace"], r["f"]["has_lorem"], r["f"]["too_short"])
        for r in df.select("doc_id", c4_page_flags("text").alias("f")).collect()
    }
    assert flags[1] == (False, False, False)          # the only kept page
    assert flags[2] == (True, False, True)
    assert flags[3] == (False, True, True)
    assert flags[4] == (False, False, True)
    assert flags[5][0] is None or flags[5] == (None, None, None) or flags[5][2] is None
    assert flags[6] == (False, False, True)
    kept = (
        df.select("doc_id", c4_page_flags("text").alias("f"))
        .filter(~F.col("f.has_brace") & ~F.col("f.has_lorem") & ~F.col("f.too_short"))
        .collect()
    )
    assert [r["doc_id"] for r in kept] == [1]


def test_c4_clean_lines_oracle_parity(spark, oracle):
    """The full rule set vs a DuckDB mirror on a planted VALUES table
    (the sf tables are single-line word soup — every line fails the
    terminal-punctuation rule, which the tail of this test pins too)."""
    from web_api_postgres_etl_spark.functions.text import c4_clean_lines

    rows = [(i, t) for i, t in C4_DOCS if t is not None]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["t"])
        for r in df.select("doc_id", c4_clean_lines("text").alias("t")).collect()
    )
    values = ", ".join(
        "(%d, '%s')" % (i, t.replace("'", "''").replace("\n", "' || chr(10) || '"))
        for i, t in rows
    )
    want = sorted(
        tuple(row)
        for row in oracle.execute(f"""
        WITH v(doc_id, text) AS (VALUES {values})
        SELECT doc_id, coalesce(array_to_string(list_filter(
            str_split(text, chr(10)),
            l -> regexp_matches(trim(l), '[.!?”"'']$')
                 AND len(list_filter(regexp_split_to_array(trim(l), '\\s+'),
                                     w -> w <> '')) >= 5
                 AND NOT contains(lower(trim(l)), 'javascript')
        ), chr(10)), '') AS t
        FROM v
        """).fetchall()
    )
    assert got == want
    # degenerate real-table face: word-soup docs have no terminal
    # punctuation, so the cleaner empties every page (and crashes on
    # nothing at sf0.01 scale)
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    emptied = docs.select(c4_clean_lines("text").alias("t"))
    assert emptied.filter(F.col("t") != "").count() == 0


# ------------------------------------------ persisted minhash index
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_index_roundtrip_matches_in_memory(spark, tmp_path):
    from web_api_postgres_etl_spark.operators.dedup import (
        dedup_batch_against_index,
        read_minhash_index,
        write_minhash_index,
    )

    corpus = _docs(
        spark,
        [
            (100, "the quick brown fox jumps over the lazy dog every day"),
            (101, "spark engines read parquet files with columnar batches"),
        ],
    )
    path = str(tmp_path / "mh_index")
    write_minhash_index(corpus, path, "doc_id", "text", shingle_n=2, num_hashes=8)

    sigs, meta = read_minhash_index(spark, path)
    assert meta == {"id_col": "doc_id", "shingle_n": 2, "num_hashes": 8}
    # persisted signatures == freshly computed ones (deterministic family)
    fresh = minhash_table(corpus, "doc_id", "text", shingle_n=2, num_hashes=8)
    assert sorted(map(tuple, sigs.collect())) == sorted(map(tuple, fresh.collect()))

    new = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog every day"),
            (2, "an entirely novel document mentioning neither foxes nor "
                "parquet in any recognizable overlapping phrasing"),
        ],
    )
    kept = dedup_batch_against_index(new, path, "text", bands=4, threshold=0.9)
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_minhash_index_ingest_loop(spark, tmp_path):
    """Two-batch ingest: survivors of batch 1 are appended, so batch 2's
    duplicate OF A BATCH-1 DOC is dropped even though the original
    corpus never contained it."""
    from web_api_postgres_etl_spark.operators.dedup import (
        dedup_batch_against_index,
        minhash_index_append,
        write_minhash_index,
    )

    corpus = _docs(
        spark, [(100, "seed document with some stable wording about engines")]
    )
    path = str(tmp_path / "mh_index")
    write_minhash_index(corpus, path, "doc_id", "text", shingle_n=2, num_hashes=8)

    batch1 = _docs(
        spark,
        [(1, "a fresh batch-one page describing winnowing and shingles")],
    )
    kept1 = dedup_batch_against_index(batch1, path, "text", threshold=0.9)
    assert kept1.count() == 1
    minhash_index_append(kept1, path, "text")

    batch2 = _docs(
        spark,
        [
            (2, "a fresh batch-one page describing winnowing and shingles"),
            (3, "completely unrelated prose concerning citrus cultivation"),
        ],
    )
    kept2 = dedup_batch_against_index(batch2, path, "text", threshold=0.9)
    assert [r["doc_id"] for r in kept2.collect()] == [3]


def test_minhash_index_key_and_meta_validation(spark, tmp_path):
    from web_api_postgres_etl_spark.operators.dedup import (
        dedup_batch_against_index,
        read_minhash_index,
        write_minhash_index,
    )

    corpus = _docs(spark, [(1, "alpha beta gamma delta")])
    path = str(tmp_path / "mh_index")
    write_minhash_index(corpus, path, "doc_id", "text")
    bad = spark.createDataFrame([(1, "x")], "other_id long, text string")
    with pytest.raises(ValueError, match="keys on 'doc_id'"):
        dedup_batch_against_index(bad, path, "text")
    # a second meta row (corrupted sidecar) must fail loudly
    spark.createDataFrame(
        [("doc_id", 9, 9)], "id_col string, shingle_n int, num_hashes int"
    ).write.mode("append").parquet(path + "_meta")
    with pytest.raises(ValueError, match="exactly 1 _meta row"):
        read_minhash_index(spark, path)


def test_minhash_index_within_batch_dedup(spark, tmp_path):
    """Review regression: two near-dups arriving in ONE batch must not
    both enter the index — the min-id one survives; and append with a
    mis-keyed frame fails loudly."""
    from web_api_postgres_etl_spark.operators.dedup import (
        dedup_batch_against_index,
        dedup_within_batch,
        minhash_index_append,
        write_minhash_index,
    )

    corpus = _docs(spark, [(100, "seed corpus page about engines only")])
    path = str(tmp_path / "mh_index")
    write_minhash_index(corpus, path, "doc_id", "text", shingle_n=2, num_hashes=8)

    dup_text = "identical page text repeated across the very same batch"
    batch = _docs(
        spark,
        [
            (5, dup_text),
            (9, dup_text),
            (7, "a genuinely different page concerning orchard irrigation"),
        ],
    )
    kept = dedup_batch_against_index(batch, path, "text", threshold=0.9)
    assert sorted(r["doc_id"] for r in kept.collect()) == [5, 7]
    # opting out restores the index-only comparison
    kept_raw = dedup_batch_against_index(
        batch, path, "text", threshold=0.9, dedup_within=False
    )
    assert kept_raw.count() == 3

    # standalone face keeps the least id of a duplicate chain
    solo = dedup_within_batch(
        batch, "doc_id", "text", shingle_n=2, num_hashes=8, threshold=0.9
    )
    assert sorted(r["doc_id"] for r in solo.collect()) == [5, 7]

    bad = spark.createDataFrame([(1, "x")], "other_id long, text string")
    with pytest.raises(ValueError, match="keys on 'doc_id'"):
        minhash_index_append(bad, path, "text")

    # advice regression: the within-batch signature persist must be
    # releasable by long-lived ingest loops via the pins contract
    from web_api_postgres_etl_spark.plans.curation import release_pins

    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    pins: list = []
    dedup_batch_against_index(
        batch, path, "text", threshold=0.9, pins=pins
    ).collect()
    assert pins  # the persisted sigs frame was handed back
    release_pins(pins)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= before


def test_compression_ratio_signal(spark):
    """Ratio == python zlib exactly; repetitive text scores far higher
    than prose; NULL-total; empty text gives ratio < 1, not a crash."""
    import zlib

    from web_api_postgres_etl_spark.functions.text import compression_ratio

    prose = (
        "the committee reviewed seventeen distinct proposals before "
        "narrowing its focus to two finalists whose budgets differed "
        "substantially in scope and ambition"
    )
    spammy = "buy now " * 40
    rows = [(1, prose), (2, spammy), (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.ratio
        for r in df.select(
            "doc_id", compression_ratio("text").alias("ratio")
        ).collect()
    }

    def model(x):
        raw = x.encode()
        return len(raw) / len(zlib.compress(raw, 6))

    assert got[1] == model(prose)
    assert got[2] == model(spammy)
    assert got[3] is None
    assert got[4] < 1.0
    assert got[2] > 2 * got[1]  # the signal separates spam from prose


def test_expect_schema_full_diff(spark):
    from web_api_postgres_etl_spark.operators.quality import expect_schema

    df = spark.createDataFrame([(1, "x", 0.5)], "id long, name string, v double")
    expect_schema(df, "id long, name string, v double")   # order-insensitive
    expect_schema(df, "v double, id long, name string")
    expect_schema(df, "id long, name string", allow_extra=True)
    with pytest.raises(ValueError) as e:
        expect_schema(df, "id long, name string, v string, missing int")
    msg = str(e.value)
    # ALL drifts reported at once
    assert "type drift on 'v'" in msg
    assert "missing column 'missing'" in msg
    with pytest.raises(ValueError, match="unexpected column 'v'"):
        expect_schema(df, "id long, name string")


def test_population_stability_detects_drift(spark):
    import math

    from web_api_postgres_etl_spark.operators.quality import (
        population_stability,
    )

    ref = spark.range(10000).selectExpr("CAST(id % 1000 AS DOUBLE) AS v")
    same = spark.range(5000).selectExpr("CAST(id % 1000 AS DOUBLE) AS v")
    psi_same, per = population_stability(ref, same, "v", bins=10)
    assert psi_same < 0.01                       # identical distribution
    assert per.count() == 10
    fr = per.agg(F.sum("frac_ref")).first()[0]
    assert fr == pytest.approx(1.0, abs=1e-6)

    shifted = spark.range(5000).selectExpr("CAST(900 + id % 100 AS DOUBLE) AS v")
    psi_shift, per2 = population_stability(ref, shifted, "v", bins=10)
    assert psi_shift > 0.25                      # all mass in the top bin
    # python-model parity of the fold (deterministic driver-side sum)
    rows = per2.collect()
    assert psi_shift == pytest.approx(
        sum(r["psi_term"] for r in rows), abs=1e-12
    )
    # out-of-range current values land in edge bins, never vanish
    outside = spark.createDataFrame([(-5.0,), (2000.0,)], "v double")
    _, per3 = population_stability(ref, outside, "v", bins=4)
    cur = {r["bin"]: r["n_cur"] for r in per3.collect()}
    assert cur[0] == 1 and cur[3] == 1

    with pytest.raises(ValueError, match="bins"):
        population_stability(ref, same, "v", bins=1)
    nulls = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError, match="reference has no"):
        population_stability(nulls, same, "v")
    with pytest.raises(ValueError, match="current batch has no"):
        population_stability(ref, nulls, "v")


def test_expect_schema_review_regressions(spark):
    """Tenth-review: nested nullability ignored, duplicate names
    reported, case-insensitive folding per session default."""
    from web_api_postgres_etl_spark.operators.quality import expect_schema

    # containsNull=false array vs DDL's containsNull=true: NOT drift
    arr = spark.range(1).select(F.array(F.lit("a")).alias("tags"))
    expect_schema(arr, "tags array<string>")
    # duplicate (ambiguous) columns are themselves drift
    a = spark.createDataFrame([(1, 2)], "id long, v long")
    b = spark.createDataFrame([(1, 3)], "id long, w long")
    j = a.join(b, a["id"] == b["id"]).select(a["*"], b["*"])
    with pytest.raises(ValueError, match="duplicate column name 'id'"):
        expect_schema(j, "id long, v long, id long, w long", allow_extra=True)
    # case-insensitive name folding (the session default)
    up = spark.createDataFrame([(1,)], "ID long")
    expect_schema(up, "id long")


def test_population_stability_epsilon_guard_and_int_items(spark):
    from web_api_postgres_etl_spark.operators.quality import (
        population_stability,
    )
    from web_api_postgres_etl_spark.operators.retrieval import (
        frequent_itemsets,
    )

    ref = spark.range(100).selectExpr("CAST(id AS DOUBLE) AS v")
    with pytest.raises(ValueError, match="epsilon"):
        population_stability(ref, ref, "v", epsilon=0.0)

    # non-string transactions keep their element type (NULL fallback
    # typed from the column, never a hardcoded array<string>)
    baskets = spark.createDataFrame(
        [([1, 2],), ([1, 2],), ([2],), (None,)], "items array<int>"
    )
    isets, _ = frequent_itemsets(baskets, "items", min_support=0.5)
    freq = {tuple(sorted(r["items"])): r["freq"] for r in isets.collect()}
    assert freq == {(1,): 2, (2,): 3, (1, 2): 2}
    assert isets.schema["items"].dataType.elementType.simpleString() == "int"


def test_minhash_index_purge_takedown(spark, tmp_path):
    """r14 (the r13 verdict #2): the persisted minhash index's
    takedown face. Before the purge a re-submission of an indexed
    document is dropped as a duplicate; after purging that id the
    index has forgotten it — no ghost dedup against deleted content.
    Only signature files containing the id are rewritten (untouched
    files stay byte-identical), the _meta family sidecar is never
    touched, a re-purge is an idempotent no-op, and a mismatched ids
    frame raises."""
    import os

    from web_api_postgres_etl_spark.operators.dedup import (
        dedup_batch_against_index,
        minhash_index_purge,
        read_minhash_index,
        write_minhash_index,
    )

    def _files(root):
        out = {}
        for dirpath, _dirs, names in os.walk(root):
            for n in names:
                if not n.startswith(("_", ".")):
                    p = os.path.join(dirpath, n)
                    with open(p, "rb") as fh:
                        out[p] = fh.read()
        return out

    corpus = spark.createDataFrame(
        [
            (i, " ".join(f"w{i}x{j} tok{i} filler{j}" for j in range(6)))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mhidx")
    write_minhash_index(corpus, idx, "doc_id", "text")
    meta_before = _files(idx + "_meta")

    resub = spark.createDataFrame(
        [(1000, " ".join(f"w7x{j} tok7 filler{j}" for j in range(6)))],
        "doc_id long, text string",
    )
    # pre-purge: the duplicate of doc 7 is dropped against the index
    assert dedup_batch_against_index(resub, idx, "text").count() == 0

    before = _files(idx)
    stats = minhash_index_purge(
        spark, idx, spark.createDataFrame([(7,)], "doc_id long")
    )
    assert stats["rows_purged"] == 1
    assert stats["files_rewritten"] == len(stats["removed_files"]) >= 1
    after = _files(idx)
    # untouched files keep their exact bytes under their exact paths
    removed_local = {p.replace("file://", "").replace("file:", "") for p in stats["removed_files"]}
    for p, blob in before.items():
        if p not in removed_local:
            assert after.get(p) == blob, f"untouched file changed: {p}"
    # the family sidecar is never touched, and reads identically
    assert _files(idx + "_meta") == meta_before
    sigs, meta = read_minhash_index(spark, idx)
    assert meta["id_col"] == "doc_id"
    assert sigs.filter(F.col("doc_id") == 7).count() == 0
    assert sigs.count() == 39

    # post-purge: the ghost is gone — the re-submission survives
    assert dedup_batch_against_index(resub, idx, "text").count() == 1

    # idempotent re-purge
    stats2 = minhash_index_purge(
        spark, idx, spark.createDataFrame([(7,)], "doc_id long")
    )
    assert stats2 == {
        "rows_purged": 0,
        "files_rewritten": 0,
        "removed_files": [],
        "added_files": [],
    }
    with pytest.raises(ValueError, match="keys on 'doc_id'"):
        minhash_index_purge(
            spark, idx, spark.createDataFrame([(7,)], "other long")
        )
