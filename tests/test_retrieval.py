"""BM25 retrieval: hand-computed ground truth, a DuckDB oracle on the
testdata documents table, and ranking sanity properties."""

from __future__ import annotations

import math

import pytest

from web_api_postgres_etl_spark.operators.retrieval import (
    bm25_topk,
    doc_frequencies,
    term_counts,
)

DOCS = [
    (1, "spark reads parquet files and spark writes parquet files"),
    (2, "spark is a distributed engine"),
    (3, "ducks swim in the pond"),
    (4, "parquet is a columnar format"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_term_counts_and_df(spark):
    tc = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in term_counts(_docs(spark), "doc_id", "text").collect()
    }
    assert tc[(1, "spark")] == 2
    assert tc[(1, "parquet")] == 2
    assert tc[(2, "spark")] == 1
    dfs = {
        r["term"]: r["df"]
        for r in doc_frequencies(
            _docs(spark), "doc_id", "text", ["spark", "parquet", "pond"]
        ).collect()
    }
    assert dfs == {"spark": 2, "parquet": 2, "pond": 1}


def test_bm25_hand_computed(spark):
    """Single-term query against doc 3: exactly one scoring term, so
    the score is checkable by hand."""
    out = bm25_topk(_docs(spark), "pond", k=3)
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [3]
    n, df_t, tf, k1, b = 4, 1, 1, 1.2, 0.75
    dls = [9, 5, 5, 5]
    avgdl = sum(dls) / 4
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    want = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * 5 / avgdl))
    assert rows[0]["score"] == pytest.approx(want, abs=1e-6)


def test_bm25_ranking_sanity(spark):
    """Docs matching more query terms with higher tf rank first; docs
    with zero query terms are absent."""
    out = bm25_topk(_docs(spark), "spark parquet", k=10)
    ids = [r["doc_id"] for r in out.collect()]
    assert ids[0] == 1            # tf(spark)=2 + tf(parquet)=2
    assert set(ids) == {1, 2, 4}  # doc 3 shares no term


def test_bm25_oracle_parity(spark, oracle):
    """Full BM25 against a self-contained DuckDB implementation on the
    sf0.01 documents table (scores to 1e-6, same tiebreak)."""
    query = "spark window merge"
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(
            spark.read.parquet("/root/testdata/sf0.01/documents.parquet"),
            query, k=20,
        ).collect()
    ]
    want = oracle.execute(
        """
        WITH t AS (
          SELECT doc_id, list_filter(regexp_split_to_array(trim(regexp_replace(
            regexp_replace(lower(text),'[^a-z0-9\\s]',' ','g'),'\\s+',' ','g')),
            ' '), x -> x <> '') AS toks
          FROM documents),
        stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM t),
        q(term) AS (VALUES ('spark'), ('window'), ('merge')),
        tf AS (
          SELECT doc_id, unnest(toks) AS term FROM t),
        tfq AS (
          SELECT doc_id, term, count(*) AS tf FROM tf
          WHERE term IN (SELECT term FROM q) GROUP BY 1, 2),
        dfs AS (
          SELECT term, count(DISTINCT doc_id) AS df FROM tf
          WHERE term IN (SELECT term FROM q) GROUP BY 1),
        dl AS (SELECT doc_id, len(toks) AS dl FROM t),
        scored AS (
          SELECT tfq.doc_id,
            ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * (tfq.tf * 2.2)
              / (tfq.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS s
          FROM tfq JOIN dfs USING (term) JOIN dl USING (doc_id), stats)
        SELECT doc_id, round(sum(s), 6) AS score FROM scored
        GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20
        """
    ).fetchall()
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gid, gs), (wid, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-5), (gid, gs, ws)


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError, match="no tokens"):
        bm25_topk(_docs(spark), "!!!")


def test_tfidf_table_values_and_min_df(spark):
    import math

    from web_api_postgres_etl_spark.operators.retrieval import tfidf_table

    out = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], r["tfidf"])
        for r in tfidf_table(_docs(spark), "doc_id", "text").collect()
    }
    n = 4
    tf, dfc = out[(1, "spark")][0], out[(1, "spark")][1]
    assert (tf, dfc) == (2, 2)
    want = round(tf * (math.log((1 + n) / (1 + dfc)) + 1), 6)
    assert out[(1, "spark")][2] == pytest.approx(want, abs=1e-6)
    # min_df=2 drops terms appearing in fewer than 2 docs
    kept_terms = {
        r["term"]
        for r in tfidf_table(
            _docs(spark), "doc_id", "text", min_df=2
        ).collect()
    }
    assert "pond" not in kept_terms and "spark" in kept_terms


def test_unigram_perplexity_hand_computed(spark):
    """Two-doc corpus, self-scored: logp values checkable by hand."""
    import math as m

    import pytest as pt

    from web_api_postgres_etl_spark.operators.retrieval import (
        unigram_perplexity,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"], r["ppl"])
        for r in unigram_perplexity(docs, "doc_id", "text").collect()
    }
    # counts: a=3, b=1, c=1; N=5, V=3, alpha=0.5 → denom = 5 + 0.5*4 = 7
    lp = {t: m.log((c + 0.5) / 7.0) for t, c in {"a": 3, "b": 1, "c": 1}.items()}
    ce1 = -(lp["a"] + lp["a"] + lp["b"]) / 3
    ce2 = -(lp["a"] + lp["c"]) / 2
    assert out[1][0] == 3 and out[2][0] == 2
    assert out[1][1] == pt.approx(round(ce1, 6), abs=2e-6)
    assert out[2][1] == pt.approx(round(ce2, 6), abs=2e-6)
    assert out[1][2] == pt.approx(round(m.exp(ce1), 4), abs=2e-4)


def test_unigram_perplexity_reference_model_and_oov(spark):
    """Scored against a SEPARATE reference corpus: in-vocabulary prose
    scores lower (better) than out-of-vocabulary junk; token-less docs
    get NULL scores."""
    from web_api_postgres_etl_spark.operators.retrieval import (
        unigram_perplexity,
    )

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),       # fully in-vocab
            (2, "zxqv wknd pltf grmb"),       # fully OOV
            (3, "!!! ???"),                   # no tokens at all
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"])
        for r in unigram_perplexity(docs, "doc_id", "text", model_df=ref).collect()
    }
    assert out[1][1] < out[2][1]
    assert out[3] == (0, None)


def test_unigram_perplexity_oracle_parity(spark, oracle):
    """Self-scored corpus vs a DuckDB mirror of the smoothed model +
    per-doc average (scores to 1e-6 after rounding)."""
    import pytest as pt

    from web_api_postgres_etl_spark.operators.retrieval import (
        unigram_perplexity,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"])
        for r in unigram_perplexity(docs, "doc_id", "text").collect()
    }
    want = {
        row[0]: (row[1], row[2])
        for row in oracle.execute(
            """
            WITH t AS (
              SELECT doc_id, list_filter(regexp_split_to_array(trim(
                regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' '),
                x -> x <> '') AS toks
              FROM documents),
            tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
            tc AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
            tot AS (SELECT sum(c) AS n, count(*) AS v FROM tc),
            model AS (
              SELECT term, ln((c + 0.5) / (n + 0.5 * (v + 1))) AS lp
              FROM tc, tot),
            scored AS (
              SELECT tok.doc_id, count(*) AS n_tokens,
                     avg(-model.lp) AS ce
              FROM tok JOIN model USING (term) GROUP BY tok.doc_id)
            SELECT t.doc_id,
                   CAST(coalesce(scored.n_tokens, 0) AS INT) AS n_tokens,
                   round(scored.ce, 6) AS cross_entropy
            FROM t LEFT JOIN scored USING (doc_id)
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for d in got:
        assert got[d][0] == want[d][0], d
        if got[d][1] is None:
            assert want[d][1] is None, d
        else:
            assert got[d][1] == pt.approx(want[d][1], abs=2e-6), d


def test_unigram_perplexity_empty_model_is_total(spark):
    """An empty (or token-less) model corpus yields NULL scores for
    every document instead of raising — a threshold gate then drops
    all rows, the graceful-empty behavior scheduled pipelines need."""
    from web_api_postgres_etl_spark.operators.retrieval import (
        unigram_perplexity,
    )

    docs = spark.createDataFrame(
        [(1, "some words here"), (2, None)], "doc_id long, text string"
    )
    empty_ref = spark.createDataFrame([], "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"], r["ppl"])
        for r in unigram_perplexity(
            docs, "doc_id", "text", model_df=empty_ref
        ).collect()
    }
    assert out[1] == (3, None, None)
    assert out[2] == (0, None, None)


def test_bigram_perplexity_hand_computed(spark):
    """Stupid backoff on a tiny planted corpus, checked against a
    by-hand model: doc 1 = 'a b a b', doc 2 = 'b c'.
    Unigram counts: a=2 b=3 c=1 (N=6, V=3); bigrams: (a,b)=2,
    (b,a)=1, (b,c)=1."""
    import math

    import pytest as pt

    from web_api_postgres_etl_spark.operators.retrieval import (
        bigram_perplexity,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b c"), (3, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"])
        for r in bigram_perplexity(docs, "doc_id", "text", alpha=0.5).collect()
    }
    N, V, a = 6, 3, 0.5
    den = N + a * (V + 1)
    u = {"a": math.log((2 + a) / den), "b": math.log((3 + a) / den),
         "c": math.log((1 + a) / den)}
    # doc 1: pos0 'a' → uni(a); 'b'|a → ln(2/2); 'a'|b → ln(1/3);
    #        'b'|a → ln(2/2)
    ce1 = -(u["a"] + math.log(2 / 2) + math.log(1 / 3) + math.log(2 / 2)) / 4
    # doc 2: pos0 'b' → uni(b); 'c'|b → ln(1/3)
    ce2 = -(u["b"] + math.log(1 / 3)) / 2
    assert out[1][0] == 4 and out[1][1] == pt.approx(ce1, abs=2e-6)
    assert out[2][0] == 2 and out[2][1] == pt.approx(ce2, abs=2e-6)
    assert out[3] == (0, None)


def test_bigram_backoff_penalizes_unseen_pairs(spark):
    """Two docs with identical unigram distributions: the one whose
    bigrams match the model corpus scores LOWER than the shuffled
    one (the signal the unigram gate cannot see)."""
    from web_api_postgres_etl_spark.operators.retrieval import (
        bigram_perplexity,
        unigram_perplexity,
    )

    model = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
        "doc_id long, text string",
    )
    probe = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "dog the over quick lazy brown the jumps fox")],
        "doc_id long, text string",
    )
    bg = {r["doc_id"]: r["cross_entropy"]
          for r in bigram_perplexity(
              probe, "doc_id", "text", model_df=model).collect()}
    un = {r["doc_id"]: r["cross_entropy"]
          for r in unigram_perplexity(
              probe, "doc_id", "text", model_df=model).collect()}
    assert bg[1] < bg[2]              # bigram model separates them
    assert un[1] == un[2]             # unigram model cannot


def test_bigram_perplexity_oracle_parity(spark, oracle):
    """Full construction vs DuckDB at sf0.01 (self-scored)."""
    import pytest as pt

    from web_api_postgres_etl_spark.operators.retrieval import (
        bigram_perplexity,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"])
        for r in bigram_perplexity(docs, "doc_id", "text").collect()
    }
    want = {
        row[0]: (row[1], row[2])
        for row in oracle.execute(
            """
            WITH t AS (
              SELECT doc_id, list_filter(regexp_split_to_array(trim(
                regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' '),
                x -> x <> '') AS toks
              FROM documents),
            tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
            tc AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
            tot AS (SELECT sum(c) AS n, count(*) AS v FROM tc),
            uni AS (
              SELECT term, ln((c + 0.5) / (n + 0.5 * (v + 1))) AS lp
              FROM tc, tot),
            bg AS (
              SELECT w1, w2, count(*) AS bc FROM (
                SELECT toks[i - 1] AS w1, toks[i] AS w2
                FROM t, unnest(generate_series(2, len(toks))) AS u(i))
              GROUP BY w1, w2),
            pos AS (
              SELECT doc_id, i - 1 AS p, toks[i] AS cur,
                     CASE WHEN i > 1 THEN toks[i - 1] END AS prev
              FROM t, unnest(generate_series(1, len(toks))) AS u(i)),
            lp AS (
              SELECT pos.doc_id,
                CASE
                  WHEN bg.bc IS NOT NULL THEN ln(bg.bc / pc.c)
                  WHEN pos.p = 0 THEN coalesce(uni.lp,
                    (SELECT ln(0.5 / (n + 0.5 * (v + 1))) FROM tot))
                  ELSE ln(0.4) + coalesce(uni.lp,
                    (SELECT ln(0.5 / (n + 0.5 * (v + 1))) FROM tot))
                END AS lp
              FROM pos
              LEFT JOIN bg ON pos.prev = bg.w1 AND pos.cur = bg.w2
              LEFT JOIN tc pc ON pos.prev = pc.term
              LEFT JOIN uni ON pos.cur = uni.term),
            scored AS (
              SELECT doc_id, count(*) AS n_tokens, avg(-lp) AS ce
              FROM lp GROUP BY doc_id)
            SELECT t.doc_id,
                   CAST(coalesce(scored.n_tokens, 0) AS INT) AS n_tokens,
                   round(scored.ce, 6) AS cross_entropy
            FROM t LEFT JOIN scored USING (doc_id)
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for d in got:
        assert got[d][0] == want[d][0], d
        if got[d][1] is None:
            assert want[d][1] is None, d
        else:
            assert got[d][1] == pt.approx(want[d][1], abs=2e-6), d


def test_lm_model_tables_score_identically(spark, tmp_path):
    """Scoring from prebuilt (persisted) model tables equals scoring
    from the reference corpus directly — the train-once /
    score-everywhere seam for both LM gates, parquet roundtrip
    included."""
    from web_api_postgres_etl_spark.operators.retrieval import (
        bigram_perplexity,
        build_bigram_model,
        build_unigram_model,
        unigram_perplexity,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    ref = docs.filter(docs.doc_id % 2 == 0)       # reference corpus
    target = docs.filter(docs.doc_id % 2 == 1)    # corpus to score

    upath = str(tmp_path / "uni")
    build_unigram_model(ref, "text").write.parquet(upath)
    from_table = unigram_perplexity(
        target, "doc_id", "text",
        model_counts=spark.read.parquet(upath),
    ).collect()
    from_corpus = unigram_perplexity(
        target, "doc_id", "text", model_df=ref
    ).collect()
    assert sorted(map(tuple, from_table)) == sorted(map(tuple, from_corpus))

    uni, bg = build_bigram_model(ref, "text")
    bpath = str(tmp_path / "bg")
    bg.write.parquet(bpath)
    b_table = bigram_perplexity(
        target, "doc_id", "text",
        model_counts=spark.read.parquet(upath),
        bigram_counts=spark.read.parquet(bpath),
    ).collect()
    b_corpus = bigram_perplexity(
        target, "doc_id", "text", model_df=ref
    ).collect()
    assert sorted(map(tuple, b_table)) == sorted(map(tuple, b_corpus))


def test_lm_model_table_param_validation(spark):
    from web_api_postgres_etl_spark.operators.retrieval import (
        bigram_perplexity,
        unigram_perplexity,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    tbl = spark.createDataFrame([("a", 1)], "term string, count long")
    with pytest.raises(ValueError, match="not both"):
        unigram_perplexity(docs, model_df=docs, model_counts=tbl)
    with pytest.raises(ValueError, match="pair"):
        bigram_perplexity(docs, model_counts=tbl)


# ------------------------------------------------------- collocations
def test_collocations_ground_truth(spark):
    from web_api_postgres_etl_spark.operators.retrieval import collocations

    # "new york" ×3 is a collocation; "the cat"/"the dog" dilute "the";
    # doc boundaries must NOT create cross-doc bigrams
    docs = spark.createDataFrame(
        [
            (1, "new york is big and new york is loud"),
            (2, "the cat saw the dog in new york"),
            (3, "york new"),  # reversed order is a DIFFERENT bigram
        ],
        "doc_id long, text string",
    )
    got = collocations(docs, "text", min_count=2, top_k=5).collect()
    ny = [r for r in got if (r.w1, r.w2) == ("new", "york")]
    assert len(ny) == 1 and ny[0].n_pair == 3
    # counts: 'new' appears 4x (3 in "new york" + 1 in "york new"),
    # 'york' 4x; T1 = 9 + 8 + 2 = 19 unigrams, T2 = 8 + 7 + 1 = 16
    assert (ny[0].n_w1, ny[0].n_w2) == (4, 4)
    assert ny[0].lift == (3 / 16) / ((4 / 19) * (4 / 19))
    # reversed pair occurs once only -> filtered by min_count=2
    assert not [r for r in got if (r.w1, r.w2) == ("york", "new")]
    # lift ordering is descending
    lifts = [r.lift for r in got]
    assert lifts == sorted(lifts, reverse=True)


SQL_COLLOC = """
WITH t AS (
  SELECT list_filter(regexp_split_to_array(trim(regexp_replace(
    regexp_replace(lower(text),'[^a-z0-9\\s]',' ','g'),'\\s+',' ','g')),
    ' '), x -> x <> '') AS toks
  FROM documents),
totals AS (
  SELECT CAST(sum(len(toks)) AS DOUBLE) AS t1,
         CAST(sum(greatest(len(toks) - 1, 0)) AS DOUBLE) AS t2
  FROM t),
uni AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
big AS (
  SELECT toks[i] AS w1, toks[i+1] AS w2, count(*) AS n_pair
  FROM t, unnest(range(1, greatest(len(toks), 1))) AS r(i)
  GROUP BY 1, 2
  HAVING count(*) >= {mc})
SELECT w1, w2, n_pair, u1.c AS n_w1, u2.c AS n_w2,
       (n_pair / t2) / ((u1.c / t1) * (u2.c / t1)) AS lift
FROM big
JOIN uni u1 ON u1.w = w1
JOIN uni u2 ON u2.w = w2
CROSS JOIN totals
ORDER BY lift DESC, w1, w2
LIMIT {k}
"""


def test_collocations_oracle_parity(spark, oracle):
    from web_api_postgres_etl_spark.operators.retrieval import collocations

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = [
        (r.w1, r.w2, r.n_pair, r.n_w1, r.n_w2, r.lift)
        for r in collocations(docs, "text", min_count=5, top_k=50).collect()
    ]
    want = [
        tuple(r)
        for r in oracle.execute(SQL_COLLOC.format(mc=5, k=50)).fetchall()
    ]
    # exact: counts, bit-identical lift (pinned IEEE op order), AND order
    assert got == want
    assert len(got) == 50


# ---------------------------------------------- sparse cosine pairs
def test_tfidf_cosine_identical_docs_score_one(spark):
    from web_api_postgres_etl_spark.operators.retrieval import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "totally unrelated words here"),
            (4, "alpha beta something else"),
        ],
        "doc_id long, text string",
    )
    pins: list = []
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(
            docs, "doc_id", "text", min_df=1, threshold=0.0, pins=pins
        ).collect()
    }
    # DECIMAL-exact dot == norm product for identical docs: exactly 1.0
    assert got[(1, 2)] == 1.0
    # doc 3 shares no term with anyone -> absent from every pair
    assert not any(3 in p for p in got)
    # overlap pairs exist and score strictly between 0 and 1
    assert 0.0 < got[(1, 4)] < 1.0 and got[(1, 4)] == got[(2, 4)]
    # the internal weight pin is exposed for release (pins contract)
    assert len(pins) == 1
    for p in pins:
        p.unpersist()


def test_tfidf_cosine_threshold_one_extracts_exact_dups(spark):
    """Review regression: threshold=1.0 must keep identical vectors.
    The float path alone would lose them whenever fl(sqrt(x)·sqrt(x))
    != x — here many large random-ish docs make norm round-trips
    overwhelmingly unlikely, so this passes ONLY via the DECIMAL
    Cauchy–Schwarz equality case."""
    import hashlib

    from web_api_postgres_etl_spark.operators.retrieval import tfidf_cosine_pairs

    def words(seed, k=40):
        return " ".join(
            "w" + hashlib.md5(f"{seed}:{j}".encode()).hexdigest()[:4]
            for j in range(k)
        )

    rows = [(i, words(i)) for i in range(30)]
    rows += [(100 + i, words(i)) for i in range(30)]  # exact twin of each
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b)
        for r in tfidf_cosine_pairs(
            docs, "doc_id", "text", min_df=1, threshold=1.0
        ).collect()
    )
    assert got == [(i, 100 + i) for i in range(30)]


SQL_TFIDF_COSINE = """
WITH t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(regexp_replace(
    regexp_replace(lower(text),'[^a-z0-9\\s]',' ','g'),'\\s+',' ','g')),
    ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
tc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfs AS (
  SELECT term, count(*) AS df FROM tc GROUP BY 1
  HAVING count(*) >= {mindf} AND count(*) <= {maxdf}),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM t),
w AS (
  SELECT doc_id, tc.term,
         CAST(round(tf * (ln((1 + n) / (1 + df)) + 1), 6)
              AS DECIMAL(18,6)) AS w
  FROM tc JOIN dfs USING (term) CROSS JOIN nd),
norms AS (
  SELECT doc_id, sum(CAST(w * w AS DECIMAL(38,12))) AS n2
  FROM w GROUP BY 1),
dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         sum(CAST(a.w * b.w AS DECIMAL(38,12))) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
scored AS (
  SELECT id_a, id_b,
         CASE WHEN dot = na.n2 AND na.n2 = nb.n2 THEN 1.0
              ELSE CAST(dot AS DOUBLE) /
                (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
         END AS cosine
  FROM dots
  JOIN norms na ON na.doc_id = id_a
  JOIN norms nb ON nb.doc_id = id_b)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {th}
"""


def test_tfidf_cosine_oracle_parity(spark, oracle):
    from web_api_postgres_etl_spark.operators.retrieval import tfidf_cosine_pairs

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in tfidf_cosine_pairs(
            docs, "doc_id", "text", min_df=2, max_df=50, threshold=0.3
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in oracle.execute(
            SQL_TFIDF_COSINE.format(mindf=2, maxdf=50, th=0.3)
        ).fetchall()
    )
    assert len(got) > 0
    assert got == want  # bit-exact: DECIMAL sums + pinned float ops


def test_keywords_per_doc_ground_truth_and_mirror(spark, oracle):
    """Planted topical docs surface their topic terms (the shared
    stopword is max_df-pruned); full DuckDB mirror on documents."""
    from web_api_postgres_etl_spark.operators.retrieval import (
        keywords_per_doc,
    )

    rows = [
        (1, "the solar panel array powers the solar farm"),
        (2, "the castle keep guards the castle gate"),
        (3, "the quarterly ledger reconciles the ledger entries"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top1 = {
        r["doc_id"]: r["term"]
        for r in keywords_per_doc(df, "doc_id", "text", k=1).collect()
    }
    # 'the' appears in 3/3 docs > max_df_frac=0.5 -> pruned; the
    # repeated topical term wins per doc
    assert top1 == {1: "solar", 2: "castle", 3: "ledger"}
    import pytest as _pt
    with _pt.raises(ValueError, match="k must"):
        keywords_per_doc(df, "doc_id", "text", k=0)
    with _pt.raises(ValueError, match="max_df_frac"):
        keywords_per_doc(df, "doc_id", "text", max_df_frac=0.0)

    from tests.conftest import SF_ORACLE

    TOKS = (
        "list_filter(regexp_split_to_array(trim(regexp_replace("
        "regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), "
        "'\\s+', ' ', 'g')), ' '), x -> x <> '')"
    )
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["rank"], r["term"], r["tf"], r["df"], repr(r["tfidf"]))
        for r in keywords_per_doc(
            docs, "doc_id", "text", k=3, min_df=2, max_df_frac=0.9
        ).collect()
    )
    want = sorted(
        (d, rk, t, tf, dfreq, repr(w))
        for d, rk, t, tf, dfreq, w in oracle.execute(f"""
            WITH t AS (
              SELECT doc_id, unnest({TOKS}) AS term FROM documents),
            tc AS (SELECT doc_id, term, count(*) AS tf
                   FROM t GROUP BY doc_id, term),
            dfs AS (SELECT term, count(*) AS df FROM tc GROUP BY term
                    HAVING count(*) >= 2),
            n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
            w AS (
              SELECT tc.doc_id, tc.term, tc.tf, dfs.df,
                     round(tc.tf * (ln((1 + n.n) / (1 + dfs.df)) + 1), 6)
                       AS tfidf
              FROM tc JOIN dfs USING (term) CROSS JOIN n
              WHERE dfs.df <= n.n * 0.9)
            SELECT doc_id,
                   CAST(row_number() OVER
                     (PARTITION BY doc_id
                      ORDER BY tfidf DESC, term ASC) AS INT) AS rank,
                   term, tf, df, tfidf
            FROM w
            QUALIFY rank <= 3
        """).fetchall()
    )
    assert got == want and len(got) == 1500  # 3 per doc, 500 docs


def test_frequent_itemsets_ground_truth(spark):
    """Hand-countable planted baskets: supports are exact transaction
    counts, rules carry the right confidence/lift, duplicates and
    NULLs inside a transaction are cleaned rather than crashing."""
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.retrieval import (
        frequent_itemsets,
    )

    baskets = [
        (["bread", "milk"],),
        (["bread", "milk", "eggs"],),
        (["bread", "bread", "milk", None],),   # dup + NULL cleaned
        (["eggs"],),
        ([],),
        (None,),
    ]
    df = spark.createDataFrame(baskets, "items array<string>")
    itemsets, rules = frequent_itemsets(df, "items", min_support=0.5,
                                        min_confidence=0.6)
    freq = {tuple(sorted(r["items"])): r["freq"] for r in itemsets.collect()}
    # 6 transactions; support 0.5 -> count >= 3
    assert freq == {("bread",): 3, ("milk",): 3, ("bread", "milk"): 3}
    got_rules = {
        (tuple(r["antecedent"]), tuple(r["consequent"])):
            (r["confidence"], r["lift"])
        for r in rules.collect()
    }
    # bread -> milk with confidence 3/3 and lift (3/3)/(3/6) = 2
    assert got_rules[(("bread",), ("milk",))] == (1.0, 2.0)
    assert got_rules[(("milk",), ("bread",))] == (1.0, 2.0)

    import pytest as _pt
    with _pt.raises(ValueError, match="min_support"):
        frequent_itemsets(df, "items", min_support=0.0)
    with _pt.raises(ValueError, match="min_confidence"):
        frequent_itemsets(df, "items", min_confidence=1.5)

    # events-table face: per-user distinct event types as transactions;
    # itemset counts must equal direct SQL set-containment counts
    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    tx = events.groupBy("user_id").agg(
        F.collect_set("event_type").alias("types")
    )
    isets, _ = frequent_itemsets(tx, "types", min_support=0.8)
    n_users = tx.count()
    for r in isets.collect():
        want = tx.filter(
            F.forall(
                F.array(*[F.lit(i) for i in r["items"]]),
                lambda i: F.array_contains(F.col("types"), i),
            )
        ).count()
        assert r["freq"] == want and r["freq"] >= 0.8 * n_users


# ------------------------------------------------- vocabulary overlap
def test_vocabulary_overlap_exact_and_duckdb_mirror(spark, oracle):
    """Planted ground truth (hand-counted types/occurrences, OOV rate),
    totality on empty corpora, and a bit-exact mirror on documents
    split by language."""
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.retrieval import (
        vocabulary_overlap,
    )

    a = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the mat")], "id long, text string"
    )
    b = spark.createDataFrame(
        [(1, "the cat ran far"), (2, None)], "id long, text string"
    )
    r = vocabulary_overlap(a, b).first()
    # vocab a = {the, cat, sat, mat}; b = {the, cat, ran, far}; shared 2
    assert (r["n_vocab_a"], r["n_vocab_b"], r["n_shared"]) == (4, 4, 2)
    assert r["vocab_jaccard"] == 2 / 6
    # b occurrences: the cat ran far = 4; OOV types {ran, far} → 2/4
    assert (r["n_tokens_b"], r["oov_rate_b"]) == (4, 0.5)

    empty = spark.createDataFrame([], "id long, text string")
    r0 = vocabulary_overlap(a, empty).first()
    assert (r0["n_vocab_b"], r0["n_tokens_b"]) == (0, 0)
    assert r0["oov_rate_b"] is None
    r00 = vocabulary_overlap(empty, empty).first()
    # both-empty: ZERO counts (not NULL — the zero-row-join sum trap),
    # NULL rates
    assert (r00["n_vocab_a"], r00["n_vocab_b"], r00["n_shared"]) == (0, 0, 0)
    assert r00["vocab_jaccard"] is None and r00["oov_rate_b"] is None

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = vocabulary_overlap(
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("lang") != "en"),
    ).first()
    want = oracle.execute("""
        WITH tok AS (
          SELECT lang = 'en' AS is_a,
                 unnest(list_filter(string_split_regex(trim(
                   regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' '),
                   x -> x <> '')) AS tok
          FROM documents),
        va AS (SELECT tok, COUNT(*) AS occ FROM tok WHERE is_a GROUP BY 1),
        vb AS (SELECT tok, COUNT(*) AS occ FROM tok WHERE NOT is_a GROUP BY 1),
        j AS (SELECT va.tok AS ta, vb.tok AS tb, va.occ AS oa, vb.occ AS ob
              FROM va FULL OUTER JOIN vb ON va.tok = vb.tok)
        SELECT SUM(CASE WHEN ta IS NOT NULL THEN 1 ELSE 0 END) AS n_vocab_a,
               SUM(CASE WHEN tb IS NOT NULL THEN 1 ELSE 0 END) AS n_vocab_b,
               SUM(CASE WHEN ta IS NOT NULL AND tb IS NOT NULL THEN 1
                   ELSE 0 END) AS n_shared,
               COALESCE(SUM(ob), 0) AS n_tokens_b,
               COALESCE(SUM(CASE WHEN ta IS NULL THEN ob END), 0) AS oov
        FROM j
    """).fetchone()
    assert got["n_vocab_a"] == want[0]
    assert got["n_vocab_b"] == want[1]
    assert got["n_shared"] == want[2]
    assert got["n_tokens_b"] == want[3]
    assert repr(got["oov_rate_b"]) == repr(want[4] / want[3])
    assert repr(got["vocab_jaccard"]) == repr(
        want[2] / (want[0] + want[1] - want[2])
    )


# ---------------------------------------------------------- BPE mining


def _py_bpe(word_counts: dict, rounds: int):
    """Reference BPE: greedy leftmost non-overlapping merges, ties to
    the lexicographically smaller (lhs, rhs)."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    rules = []
    for rnd in range(1, rounds + 1):
        pairs: dict = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (lhs, rhs), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((rnd, lhs, rhs, lhs + rhs, cnt))
        nxt = {}
        for syms, c in vocab.items():
            out: list = []
            for s in syms:
                if out and out[-1] == lhs and s == rhs:
                    out[-1] = lhs + rhs
                else:
                    out.append(s)
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        vocab = nxt
    return rules


def test_bpe_merge_rules_planted(spark):
    """Hand-checkable corpus: 'aaa' pins the leftmost-greedy overlap
    rule ((a,a) merges positions 1-2, leaving <aa><a>), repeated words
    weight counts, and ties break lexicographically."""
    from web_api_postgres_etl_spark.operators.retrieval import (
        bpe_merge_rules,
    )

    docs = spark.createDataFrame(
        [
            (1, "low low low lower lowest"),
            (2, "new newer newest new"),
            (3, "aaa aaa"),
            (4, "wider wide widest"),
        ],
        "doc_id long, text string",
    )
    counts: dict = {}
    for _, t in docs.collect():
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    want = _py_bpe(counts, 6)
    got = [tuple(r) for r in bpe_merge_rules(docs, "text", rounds=6).collect()]
    assert got == want
    # determinism under repartition
    got2 = [
        tuple(r)
        for r in bpe_merge_rules(docs.repartition(7), "text", rounds=6).collect()
    ]
    assert got2 == want


def test_bpe_merge_rules_overlap_and_dry(spark):
    """(a,a) on 'aaaa' merges to <aa><aa> (not a chain), and a corpus
    of single-char words mines dry with zero rules; rounds<1 raises."""
    import pytest as _pt

    from web_api_postgres_etl_spark.operators.retrieval import (
        bpe_merge_rules,
    )

    d = spark.createDataFrame([(1, "aaaa aaaa aaaa")], "id long, text string")
    got = [tuple(r) for r in bpe_merge_rules(d, "text", rounds=3).collect()]
    # round 1: (a,a) count 9 -> <aa><aa>; round 2: (aa,aa) count 3
    assert got[0] == (1, "a", "a", "aa", 9)
    assert got[1] == (2, "aa", "aa", "aaaa", 3)
    assert len(got) == 2  # round 3 mines dry: every word one symbol
    single = spark.createDataFrame([(1, "a b c a")], "id long, text string")
    assert bpe_merge_rules(single, "text", rounds=4).count() == 0
    with _pt.raises(ValueError, match="rounds"):
        bpe_merge_rules(single, "text", rounds=0)


def test_bpe_merge_rules_vocab_cap_and_corpus_mirror(spark, oracle):
    """max_vocab_words keeps the top words by (count desc, word) and
    rules from the capped table match the Python model computed on the
    same capped vocabulary — checked on the real documents table at
    sf0.01 (cap keeps the job small), plus an uncapped DuckDB
    mirror of the word table feeding the model."""
    from web_api_postgres_etl_spark.operators.retrieval import (
        bpe_merge_rules,
    )
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    cap = 200
    wc = oracle.execute("""
        WITH tok AS (
          SELECT unnest(list_filter(string_split_regex(trim(
            regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' '),
            x -> x <> '')) AS w
          FROM documents)
        SELECT w, COUNT(*) AS c FROM tok GROUP BY w
        ORDER BY c DESC, w LIMIT 200
    """).fetchall()
    want = _py_bpe({w: c for w, c in wc}, 8)
    got = [
        tuple(r)
        for r in bpe_merge_rules(
            docs, "text", rounds=8, max_vocab_words=cap
        ).collect()
    ]
    assert got == want


def _py_bpe_apply(word: str, rules):
    syms = list(word)
    for lhs, rhs in rules:
        out: list = []
        for s in syms:
            if out and out[-1] == lhs and s == rhs:
                out[-1] = lhs + rhs
            else:
                out.append(s)
        syms = out
    return syms


def test_bpe_apply_matches_model_and_training(spark):
    """bpe_apply segments exactly like the Python model (greedy
    leftmost, rules in order), zero rules = character segmentation,
    NULL text = empty array, and applying the rules MINED from a
    corpus to that corpus reproduces training's end state: the next
    pair count equals what one more mining round would pick."""
    import pytest as _pt

    from web_api_postgres_etl_spark.operators.retrieval import (
        bpe_apply,
        bpe_merge_rules,
    )

    docs = spark.createDataFrame(
        [
            (1, "low low low lower lowest"),
            (2, "new newer newest new"),
            (3, "aaa aaa"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    rules = [
        (r["lhs"], r["rhs"])
        for r in bpe_merge_rules(
            docs.filter("text is not null"), "text", rounds=5
        ).collect()
    ]
    got = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_apply(docs, "text", rules).collect()
    }
    for doc_id, text in docs.collect():
        want: list = []
        for w in (text or "").split():
            want.extend(_py_bpe_apply(w, rules))
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
    # zero rules = chars
    got0 = {
        r["doc_id"]: list(r["t0"])
        for r in bpe_apply(docs, "text", [], out_col="t0").collect()
    }
    assert got0[3] == ["a", "a", "a", "a", "a", "a"]
    assert got0[4] == []
    # guards
    with _pt.raises(ValueError, match="non-alphanumeric"):
        bpe_apply(docs, "text", [("a", "<")])
    with _pt.raises(ValueError, match="already exists"):
        bpe_apply(docs, "text", [], out_col="text")


def test_bpe_apply_duckdb_mirror_on_corpus(spark, oracle):
    """Segmentation token counts under the mined sf0.01 rules match a
    DuckDB mirror applying the SAME replaces on the SAME bracket
    encoding — the engine-independence claim for the apply half."""
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.retrieval import (
        bpe_apply,
        bpe_merge_rules,
    )
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    rules = [
        (r["lhs"], r["rhs"])
        for r in bpe_merge_rules(
            docs, "text", rounds=6, max_vocab_words=500
        ).collect()
    ]
    got = {
        r["doc_id"]: r["n"]
        for r in bpe_apply(docs, "text", rules)
        .select("doc_id", F.size("bpe_tokens").alias("n"))
        .collect()
    }
    rep = "seq"
    for lhs, rhs in rules:
        rep = f"replace({rep}, '<{lhs}><{rhs}>', '<{lhs}{rhs}>')"
    want = dict(oracle.execute(f"""
        WITH t AS (
          SELECT doc_id, list_filter(string_split_regex(trim(
            regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' '),
            x -> x <> '') AS toks
          FROM documents),
        b AS (
          SELECT doc_id, array_to_string(list_transform(toks,
            w -> '<' || array_to_string(string_split(w, ''), '><') || '>'),
            ' ') AS seq
          FROM t)
        SELECT doc_id,
               length({rep}) - length(replace({rep}, '<', ''))
        FROM b
    """).fetchall())
    assert got == want


def test_bpe_apply_rule_cap_and_chunked_equivalence(spark):
    """The single-plan chained-replace cap raises loudly past 500
    rules with a message naming the chunk_size escape; the chunked
    path (lineage-cut every chunk_size rules) produces the EXACT
    segmentation of the single-shot plan — chunking is function
    composition, bit-identical by construction — and honors the
    pins/release contract for its boundary checkpoints."""
    import pytest as pt

    from web_api_postgres_etl_spark.caching import release_frame
    from web_api_postgres_etl_spark.operators.retrieval import (
        _BPE_MAX_CHAIN,
        bpe_apply,
        bpe_merge_rules,
    )

    docs = spark.createDataFrame(
        [
            (1, "low low low lower lowest newer newest"),
            (2, "aaaa aabb bbaa abab"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    # cap: 501 synthetic (distinct, alnum) rules raise before any job
    too_many = [(f"a{i}", "b") for i in range(_BPE_MAX_CHAIN + 1)]
    with pt.raises(ValueError, match=r"chained-replace cap \(500\)"):
        bpe_apply(docs, "text", too_many)
    with pt.raises(ValueError, match="chunk_size must be in"):
        bpe_apply(docs, "text", too_many, chunk_size=0)
    with pt.raises(ValueError, match="chunk_size must be in"):
        bpe_apply(docs, "text", too_many, chunk_size=_BPE_MAX_CHAIN + 1)
    # equivalence: mine real rules, apply single-shot vs chunk_size=3
    # (9 rules -> 3 chunks, two lineage-cut boundaries)
    rules = [
        (r["lhs"], r["rhs"])
        for r in bpe_merge_rules(
            docs.filter("text is not null"), "text", rounds=9
        ).collect()
    ]
    assert len(rules) >= 7  # enough rounds fired to exercise chunking
    one = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_apply(docs, "text", rules).collect()
    }
    pins: list = []
    chunked_df = bpe_apply(docs, "text", rules, chunk_size=3, pins=pins)
    chunked = {
        r["doc_id"]: list(r["bpe_tokens"]) for r in chunked_df.collect()
    }
    assert chunked == one
    assert len(pins) == (len(rules) - 1) // 3  # one pin per boundary
    for p in pins:
        release_frame(p)
    # staged-column collision guard
    with pt.raises(ValueError, match="__bpe_str"):
        bpe_apply(
            docs.withColumn("__bpe_str", docs.text), "text", rules,
            chunk_size=3,
        )


# ------------------------------------------------- DSIR importance


def test_dsir_logratio_hand_computed_and_direction(spark):
    """Tiny corpora with hand-derivable smoothed log-probs: exact
    values for every token class (in both models, target-only,
    raw-only, in neither), positive scores for target-like docs and
    negative for raw-typical ones, NULL totality for token-less docs,
    and the empty-model degrade rule."""
    import math as m

    import pytest as pt

    from web_api_postgres_etl_spark.operators.retrieval import (
        build_unigram_model,
        dsir_logratio,
    )

    target = spark.createDataFrame(
        [(1, "physics physics energy")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, "celebrity gossip gossip energy")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "physics energy"),      # target-like
            (2, "celebrity gossip"),    # raw-like
            (3, "quantum"),             # in neither model
            (4, "!!!"),                 # token-less
        ],
        "doc_id long, text string",
    )
    tc = build_unigram_model(target)
    rc = build_unigram_model(raw)
    out = {
        r["doc_id"]: (r["n_tokens"], r["log_ratio"], r["avg_log_ratio"])
        for r in dsir_logratio(docs, tc, raw_counts=rc).collect()
    }
    a = 0.5
    dt = 3 + a * 3          # N=3, V=2
    dr = 4 + a * 4          # N=4, V=3
    def lt(c): return m.log((c + a) / dt)
    def lr(c): return m.log((c + a) / dr)
    want1 = (lt(2) - lr(0)) + (lt(1) - lr(1))      # physics, energy
    want2 = (lt(0) - lr(1)) + (lt(0) - lr(2))      # celebrity, gossip
    want3 = lt(0) - lr(0)                          # quantum: both OOV
    assert out[1][0] == 2 and out[1][1] == pt.approx(want1, abs=2e-6)
    assert out[2][1] == pt.approx(want2, abs=2e-6)
    assert out[3][1] == pt.approx(want3, abs=2e-6)
    assert out[1][2] == pt.approx(want1 / 2, abs=2e-6)
    assert out[1][1] > 0 > out[2][1]               # the selection signal
    assert out[4] == (0, None, None)

    empty = build_unigram_model(
        spark.createDataFrame([(1, "!!!")], "doc_id long, text string")
    )
    degraded = {
        r["doc_id"]: r["log_ratio"]
        for r in dsir_logratio(docs, empty, raw_counts=rc).collect()
    }
    assert set(degraded.values()) == {None}


def test_dsir_logratio_oracle_parity(spark, oracle):
    """Full corpus vs a DuckDB mirror: target = the en documents, raw =
    the rest, self-raw default exercised separately; rounded values
    equal (the unigram_perplexity parity recipe, applied to the
    two-model ratio)."""
    import pytest as pt

    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.retrieval import (
        build_unigram_model,
        dsir_logratio,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    tc = build_unigram_model(docs.filter(F.col("lang") == "en"))
    rc = build_unigram_model(docs.filter(F.col("lang") != "en"))
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_ratio"])
        for r in dsir_logratio(docs, tc, raw_counts=rc).collect()
    }
    want = {
        row[0]: (row[1], row[2])
        for row in oracle.execute("""
        WITH t AS (
          SELECT doc_id, lang, list_filter(regexp_split_to_array(trim(
            regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' '),
            x -> x <> '') AS toks
          FROM documents),
        tm AS (SELECT tok, COUNT(*) AS c FROM (
                 SELECT unnest(toks) AS tok FROM t WHERE lang = 'en')
               GROUP BY 1),
        rm AS (SELECT tok, COUNT(*) AS c FROM (
                 SELECT unnest(toks) AS tok FROM t WHERE lang <> 'en')
               GROUP BY 1),
        ts AS (SELECT SUM(c) + 0.5 * (COUNT(*) + 1) AS d FROM tm),
        rs AS (SELECT SUM(c) + 0.5 * (COUNT(*) + 1) AS d FROM rm),
        occ AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        delta AS (
          SELECT occ.doc_id,
                 ln((coalesce(tm.c, 0) + 0.5) / ts.d)
                 - ln((coalesce(rm.c, 0) + 0.5) / rs.d) AS d
          FROM occ
          LEFT JOIN tm ON occ.tok = tm.tok
          LEFT JOIN rm ON occ.tok = rm.tok
          CROSS JOIN ts CROSS JOIN rs)
        SELECT t.doc_id,
               CAST(coalesce(len(t.toks), 0) AS INT) AS n_tokens,
               round(SUM(delta.d), 6) AS log_ratio
        FROM t LEFT JOIN delta ON t.doc_id = delta.doc_id
        GROUP BY t.doc_id, t.toks
        """).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0], k
        if want[k][1] is None:
            assert got[k][1] is None, k
        else:
            assert got[k][1] == pt.approx(want[k][1], abs=2e-6), k


def test_dsir_resampling_composition_end_to_end(spark):
    """DSIR's actual selection step, composed (the docstring promise):
    log-ratios become exp(clamped) importance weights feeding
    weighted_sample_exact_n — exactly n docs drawn, the draw is
    partitioning-independent, the selected set is biased toward
    target-like documents (mean log_ratio strictly above the corpus
    mean for this pinned salt), and NULL-scored (token-less) docs can
    never win a race (NULL weight is excluded by contract)."""
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.retrieval import (
        build_unigram_model,
        dsir_logratio,
    )
    from web_api_postgres_etl_spark.operators.sampling import (
        weighted_sample_exact_n,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    tc = build_unigram_model(docs.filter(F.col("lang") == "en"))
    rc = build_unigram_model(docs.filter(F.col("lang") != "en"))
    scored = dsir_logratio(docs, tc, raw_counts=rc, cache_model=False)
    # the DSIR clamp keeps one outlier doc from dominating every draw
    weighted = scored.withColumn(
        "w",
        F.exp(
            F.least(F.greatest(F.col("log_ratio"), F.lit(-5.0)), F.lit(5.0))
        ),
    )
    picked = weighted_sample_exact_n(
        weighted, 100, "doc_id", "w", salt="dsir-r12"
    )
    sel = picked.collect()
    assert len(sel) == 100
    assert all(r["log_ratio"] is not None for r in sel)
    sel_mean = sum(r["log_ratio"] for r in sel) / len(sel)
    all_mean = scored.agg(F.avg("log_ratio")).first()[0]
    assert sel_mean > all_mean
    again = sorted(
        r["doc_id"]
        for r in weighted_sample_exact_n(
            weighted.repartition(7), 100, "doc_id", "w", salt="dsir-r12"
        ).collect()
    )
    assert again == sorted(r["doc_id"] for r in sel)


def test_bpe_local_mining_equivalence_and_cap(spark):
    """r13 (VERDICT #4): the driver-local miner ≡ the distributed loop
    rule-for-rule at R=624 requested rounds — including the dry-break
    (this corpus mines dry far below 624, so both engines agree on
    depth, every rule, and the stop), weighted counts, and tie order.
    mining='auto' picks local under the cap and falls back to the
    distributed loop above it (same rules either way); an explicit
    mining='local' above the cap raises loudly."""
    import pytest as pt

    from web_api_postgres_etl_spark.operators.retrieval import (
        bpe_merge_rules,
    )

    # 16 distinct 10-char words, skewed counts — deterministic letters
    words = [
        chr(97 + (i // 26) % 26) + chr(97 + i % 26)
        + "".join(chr(97 + ((i * 5 + j * 11 + j * j) % 26)) for j in range(8))
        for i in range(16)
    ]
    docs = spark.createDataFrame(
        [(i, " ".join([w] * (1 + i % 5))) for i, w in enumerate(words)],
        "doc_id long, text string",
    ).coalesce(1)
    R = 624
    loc = [
        tuple(r)
        for r in bpe_merge_rules(
            docs, "text", rounds=R, mining="local"
        ).collect()
    ]
    dist = [
        tuple(r)
        for r in bpe_merge_rules(
            docs, "text", rounds=R, mining="distributed"
        ).collect()
    ]
    assert loc == dist
    assert 50 < len(loc) < R  # deep, and the dry-break fired both sides
    # auto under the cap = the local rules
    auto = [
        tuple(r)
        for r in bpe_merge_rules(docs, "text", rounds=5).collect()
    ]
    assert auto == loc[:5]
    # auto ABOVE the cap: loud-documented fallback to the distributed
    # loop — identical rules
    fb = [
        tuple(r)
        for r in bpe_merge_rules(
            docs, "text", rounds=5, local_cap=3
        ).collect()
    ]
    assert fb == loc[:5]
    # explicit local above the cap raises (must not blow the driver)
    with pt.raises(ValueError, match="local_cap"):
        bpe_merge_rules(docs, "text", rounds=2, mining="local", local_cap=3)
    with pt.raises(ValueError, match="mining must be"):
        bpe_merge_rules(docs, "text", rounds=2, mining="driver")


def test_bpe_apply_arrow_kernel_equivalence(spark):
    """The Arrow kernel ≡ the literal-plan forms: on MINED rules it
    reproduces bpe_apply exactly (priority merging equals in-order
    application when constituents predate their rule); at R=624 —
    past the 500-rule chained cap — it reproduces the CHUNKED literal
    plan bit-for-bit on synthetic mined-order chain rules; NULL text
    is total; guards raise."""
    import pytest as pt

    from web_api_postgres_etl_spark.operators.retrieval import (
        bpe_apply,
        bpe_apply_arrow,
        bpe_merge_rules,
    )

    docs = spark.createDataFrame(
        [
            (1, "low low low lower lowest newer newest"),
            (2, "aaaa aabb bbaa abab banana bandana"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    rules = [
        (r["lhs"], r["rhs"])
        for r in bpe_merge_rules(
            docs.filter("text is not null"), "text", rounds=8
        ).collect()
    ]
    lit = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_apply(docs, "text", rules).collect()
    }
    arrow = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_apply_arrow(docs, "text", rules).collect()
    }
    assert arrow == lit
    assert arrow[4] == []
    # R past the chained cap: per-letter run chains are mined-order by
    # construction (every output symbol feeds only LATER rules)
    big: list = []
    for ch in "abcdefghijklmnopqrstuvwxyz":
        run = ch
        for _ in range(24):
            big.append((run, ch))
            run = run + ch
    assert len(big) == 624
    long_docs = spark.createDataFrame(
        [(1, "aaaaaaa bbbb zz " + "q" * 30), (2, "ababab aa"), (3, None)],
        "doc_id long, text string",
    )
    chunked = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_apply(
            long_docs, "text", big, chunk_size=200
        ).collect()
    }
    kern = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in bpe_apply_arrow(long_docs, "text", big).collect()
    }
    assert kern == chunked
    # greedy non-overlapping pair merges leave no single letters in a
    # multi-char run ("aaaaaaa" → [aa, aa, aaa], "bbbb" → [bb, bb])
    assert all(len(t) >= 2 for t in kern[1])
    assert kern[1][:3] == ["aa", "aa", "aaa"]
    with pt.raises(ValueError, match="non-alphanumeric"):
        bpe_apply_arrow(docs, "text", [("a", "<")])
    with pt.raises(ValueError, match="already exists"):
        bpe_apply_arrow(docs, "text", [], out_col="text")


def test_fuse_rankings_rrf_and_borda(spark, oracle):
    """Rank fusion: RRF equals a hand-computed fixed-order fold (and a
    DuckDB list_sort+list_reduce mirror to the last bit), Borda is
    exact integers with per-list caps, duplicate rows within one
    system keep their best rank, singleton fusion preserves order,
    the top-k cut binds, and guards raise (bad method, empty list,
    rank 0 in-plan)."""
    import pytest as pt

    from web_api_postgres_etl_spark.operators.retrieval import (
        fuse_rankings,
    )

    r1 = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3), (40, 4)], "doc_id long, rank long"
    )
    r2 = spark.createDataFrame(
        [(30, 1), (10, 2), (50, 3)], "doc_id long, rank long"
    )
    out = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in fuse_rankings([r1, r2], k0=60).collect()
    }
    # fixed-order fold: sys 0 term then sys 1 term
    want = {
        10: (1.0 / 61) + (1.0 / 62),
        20: 1.0 / 62,
        30: (1.0 / 63) + (1.0 / 61),
        40: 1.0 / 64,
        50: 1.0 / 63,
    }
    for d, s in want.items():
        assert out[d][0] == s, d
    assert [d for d, v in sorted(out.items(), key=lambda kv: kv[1][1])] == [
        10, 30, 20, 50, 40
    ]
    # DuckDB mirror of the same fold (bit parity)
    mirror = dict(oracle.execute("""
        WITH pairs(doc_id, sys, rk) AS (VALUES
          (10, 0, 1), (20, 0, 2), (30, 0, 3), (40, 0, 4),
          (30, 1, 1), (10, 1, 2), (50, 1, 3)),
        l AS (
          SELECT doc_id, list_sort(list({'__sys': sys, '__rk': rk})) AS xs
          FROM pairs GROUP BY doc_id)
        SELECT doc_id, list_reduce(
          list_prepend(0.0::DOUBLE,
            list_transform(xs, x -> 1.0::DOUBLE / (60 + x.__rk))),
          (acc, v) -> acc + v) AS score
        FROM l
    """).fetchall())
    for d in want:
        assert out[d][0] == mirror[d], d
    # borda: caps are per-list max ranks (4 and 3)
    borda = {
        r["doc_id"]: r["score"]
        for r in fuse_rankings([r1, r2], method="borda").collect()
    }
    assert borda == {
        10: (4 + 1 - 1) + (3 + 1 - 2),   # 4 + 2 = 6
        20: 3,
        30: (4 + 1 - 3) + (3 + 1 - 1),   # 2 + 3 = 5
        40: 1,
        50: 1,
    }
    # r13 (ADVICE): explicit list_sizes override the max-observed-rank
    # caps — a gap-filtered shortlist keeps its documented |list_i|
    # point scale (here r2 claims size 10, shifting every sys-1 term
    # by +7); a length mismatch raises
    borda_sz = {
        r["doc_id"]: r["score"]
        for r in fuse_rankings(
            [r1, r2], method="borda", list_sizes=[4, 10]
        ).collect()
    }
    assert borda_sz == {
        10: (4 + 1 - 1) + (10 + 1 - 2),
        20: 3,
        30: (4 + 1 - 3) + (10 + 1 - 1),
        40: 1,
        50: 10 + 1 - 3,
    }
    with pt.raises(ValueError, match="list_sizes"):
        fuse_rankings([r1, r2], method="borda", list_sizes=[4])
    # duplicate rows in one system keep the BEST rank, not both votes
    dup = spark.createDataFrame(
        [(10, 3), (10, 1), (20, 2)], "doc_id long, rank long"
    )
    got_dup = {
        r["doc_id"]: r["score"]
        for r in fuse_rankings([dup], k0=60).collect()
    }
    assert got_dup == {10: 1.0 / 61, 20: 1.0 / 62}
    # singleton fusion preserves the input order; k cuts
    solo = fuse_rankings([r1], k=2).collect()
    assert [(r["doc_id"], r["rank"]) for r in sorted(
        solo, key=lambda r: r["rank"])] == [(10, 1), (20, 2)]
    # guards
    with pt.raises(ValueError, match="method must be"):
        fuse_rankings([r1], method="mean")
    with pt.raises(ValueError, match="at least one"):
        fuse_rankings([])
    with pt.raises(Exception, match="ranks must be >= 1"):
        fuse_rankings(
            [spark.createDataFrame([(1, 0)], "doc_id long, rank long")]
        ).collect()


def _py_bucket(feat: str, salt: str, buckets: int) -> int:
    import hashlib

    h = hashlib.md5(f"{salt}#{feat}".encode()).hexdigest()
    return int(h[:13], 16) % buckets


def _py_feats(text: str) -> list:
    import re as _re

    toks = [t for t in _re.sub(
        r"[^a-z0-9\s]", " ", (text or "").lower()).split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def test_dsir_logratio_hashed_python_twin_and_totality(spark):
    """The hashed variant against a literal Python twin (md5 buckets,
    fixed-dimension smoothing, unigram+bigram features): exact values
    at 2e-6 for every doc, positive for target-like docs, feature-less
    and NULL docs total at (0, NULL, NULL), and the empty-model
    degrade rule."""
    import math as m

    import pytest as pt

    from web_api_postgres_etl_spark.operators.retrieval import (
        build_hashed_ngram_model,
        dsir_logratio_hashed,
    )

    B, A, SALT = 64, 0.5, "dsir-h"
    target = spark.createDataFrame(
        [(1, "physics energy physics quantum")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, "recipe sugar flour recipe")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "physics quantum energy"),
            (2, "sugar flour"),
            (3, "!!!"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    tc = build_hashed_ngram_model(target, buckets=B)
    rc = build_hashed_ngram_model(raw, buckets=B)
    got = {
        r["doc_id"]: (r["n_features"], r["log_ratio"])
        for r in dsir_logratio_hashed(
            docs, tc, raw_counts=rc, buckets=B
        ).collect()
    }

    def counts(text):
        out: dict = {}
        for f in _py_feats(text):
            b = _py_bucket(f, SALT, B)
            out[b] = out.get(b, 0) + 1
        return out

    ct, cr = counts(target.first()["text"]), counts(raw.first()["text"])
    nt, nr = sum(ct.values()), sum(cr.values())
    dt, dr = nt + A * B, nr + A * B

    def score(text):
        fs = _py_feats(text)
        if not fs:
            return (0, None)
        s = 0.0
        for f in fs:
            b = _py_bucket(f, SALT, B)
            s += m.log((ct.get(b, 0) + A) / dt) - m.log(
                (cr.get(b, 0) + A) / dr
            )
        return (len(fs), round(s, 6))

    for d, text in [(1, "physics quantum energy"), (2, "sugar flour"),
                    (3, "!!!"), (4, None)]:
        n, lr = score(text)
        assert got[d][0] == n, d
        if lr is None:
            assert got[d][1] is None, d
        else:
            assert got[d][1] == pt.approx(lr, abs=2e-6), d
    assert got[1][1] > 0 > got[2][1]   # the selection signal
    # empty model degrades to NULL (totality)
    empty = build_hashed_ngram_model(
        spark.createDataFrame([(1, "!!!")], "doc_id long, text string"),
        buckets=B,
    )
    degraded = dsir_logratio_hashed(
        docs, empty, raw_counts=rc, buckets=B
    ).collect()
    assert {r["log_ratio"] for r in degraded} == {None}
    with pt.raises(ValueError, match="buckets must be >= 2"):
        build_hashed_ngram_model(docs, buckets=1)


def test_dsir_logratio_hashed_duckdb_mirror(spark, oracle):
    """Full-corpus parity: the hashed pipeline (md5 buckets, bigram
    features, fixed-dimension smoothing) mirrored in DuckDB on sf0.01
    en-vs-rest at 2e-6 — the whole construction is portable SQL."""
    import pytest as pt

    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.retrieval import (
        build_hashed_ngram_model,
        dsir_logratio_hashed,
    )

    B = 4096
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    tc = build_hashed_ngram_model(docs.filter(F.col("lang") == "en"), buckets=B)
    rc = build_hashed_ngram_model(docs.filter(F.col("lang") != "en"), buckets=B)
    got = {
        r["doc_id"]: (r["n_features"], r["log_ratio"])
        for r in dsir_logratio_hashed(
            docs, tc, raw_counts=rc, buckets=B
        ).collect()
    }
    want = {
        row[0]: (row[1], row[2])
        for row in oracle.execute(f"""
        WITH t AS (
          SELECT doc_id, lang, list_filter(regexp_split_to_array(trim(
            regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' '),
            x -> x <> '') AS toks
          FROM documents),
        f AS (
          SELECT doc_id, lang, unnest(
            list_concat(toks,
              CASE WHEN len(toks) >= 2 THEN
                list_transform(generate_series(2, len(toks)),
                  i -> toks[i-1] || ' ' || toks[i])
              ELSE [] END)) AS feat
          FROM t),
        fb AS (
          SELECT doc_id, lang,
            CAST(('0x' || substr(md5('dsir-h#' || feat), 1, 13))
              AS BIGINT) % {B} AS b
          FROM f),
        tm AS (SELECT b, COUNT(*) AS c FROM fb WHERE lang = 'en' GROUP BY 1),
        rm AS (SELECT b, COUNT(*) AS c FROM fb WHERE lang <> 'en' GROUP BY 1),
        ts AS (SELECT COALESCE(SUM(c), 0) + 0.5 * {B} AS d FROM tm),
        rs AS (SELECT COALESCE(SUM(c), 0) + 0.5 * {B} AS d FROM rm),
        delta AS (
          SELECT fb.doc_id,
                 ln((COALESCE(tm.c, 0) + 0.5) / ts.d)
                 - ln((COALESCE(rm.c, 0) + 0.5) / rs.d) AS d
          FROM fb
          LEFT JOIN tm ON fb.b = tm.b
          LEFT JOIN rm ON fb.b = rm.b
          CROSS JOIN ts CROSS JOIN rs)
        SELECT t.doc_id,
               CAST(CASE WHEN len(t.toks) >= 2
                    THEN 2 * len(t.toks) - 1
                    ELSE len(t.toks) END AS INT) AS n_features,
               round(SUM(delta.d), 6) AS log_ratio
        FROM t LEFT JOIN delta ON t.doc_id = delta.doc_id
        GROUP BY t.doc_id, t.toks
        """).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0], k
        if want[k][1] is None:
            assert got[k][1] is None, k
        else:
            assert got[k][1] == pt.approx(want[k][1], abs=2e-6), k
