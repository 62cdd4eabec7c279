"""Exact-substring dedup (Lee et al. 2021 ExactSubstr semantics):
planted ground truth, all-occurrences removal, within-doc repeats,
min_count threshold, NULL totality, and a DuckDB oracle on the
testdata documents table."""

from __future__ import annotations

from web_api_postgres_etl_spark.operators.dedup import (
    duplicated_window_positions,
    exact_substring_dedup,
)

# a 6-word phrase planted in several documents
PHRASE = "licensed under the apache software foundation"
UNIQUE1 = "alpha beta gamma delta"
UNIQUE2 = "epsilon zeta eta theta"


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, f"{UNIQUE1} {PHRASE} {UNIQUE2}"),
            (2, f"{PHRASE} completely different trailing words here"),
            (3, "no duplicated content in this document at all"),
            (4, f"{PHRASE} {PHRASE} repeated twice back to back"),
            (5, None),
        ],
        "doc_id long, text string",
    )


def test_exact_substring_removes_all_occurrences(spark):
    out = {
        r["doc_id"]: (r["text"], r["n_words_removed"], r["n_dup_windows"])
        for r in exact_substring_dedup(
            _docs(spark), "doc_id", "text", k=6
        ).collect()
    }
    # the phrase is cut from EVERY doc containing it (all-occurrences)
    assert out[1][0] == f"{UNIQUE1} {UNIQUE2}"
    assert out[1][1] == 6
    assert out[2][0] == "completely different trailing words here"
    assert out[3] == ("no duplicated content in this document at all", 0, 0)
    # within-doc repetition: both copies cut (and the straddling
    # windows across the junction are themselves duplicated with the
    # doc-2 phrase only if identical — here only the 12 phrase words go)
    assert PHRASE.split()[0] not in (out[4][0] or "").split()
    assert out[5] == (None, 0, 0)


def test_short_docs_untouched(spark):
    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["text"]
        for r in exact_substring_dedup(docs, "doc_id", "text", k=6).collect()
    }
    # 2-word docs have no 6-word windows — identical but untouched
    assert out == {1: "tiny doc", 2: "tiny doc"}


def test_min_count_threshold(spark):
    out = {
        r["doc_id"]: r["n_words_removed"]
        for r in exact_substring_dedup(
            _docs(spark), "doc_id", "text", k=6, min_count=4
        ).collect()
    }
    # the phrase occurs 4 times corpus-wide (docs 1, 2, and 2x in 4):
    # min_count=4 still trips; min_count=5 must not
    assert out[1] == 6
    out5 = {
        r["doc_id"]: r["n_words_removed"]
        for r in exact_substring_dedup(
            _docs(spark), "doc_id", "text", k=6, min_count=5
        ).collect()
    }
    assert all(v == 0 for v in out5.values())


def test_duplicated_window_positions_audit(spark):
    got = {
        (r["doc_id"], r["pos"])
        for r in duplicated_window_positions(
            _docs(spark), "doc_id", "text", k=6
        ).collect()
    }
    assert (1, 5) in got     # phrase starts at word 5 in doc 1
    assert (2, 1) in got     # and at word 1 in doc 2
    assert (4, 1) in got and (4, 7) in got  # both in-doc copies


def test_exact_substring_oracle_parity(spark, oracle):
    """Full construction vs DuckDB on sf0.01 documents at k=8."""
    k = 8
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = sorted(
        (r["doc_id"], r["text"], int(r["n_words_removed"]),
         int(r["n_dup_windows"]))
        for r in exact_substring_dedup(
            docs.select("doc_id", "text"), "doc_id", "text", k=k
        ).collect()
    )
    want = sorted(
        (row[0], row[1], int(row[2]), int(row[3]))
        for row in oracle.execute(f"""
        WITH t AS (
          SELECT doc_id, text IS NOT NULL AS had,
                 list_filter(regexp_split_to_array(coalesce(text, ''),
                             '\\s+'), w -> w <> '') AS w
          FROM documents),
        wins AS (
          SELECT doc_id, w,
                 unnest(generate_series(1, greatest(len(w) - {k - 1}, 0))) AS pos
          FROM t),
        digs AS (
          SELECT doc_id, pos,
                 md5(array_to_string(list_slice(w, pos, pos + {k - 1}), ' ')) AS dg
          FROM wins),
        dup AS (SELECT dg FROM digs GROUP BY dg HAVING count(*) >= 2),
        ss AS (
          SELECT doc_id, list_sort(list(pos)) AS ss FROM digs
          WHERE dg IN (SELECT dg FROM dup) GROUP BY doc_id),
        j AS (
          SELECT t.doc_id, t.had, t.w,
                 coalesce(ss.ss, CAST([] AS BIGINT[])) AS ss
          FROM t LEFT JOIN ss USING (doc_id)),
        m AS (
          SELECT doc_id, had, len(w) AS n, len(ss) AS ndw,
                 list_filter(list_transform(generate_series(1, len(w)), j2 ->
                   CASE WHEN len(list_filter(ss,
                        s -> j2 >= s AND j2 <= s + {k - 1})) > 0
                        THEN NULL ELSE w[j2] END), x -> x IS NOT NULL) AS kept
          FROM j)
        SELECT doc_id,
               -- DuckDB's array_to_string([]) is NULL where Spark's
               -- concat_ws over an empty array is '' — coalesce inside
               -- the had-guard so fully-cut docs compare as ''
               CASE WHEN had
                    THEN coalesce(array_to_string(kept, ' '), '') END AS text,
               n - len(kept) AS n_words_removed,
               ndw AS n_dup_windows
        FROM m
        """).fetchall()
    )
    assert len(got) == len(want)
    assert got == want
    # sanity: the synthetic corpus must actually contain duplicated
    # windows, or this parity proves nothing
    assert any(r[3] > 0 for r in got)


def test_pathological_fully_duplicated_long_doc(spark):
    """Two identical 20k-word docs: every window is duplicated, so the
    duplicated-start list approaches the word count. The pre-round-6
    exists-per-word mask was O(words x dup-starts) interpreted
    (~4e8 lambda evaluations here — minutes); the interval-merge +
    gap-slice form collapses all starts into ONE merged interval and
    must finish in seconds."""
    import time

    n = 20_000
    body = " ".join(f"w{i % 977}x{i % 31}" for i in range(n))
    docs = spark.createDataFrame(
        [(1, body), (2, body)], "doc_id long, text string"
    )
    t0 = time.monotonic()
    out = {
        r["doc_id"]: (r["text"], r["n_words_removed"])
        for r in exact_substring_dedup(docs, "doc_id", "text", k=32).collect()
    }
    elapsed = time.monotonic() - t0
    assert out[1] == ("", n) and out[2] == ("", n)
    # generous bound: the quadratic form took minutes, this takes ~2s
    assert elapsed < 90, f"masking took {elapsed:.1f}s — quadratic regression?"


def test_pathological_scattered_duplicates(spark):
    """Many DISJOINT duplicated windows per doc (boilerplate sentences
    interleaved with unique text — templated listings): ~1200 merged
    intervals per document. An accumulator-fold merge is
    O(intervals^2) per row; the linear boundary-detection form must
    stay fast AND still cut exactly the planted segments."""
    import time

    k = 8
    # segment i: 8 shared words then 8 unique-per-doc words
    def doc(tag):
        parts = []
        for i in range(1200):
            parts.append(" ".join(f"shared{i}w{j}" for j in range(k)))
            parts.append(" ".join(f"{tag}u{i}w{j}" for j in range(k)))
        return " ".join(parts)

    docs = spark.createDataFrame(
        [(1, doc("a")), (2, doc("b"))], "doc_id long, text string"
    )
    t0 = time.monotonic()
    out = {
        r["doc_id"]: (r["text"], r["n_words_removed"])
        for r in exact_substring_dedup(docs, "doc_id", "text", k=k).collect()
    }
    elapsed = time.monotonic() - t0
    assert elapsed < 90, f"scattered-dup masking took {elapsed:.1f}s"
    # every shared segment cut from both docs, all unique words kept.
    # straddling windows (part shared / part unique) are NOT corpus-
    # duplicated, so exactly the 8 shared words per segment go
    for d, tag in ((1, "a"), (2, "b")):
        text, removed = out[d]
        assert removed == 1200 * k
        assert "shared" not in text
        assert f"{tag}u0w0" in text and f"{tag}u1199w7" in text
