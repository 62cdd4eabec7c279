"""Winnowing fingerprints (Schleimer et al. 2003): planted ground
truth, the locality guarantee, normalization invariance, short-doc /
NULL edge cases, the boilerplate skew guard, and a bit-exact DuckDB
mirror on the testdata documents table."""

from __future__ import annotations

from web_api_postgres_etl_spark.operators.winnow import (
    winnow_candidates,
    winnow_dup_pairs,
    winnow_fingerprint_table,
)

K, W = 8, 4


def _docs(spark):
    return spark.createDataFrame(
        [
            ("a", "The quick brown fox jumps over the lazy dog"),
            ("b", "the QUICK brown fox!!   jumps-over the lazy dog"),
            ("c", "completely different content here with many words"),
            ("d", "short"),  # 5 normalized chars < k -> no fingerprints
            ("e", ""),
            ("f", None),
            ("g", "abcdefgh"),  # exactly one gram -> short-doc rule
            ("h", "Preamble text. completely different content here with many words"),
        ],
        "doc_id string, text string",
    )


def _mirror_sql(table: str, k: int = K, w: int = W) -> str:
    return f"""
WITH n AS (SELECT doc_id,
             regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
           FROM {table}),
h AS (SELECT doc_id, CASE WHEN len(s) >= {k}
        THEN list_transform(generate_series(1, len(s)-{k}+1),
             i -> CAST('0x'||substr(md5(substr(s,i,{k})),1,13) AS BIGINT))
        ELSE [] END AS hs FROM n),
w AS (SELECT doc_id, CASE WHEN len(hs) >= {w}
        THEN list_transform(generate_series(1, len(hs)-{w}+1),
             i -> list_min(list_slice(hs, i, i+{w}-1)))
      WHEN len(hs) > 0 THEN [list_min(hs)] ELSE [] END AS wins FROM h)
SELECT DISTINCT doc_id, unnest(wins) AS fp FROM w
"""


def test_normalization_invariance_and_edges(spark):
    fps = winnow_fingerprint_table(_docs(spark), "doc_id", "text", K, W)
    by_doc: dict[str, set[int]] = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # case/punct/whitespace variants select IDENTICAL fingerprints
    assert by_doc["a"] == by_doc["b"] and by_doc["a"]
    # sub-k / empty / NULL docs are absent
    assert not {"d", "e", "f"} & by_doc.keys()
    # single-gram doc selects exactly its one hash (short-doc rule)
    assert len(by_doc["g"]) == 1


def test_locality_guarantee(spark):
    # h contains c verbatim: a shared substring of length >= k+w-1
    # must yield >= 1 shared fingerprint (the winnowing guarantee) —
    # and here many, since the whole document is shared.
    pairs = winnow_dup_pairs(
        _docs(spark), "doc_id", "text", K, W, min_shared=2
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["shared"] for r in pairs}
    assert ("a", "b") in got and ("c", "h") in got
    assert all(s >= 2 for s in got.values())
    # unrelated docs never pair
    assert not any("g" in p for p in got)


def test_candidates_face_matches_pairs(spark):
    cands = {
        (r["id_a"], r["id_b"])
        for r in winnow_candidates(_docs(spark), "doc_id", "text", K, W).collect()
    }
    pairs1 = {
        (r["id_a"], r["id_b"])
        for r in winnow_dup_pairs(
            _docs(spark), "doc_id", "text", K, W, min_shared=1
        ).collect()
    }
    assert cands == pairs1 and ("a", "b") in cands


def test_max_fingerprint_df_skew_guard(spark):
    # one boilerplate sentence shared by ALL docs + unique tails: with
    # the guard at df<=2 every boilerplate fingerprint (df=4) drops,
    # and only the pair sharing a unique tail survives.
    boiler = "this site uses cookies to improve your experience"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} unique alpha tail one two three four five"),
            (2, f"{boiler} unique alpha tail one two three four five"),
            (3, f"{boiler} other content entirely distinct from peers"),
            (4, f"{boiler} yet another unrelated trailing sentence here"),
        ],
        "doc_id long, text string",
    )
    guarded = {
        (r["id_a"], r["id_b"])
        for r in winnow_dup_pairs(
            docs, "doc_id", "text", K, W, min_shared=1, max_fingerprint_df=2
        ).collect()
    }
    assert guarded == {(1, 2)}
    unguarded = {
        (r["id_a"], r["id_b"])
        for r in winnow_dup_pairs(
            docs, "doc_id", "text", K, W, min_shared=1
        ).collect()
    }
    # without the guard the boilerplate links every pair
    assert len(unguarded) == 6


def test_pins_contract(spark):
    from web_api_postgres_etl_spark.plans.curation import release_pins

    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    pins: list = []
    out = winnow_dup_pairs(
        _docs(spark), "doc_id", "text", K, W, min_shared=2, pins=pins
    )
    out.collect()
    assert pins  # the fingerprint persist was handed back
    release_pins(pins)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= before


def test_duckdb_mirror_on_testdata(spark, oracle):
    """Bit-exact fingerprint-table parity at sf0.01 (500 docs), then
    pair parity with the skew guard on."""
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["fp"])
        for r in winnow_fingerprint_table(docs, "doc_id", "text", K, W).collect()
    )
    want = sorted(map(tuple, oracle.sql(_mirror_sql("documents")).fetchall()))
    assert got == want and len(got) > 1000

    pair_sql = f"""
WITH fp AS ({_mirror_sql("documents")}),
df AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= 10),
k AS (SELECT f.doc_id, f.fp FROM fp f JOIN df USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
FROM k a JOIN k b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""
    got_p = sorted(
        (r["id_a"], r["id_b"], r["shared"])
        for r in winnow_dup_pairs(
            docs, "doc_id", "text", K, W, min_shared=2, max_fingerprint_df=10
        ).collect()
    )
    want_p = sorted(map(tuple, oracle.sql(pair_sql).fetchall()))
    assert got_p == want_p
