"""Fuzzy (edit-distance) joins: deletion-neighborhood completeness vs
an all-pairs levenshtein oracle, typo ground truth, and the long-value
guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_api_postgres_etl_spark.operators.entity import (
    deletion_neighborhood,
    fuzzy_dup_pairs,
    fuzzy_join,
)


def test_fuzzy_join_typo_ground_truth(spark):
    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "globex"), (3, "initech")],
        "id long, name string",
    )
    right = spark.createDataFrame(
        [
            (10, "acme corp"),   # exact -> 0
            (11, "acme crop"),   # 2 substitutions -> k=2 only
            (12, "acme cor"),    # deletion -> 1
            (13, "acme corps"),  # insertion -> 1
            (14, "acme c0rp"),   # substitution -> 1
            (15, "initrode"),    # distance 3 from initech -> never
        ],
        "rid long, name string",
    )
    got1 = {
        (r["id"], r["rid"]): r["distance"]
        for r in fuzzy_join(
            left, right, "id", "rid", "name", "name", max_distance=1
        ).collect()
    }
    assert got1 == {(1, 10): 0, (1, 12): 1, (1, 13): 1, (1, 14): 1}
    got2 = {
        (r["id"], r["rid"]): r["distance"]
        for r in fuzzy_join(
            left, right, "id", "rid", "name", "name", max_distance=2
        ).collect()
    }
    assert got2[(1, 11)] == 2 and (3, 15) not in got2


def test_fuzzy_dup_pairs_complete_vs_allpairs_oracle(spark, oracle):
    """The deletion-neighborhood join must find EXACTLY the pairs an
    all-pairs levenshtein scan finds (lossless candidates, verified
    distances) — checked on the full customer table."""
    from tests.conftest import SF_ORACLE

    cust = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
    got = sorted(
        (r["id_a"], r["id_b"], r["distance"])
        for r in fuzzy_dup_pairs(
            cust, "c_custkey", "c_name", max_distance=1
        ).collect()
    )
    want = sorted(
        map(
            tuple,
            oracle.sql("""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       levenshtein(a.c_name, b.c_name) AS distance
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
""").fetchall(),
        )
    )
    assert got == want and len(got) > 100


def test_neighborhood_edges_and_guard(spark):
    df = spark.createDataFrame([("ab",), ("",), (None,)], "s string")
    rows = {
        r["s"]: r["nb"]
        for r in df.select(
            "s", deletion_neighborhood("s", 1).alias("nb")
        ).collect()
    }
    assert sorted(rows["ab"]) == ["a", "ab", "b"]
    assert rows[""] == [""]
    long = spark.createDataFrame([("x" * 100,)], "s string")
    with pytest.raises(Exception, match="longer than"):
        long.select(deletion_neighborhood("s", 1, max_len=64).alias("n")).collect()


def test_fuzzy_join_null_keys_never_match(spark):
    df = spark.createDataFrame([(1, None), (2, "ab")], "id long, name string")
    out = fuzzy_join(df, df, "id", "id", "name", "name", 1).collect()
    assert {(r["id_l"], r["id_r"]) for r in out} == {(2, 2)}


# ------------------------------------------------- entity resolution
def test_resolve_entities_planted_chain(spark):
    """Chained typos group transitively; isolated values stay
    singleton-canonical; entity_id is the min member id."""
    from web_api_postgres_etl_spark.operators.entity import resolve_entities

    df = spark.createDataFrame(
        [
            (1, "kathy"),
            (2, "cathy"),   # 1 sub from kathy
            (3, "cath"),    # 1 del from cathy (2 edits from kathy: chains)
            (4, "zebra"),   # isolated
            (5, "kathy"),   # exact duplicate of 1
        ],
        "cust_id long, name string",
    )
    out = {r.cust_id: (r.entity_id, r.is_canonical)
           for r in resolve_entities(df, "cust_id", "name").collect()}
    assert out == {
        1: (1, True), 2: (1, False), 3: (1, False),
        4: (4, True), 5: (1, False),
    }


def test_resolve_entities_matches_union_find_on_customers(spark):
    """Cluster labels == python union-find over the (separately
    completeness-proven) pair set, on the real customer names."""
    from web_api_postgres_etl_spark.operators.entity import (
        fuzzy_dup_pairs,
        resolve_entities,
    )

    cust = (
        spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
        .select("c_custkey", "c_name")
        .filter(F.col("c_custkey") <= 400)
    )
    pairs = [
        (r.id_a, r.id_b)
        for r in fuzzy_dup_pairs(cust, "c_custkey", "c_name").collect()
    ]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ids = [r.c_custkey for r in cust.collect()]
    want = {i: find(i) for i in ids}
    got = {
        r.c_custkey: r.entity_id
        for r in resolve_entities(cust, "c_custkey", "c_name").collect()
    }
    assert got == want
    assert len(pairs) > 0  # the customer names really do contain near-dups


def test_resolve_entities_null_id_raises(spark):
    import pytest

    from web_api_postgres_etl_spark.operators.entity import resolve_entities

    df = spark.createDataFrame(
        [(1, "kathy"), (None, "cathy")], "cust_id long, name string"
    )
    with pytest.raises(Exception, match="NULL cust_id"):
        resolve_entities(df, "cust_id", "name").collect()
