"""Pins for the r14 optimization-round internals (OPTIMIZATION_r14.md):

1. normalized_tokens single-pass fusion ≡ the original two-regex chain
   (the tokenizer feeds minhash/shingles, so ANY divergence flips
   dedup-family hashes — equivalence is pinned on an adversarial case
   set plus a real-corpus slice).
2. _plan_memoized: memo hits return the identical DataFrame object;
   the three persist-carrying HEADLINE queries and the side-effecting
   contract entries are NOT memoized (a reused plan would replay
   persisted intermediates across bench repeats — result caching, not
   construction reuse).
3. ensure_parallelism probe stamp: semantics unchanged (repartition
   when narrow, identity when wide), probe answer stamped once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as em
from web_api_postgres_etl_spark.functions.text import normalized_tokens
from web_api_postgres_etl_spark.operators.dedup import ensure_parallelism

SF_ORACLE = "/root/testdata/sf0.01"


def _old_tokens(c, lowercase=True):
    """The pre-r14 chain, verbatim: strip-to-space, collapse, trim,
    split-on-space, drop empties."""
    if lowercase:
        c = F.lower(c)
    cleaned = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    toks = F.split(F.trim(F.regexp_replace(cleaned, r"\s+", " ")), " ")
    return F.filter(toks, lambda t: t != "")


ADVERSARIAL = [
    "", " ", "a", "  a  ", "a b", "a,b", ",,a,,b,,", "héllo wörld",
    "a\tb\nc\rd", "ABC123", "!!!", None, "a" * 5000, " x ",
    "tab\there", "é combine", " nbsp sep", "1.5e9 foo_bar",
    "mixed CASE Text, with; punct!",
]


def test_tokenizer_fusion_equivalence_adversarial(spark):
    df = spark.createDataFrame([(x,) for x in ADVERSARIAL], "text string")
    bad = (
        df.select(
            _old_tokens(F.col("text")).alias("o"),
            normalized_tokens("text").alias("n"),
        )
        .filter(
            ~(
                (F.col("o").isNull() & F.col("n").isNull())
                | (F.col("o") == F.col("n"))
            )
        )
        .count()
    )
    assert bad == 0


def test_tokenizer_fusion_equivalence_real_corpus(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    bad = (
        docs.select(
            _old_tokens(F.col("text")).alias("o"),
            normalized_tokens("text").alias("n"),
        )
        .filter(~(F.col("o") == F.col("n")))
        .count()
    )
    assert bad == 0


def test_plan_memo_hit_returns_same_object(spark):
    a = em.q_flagship_star_join(spark, SF_ORACLE)
    b = em.q_flagship_star_join(spark, SF_ORACLE)
    assert a is b
    # distinct sf_dir -> distinct plan
    c = em.q_flagship_star_join(spark, "/root/testdata/sf0.001")
    assert c is not a


def test_persist_carrying_queries_not_memoized(spark):
    # the three exclusions construct FRESH per call so bench repeats
    # recompute from parquet instead of replaying persisted frames
    for name in ("near_dup_pipeline", "minhash_lsh_pairs", "lsh_cosine_pairs"):
        fn = getattr(em, f"q_{name}")
        assert not hasattr(fn, "__wrapped__"), name
        a = fn(spark, SF_ORACLE)
        b = fn(spark, SF_ORACLE)
        assert a is not b, name


def test_side_effecting_contract_entries_not_memoized():
    # streaming / sink / index-building constructions must re-run per
    # call (their replay semantics are the behavior under test)
    for name in (
        "t1_streaming_compact", "t4_stateful_stream",
        "t5_watermark_late_drop", "cdc_table_apply",
        "corpus_ingest_replay", "pipeline_e2e", "curation_pipeline",
        "training_data_e2e", "ivf_pq_probe_topk", "ivf_pq_nn_join",
        "ann_rerank_topk", "hybrid_retrieval",
    ):
        fn = getattr(em, f"q_{name}")
        assert not hasattr(fn, "__wrapped__"), name


def test_ensure_parallelism_stamp_semantics(spark):
    narrow = spark.range(10).coalesce(1)
    out = ensure_parallelism(narrow)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    assert narrow._sg_scan_parts == 1
    # stamped re-probe gives the same decision
    out2 = ensure_parallelism(narrow)
    assert out2.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    wide = spark.range(10).repartition(16)
    assert ensure_parallelism(wide) is wide
