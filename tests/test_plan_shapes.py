"""Physical-plan regression guards: the scale-critical queries must keep
their shapes — no cartesian/nested-loop joins outside the documented
exact baselines, broadcast joins on the star, bounded exchange counts.
Census is over the FINAL adaptive plan (AQE hides strategy changes until
execution), same method as tools/plan_audit.py."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"

# bounded-by-construction nested loops: query -> number of nested-loop
# joins its plan is ALLOWED (collocations crossJoins a broadcast 1-ROW
# totals frame, tfidf_table's N pattern — one constant-size loop; a
# SECOND loop appearing would be a real regression and still fails)
INTENTIONAL_BOUNDED = {"collocations": 1,
                       # the bloom gate IS a 1-row broadcast
                       # crossJoin + k bit probes by design —
                       # that single loop is the zero-fact-
                       # shuffle mechanism, not a hazard
                       "bloom_join_gate": 1,
                       # tfidf_table's 1-row corpus-N crossJoin
                       # appears once per weight-table consumer
                       # (norms + the self-join's two sides = 3)
                       # because the contract entry runs
                       # cache_weights=False to stay leak-free;
                       # each loop broadcasts ONE row. A 4th
                       # would be a real regression.
                       "tfidf_cosine_pairs": 3}
# run-to-produce streaming/pipeline entries — their plan is post-hoc
SKIP = {
    "pipeline_e2e", "t1_streaming_compact", "t4_stateful_stream",
    "t5_watermark_late_drop", "curation_pipeline", "cdc_table_apply",
}


def _final_plan(spark, name: str) -> str:
    df = em.queries()[name](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_no_unintended_cartesian_or_nested_loop(spark):
    offenders = {}
    for name in em.queries():
        if name in SKIP:
            continue
        plan = _final_plan(spark, name)
        n_loops = plan.count("CartesianProduct") + plan.count(
            "BroadcastNestedLoopJoin"
        )
        if n_loops > INTENTIONAL_BOUNDED.get(name, 0):
            offenders[name] = n_loops
    assert not offenders, offenders


def test_flagship_star_join_is_all_broadcast(spark):
    plan = _final_plan(spark, "flagship_star_join")
    assert len(re.findall(r"BroadcastHashJoin", plan)) == 4
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan  # fact never shuffles


def test_near_dup_pipeline_exchange_budget(spark):
    """The fused near-dup plan's shuffle count is part of its design
    (signature agg, banding self-join, pair distinct, verify joins);
    a regression that re-inlines the shingle subtree or loses the
    exchange reuse shows up as extra exchanges."""
    plan = _final_plan(spark, "near_dup_pipeline")
    n_exch = len(re.findall(r"\bExchange\b", plan))
    assert n_exch <= 7, f"near_dup_pipeline now has {n_exch} exchanges"


def test_scans_prune_columns(spark):
    """stg_transform reads a wide table but must scan only the columns
    it uses (ReadSchema pruning reached the parquet scan)."""
    df = em.queries()["stg_transform"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert scans, "no parquet FileScan in plan"
    for cols_str in scans:
        cols = [c for c in cols_str.split(",") if c]
        assert len(cols) <= 12, f"scan reads {len(cols)} columns: {cols_str}"
    assert "PushedFilters: [IsNotNull" in plan  # date window reached the scan


def test_classifier_scoring_is_shuffle_free(spark):
    """The 100 TB claim for model-based filtering is that scoring is
    map-only: featurize + broadcast-coefficient transform + filter,
    zero exchanges over the corpus."""
    from web_api_postgres_etl_spark.operators.classifier import (
        classifier_gate,
        train_quality_classifier,
    )

    pos = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string"
    )
    neg = spark.createDataFrame(
        [("buy buy buy cheap cheap cheap click click click",)], "text string"
    )
    model = train_quality_classifier(pos, neg, num_features=1 << 10)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    gated = classifier_gate(docs, "doc_id", "text", model, min_prob=0.0)
    gated.collect()
    plan = gated._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in plan, f"scoring shuffles:\n{plan}"
    assert "CartesianProduct" not in plan


def test_top_paths_rank_filter_precedes_collect(spark):
    """top_paths' 100 TB contract is O(max_steps) aggregation state per
    session: the row_number() <= max_steps filter must sit UPSTREAM of
    the collect_list aggregate in the physical plan (plan text prints
    top-down, so upstream = later in the string), otherwise one
    pathological never-gapping session rebuilds the unbounded buffer."""
    from web_api_postgres_etl_spark.operators.aggregates import top_paths

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    df = top_paths(ev, "user_id", "ts", "event_type", gap_seconds=1800,
                   max_steps=5)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    m = re.search(r"Filter \(?__rn#\d+ <= 5", plan)
    assert m, f"no rank filter in plan:\n{plan}"
    i_agg = plan.find("collect_list")
    assert 0 <= i_agg < m.start(), (
        f"rank filter not upstream of collect_list:\n{plan}"
    )


def test_upsample_is_narrow_and_mix_is_one_aggregate(spark):
    """upsample_by_factor must stay a pure narrow map (zero exchanges);
    temperature_sample's only exchanges are the tiny per-group count
    aggregate and its broadcast back — the corpus itself is never
    hash-partitioned."""
    from web_api_postgres_etl_spark.operators.sampling import (
        temperature_sample,
        upsample_by_factor,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source"
    )
    up = upsample_by_factor(docs, "source", "doc_id", {"web": 2.0})
    up.collect()
    up_plan = up._jdf.queryExecution().executedPlan().toString()
    up_plan = up_plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in up_plan, f"upsample shuffles:\n{up_plan}"

    mix = temperature_sample(docs, "source", "doc_id", alpha=0.5,
                             target_rows=100)
    mix.collect()
    mix_plan = mix._jdf.queryExecution().executedPlan().toString()
    mix_plan = mix_plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in mix_plan, f"mix sort-merges:\n{mix_plan}"
    n_exch = len(re.findall(r"\bExchange\b", mix_plan))
    assert n_exch <= 3, f"temperature_sample has {n_exch} exchanges"


def test_pq_adc_topk_scans_codes_without_shuffling(spark):
    """The PQ scale claim, pinned (entry retired from the driver
    window in r12 but kept benchward-stable): ADC ranking is one
    projection over the encoded corpus + TakeOrderedAndProject — ZERO
    exchanges (the corpus is never shuffled) and no join of any kind;
    a regression that materializes the codebook as a join or sorts
    globally shows up immediately."""
    df = em.q_pq_adc_topk(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan, "pq_adc_topk must not shuffle the corpus"
    assert "Join" not in plan


# NOTE: ivf_pq_nn_join's plan-shape claims (BroadcastHashJoin +
# dynamic partition pruning, index never shuffled) are asserted ON the
# driver path itself — q_ivf_pq_nn_join raises before returning if the
# pre-checkpoint plan regresses — and again in
# tests/test_dedup_similarity.py::test_ivf_pq_nn_join_matches_single_
# probe_per_query. The returned frame here is the post-checkpoint scan,
# so a plan pin at this layer would only see Scan ExistingRDD.
