"""Semantic-trap tests from SURVEY.md §7.4 — injected nulls/NaN,
zero denominators, last-wins ties, dotted names."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from web_api_postgres_etl_spark.functions.dates import jalali_compact_to_slashed
from web_api_postgres_etl_spark.functions.math import pct_change
from web_api_postgres_etl_spark.functions.arrays import first_element_field
from web_api_postgres_etl_spark.operators.dedup import dedup_last_wins
from web_api_postgres_etl_spark.operators.filters import drop_required_nulls, in_range
from web_api_postgres_etl_spark.operators.project import project, project_alias


def test_drop_required_nulls_drops_nan_and_null(spark):
    """SURVEY §7.4.3: pandas dropna removes NaN; Spark na.drop only
    nulls — our operator must drop BOTH for float columns."""
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, float("nan")), (4, 4.0)],
        "id long, price double",
    )
    out = drop_required_nulls(df, ["price"]).select("id").orderBy("id").collect()
    assert [r["id"] for r in out] == [1, 4]


def test_drop_required_nulls_dotted_columns(spark):
    df = spark.createDataFrame([(1, 10), (2, None)], "id long, `meta.version` long")
    out = drop_required_nulls(df, ["meta.version"]).collect()
    assert len(out) == 1 and out[0]["id"] == 1


def test_pct_change_zero_denominator_is_null(spark):
    """SURVEY §7.4.4: close == change → pandas inf, engine pins NULL."""
    df = spark.createDataFrame(
        [(1, 100.0, 20.0), (2, 50.0, 50.0)], "id long, close double, change double"
    )
    out = (
        df.select("id", pct_change("change", "close").alias("pct"))
        .orderBy("id")
        .collect()
    )
    assert math.isclose(out[0]["pct"], 0.25)
    assert out[1]["pct"] is None


def test_jalali_reformat_positions(spark):
    df = spark.createDataFrame([("14011225093000",)], "date_time string")
    out = df.select(jalali_compact_to_slashed("date_time").alias("j")).first()
    assert out["j"] == "1401/12/25"


def test_jalali_lexicographic_between(spark):
    """P5: zero-padded Jalali strings — lexicographic == chronological."""
    df = spark.createDataFrame(
        [("1398/12/29",), ("1399/01/01",), ("1400/07/15",), ("1402/01/01",)],
        "j_date string",
    )
    out = in_range(df, "j_date", "1399/01/01", "1401/12/29").collect()
    assert sorted(r["j_date"] for r in out) == ["1399/01/01", "1400/07/15"]


def test_dedup_last_wins_keeps_max_version_with_tiebreak(spark):
    """SURVEY §7.4.2: keep='last' after ORDER BY version — window form;
    equal versions broken deterministically by id DESC."""
    rows = [
        # (id, j_date, name, version)
        (1, "1401/01/01", "a", 5),
        (2, "1401/01/01", "a", 9),   # winner (higher version)
        (3, "1401/01/01", "b", 7),
        (4, "1401/01/01", "b", 7),   # tie on version → id DESC → 4 wins
    ]
    df = spark.createDataFrame(rows, "id long, j_date string, name string, `meta.version` long")
    out = dedup_last_wins(df, ["j_date", "name"], "meta.version", tiebreaker="id")
    got = {(r["name"]): r["id"] for r in out.collect()}
    assert got == {"a": 2, "b": 4}


def test_dedup_last_wins_idempotent(spark):
    rows = [(i, "d", "k", v) for i, v in enumerate([3, 1, 3, 2])]
    df = spark.createDataFrame(rows, "id long, j_date string, name string, `meta.version` long")
    once = dedup_last_wins(df, ["j_date", "name"], "meta.version")
    twice = dedup_last_wins(once, ["j_date", "name"], "meta.version")
    assert once.collect() == twice.collect()


def test_first_element_field_and_null_safety(spark):
    """F3 — row-correct array extraction (reference's loop misaligns
    after dropna, SURVEY §7.4.8; ours is positionally exact)."""
    df = spark.createDataFrame(
        [
            (1, [{"id": "c1", "x": "y"}]),
            (2, []),
            (3, None),
            (4, [{"id": "c9", "x": "z"}, {"id": "c2", "x": "w"}]),
        ],
        "id long, categories array<struct<id:string,x:string>>",
    )
    out = {
        r["id"]: r["cat"]
        for r in df.select(
            "id", first_element_field("categories", "id").alias("cat")
        ).collect()
    }
    assert out == {1: "c1", 2: None, 3: None, 4: "c9"}


def test_project_and_alias_with_dotted_names(spark):
    df = spark.createDataFrame(
        [(1, "i1", 3)], "id long, `instrument.id` string, `meta.version` long"
    )
    p = project(df, ["meta.version", "id"])
    assert p.columns == ["meta.version", "id"]
    a = project_alias(df, {"company.id": "instrument.id", "version": "meta.version"})
    assert a.columns == ["company.id", "version"]
    assert a.first()["company.id"] == "i1"


def test_corpus_stats_sketches_track_exact_values(spark):
    """The one-pass sketch profile must agree with exact computations
    within sketch tolerance (HLL rsd 5%, quantile sketch default
    accuracy) on the sf0.01 documents table."""
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.functions.text import token_count
    from web_api_postgres_etl_spark.operators.aggregates import corpus_stats

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    row = corpus_stats(docs, "doc_id", "text").collect()[0]
    n = docs.count()
    assert row["n_docs"] == n
    exact_distinct = docs.select("text").distinct().count()
    assert abs(row["approx_distinct_docs"] - exact_distinct) <= 0.1 * exact_distinct
    exact_total = docs.select(
        F.sum(token_count("text")).alias("t")
    ).collect()[0]["t"]
    assert row["total_tokens"] == exact_total
    p50, p90, p99 = row["token_quantiles"]
    nts = sorted(
        r["n"] for r in docs.select(token_count("text").alias("n")).collect()
    )
    assert abs(p50 - nts[len(nts) // 2]) <= max(3, 0.1 * nts[len(nts) // 2])
    assert p50 <= p90 <= p99 <= nts[-1]


def test_corpus_stats_grouped(spark):
    from web_api_postgres_etl_spark.operators.aggregates import corpus_stats

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rows = corpus_stats(docs, "doc_id", "text", group_col="lang").collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert len(rows) == docs.select("lang").distinct().count()


def test_corpus_diff_statuses(spark, oracle):
    """Keyed snapshot diff vs a DuckDB mirror on the documents table:
    odds removed, evens kept, every 10th changed, new ids added."""
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.dedup import corpus_diff

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    old = docs.select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 10 == 0,
                   F.concat(F.coalesce(F.col("text"), F.lit("")),
                            F.lit(" edited")))
            .otherwise(F.col("text")).alias("text"),
        )
        .union(spark.createDataFrame(
            [(100001, "a brand new document"), (100002, None)],
            "doc_id long, text string"))
    )
    got = sorted(
        (r["doc_id"], r["status"])
        for r in corpus_diff(old, new, "doc_id", "text").collect()
    )
    want = sorted(
        (row[0], row[1])
        for row in oracle.execute("""
        WITH o AS (SELECT doc_id, md5(text) AS h FROM documents),
        n AS (
          SELECT doc_id,
                 md5(CASE WHEN doc_id % 10 = 0
                          THEN coalesce(text, '') || ' edited'
                          ELSE text END) AS h
          FROM documents WHERE doc_id % 2 = 0
          UNION ALL
          SELECT 100001, md5('a brand new document')
          UNION ALL SELECT 100002, md5(CAST(NULL AS VARCHAR)))
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.h IS NOT DISTINCT FROM n.h THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM o FULL OUTER JOIN n USING (doc_id)
        """).fetchall()
    )
    assert got == want
    by = {}
    for _, st in got:
        by[st] = by.get(st, 0) + 1
    assert by["added"] == 2 and by["changed"] > 0 and by["removed"] > 0


def test_corpus_diff_null_text_transitions(spark):
    from web_api_postgres_etl_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, "now has text"), (3, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new, "doc_id", "text").collect()}
    # NULL → NULL is unchanged; NULL ↔ text is a change either way
    assert got == {1: "unchanged", 2: "changed", 3: "changed"}


# ------------------------------------------------------------------ funnel
def test_funnel_planted_semantics(spark):
    """Order matters, equal timestamps don't advance, missing first
    step zeroes the chain, counts are non-increasing."""
    from web_api_postgres_etl_spark.operators.aggregates import funnel

    rows = [
        # u1: clean view -> click -> buy
        (1, "view", 10), (1, "click", 20), (1, "buy", 30),
        # u2: click BEFORE view -> stalls after view
        (2, "click", 5), (2, "view", 10),
        # u3: click at the SAME instant as view -> strictly-after fails
        (3, "view", 10), (3, "click", 10),
        # u4: never views; click+buy alone must not count anywhere
        (4, "click", 1), (4, "buy", 2),
        # u5: view then buy (skips click) -> stalls after view
        (5, "view", 1), (5, "buy", 9),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    out = {
        (r["step_idx"], r["step"]): r["n_users"]
        for r in funnel(df, "user_id", "ts", "event_type",
                        ["view", "click", "buy"]).collect()
    }
    assert out == {(0, "view"): 4, (1, "click"): 1, (2, "buy"): 1}

    import pytest as pt

    with pt.raises(ValueError, match="at least one step"):
        funnel(df, "user_id", "ts", "event_type", [])


def test_funnel_oracle_parity_on_events(spark, oracle):
    from web_api_postgres_etl_spark.operators.aggregates import funnel

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    steps = ["view", "click", "signup", "purchase"]
    got = sorted(
        tuple(r) for r in funnel(
            events, "user_id", "ts", "event_type", steps
        ).collect()
    )
    want = sorted(
        tuple(row) for row in oracle.execute("""
        WITH s0 AS (
          SELECT user_id AS u, min(ts) AS t FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        s1 AS (
          SELECT e.user_id AS u, min(e.ts) AS t FROM events e
          JOIN s0 ON e.user_id = s0.u AND e.ts > s0.t
          WHERE e.event_type = 'click' GROUP BY e.user_id),
        s2 AS (
          SELECT e.user_id AS u, min(e.ts) AS t FROM events e
          JOIN s1 ON e.user_id = s1.u AND e.ts > s1.t
          WHERE e.event_type = 'signup' GROUP BY e.user_id),
        s3 AS (
          SELECT e.user_id AS u, min(e.ts) AS t FROM events e
          JOIN s2 ON e.user_id = s2.u AND e.ts > s2.t
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT CAST(0 AS INT) AS step_idx, 'view' AS step,
               (SELECT count(*) FROM s0) AS n_users
        UNION ALL SELECT 1, 'click', (SELECT count(*) FROM s1)
        UNION ALL SELECT 2, 'signup', (SELECT count(*) FROM s2)
        UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)
        """).fetchall()
    )
    assert got == want
    by_idx = dict((i, n) for i, _, n in got)
    assert all(by_idx[i] >= by_idx[i + 1] for i in range(3))
    assert by_idx[0] > 0


def test_funnel_users_drilldown(spark):
    """Per-user deepest stage agrees with the counts form: n_users at
    step i equals the number of users whose max_step_idx >= i."""
    from web_api_postgres_etl_spark.operators.aggregates import (
        funnel,
        funnel_users,
    )

    rows = [
        (1, "view", 10), (1, "click", 20), (1, "buy", 30),
        (2, "click", 5), (2, "view", 10),
        (3, "view", 10), (3, "click", 10),
        (4, "click", 1), (4, "buy", 2),
        (5, "view", 1), (5, "buy", 9),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts long")
    steps = ["view", "click", "buy"]
    users = {
        r["user_id"]: (r["max_step_idx"], r["max_step"], r["completed_at"])
        for r in funnel_users(df, "user_id", "ts", "event_type", steps).collect()
    }
    assert users == {
        1: (2, "buy", 30),
        2: (0, "view", 10),
        3: (0, "view", 10),
        5: (0, "view", 1),
    }
    # consistency with the counts form: n_users at step i == number of
    # users whose max_step_idx >= i
    counts = {
        r["step_idx"]: r["n_users"]
        for r in funnel(df, "user_id", "ts", "event_type", steps).collect()
    }
    for i in range(len(steps)):
        assert counts[i] == sum(1 for v in users.values() if v[0] >= i)


# ------------------------------------------------------- skew profile
def test_key_skew_profile_ground_truth(spark):
    import pytest
    from web_api_postgres_etl_spark.operators.aggregates import key_skew_profile

    rows = (
        [("hot",)] * 6 + [("warm",)] * 3 + [("a",)] + [("b",)] + [(None,)]
    )
    df = spark.createDataFrame(rows, "k string")
    prof = key_skew_profile(df, ["k"], top_k=3).collect()
    # 5 distinct keys (NULL is a group), 12 rows total
    assert [(r.k, r.n_rows) for r in prof] == [("hot", 6), ("warm", 3), (None, 1)]
    hot = prof[0]
    assert hot.share == 6 / 12
    assert hot.cum_share == 6 / 12
    assert hot.over_mean == 6 * 5 / 12
    assert prof[1].cum_share == 9 / 12
    # NULL sorts before other count-1 keys (nulls-first tiebreak)
    assert prof[2].k is None and prof[2].cum_share == 10 / 12
    with pytest.raises(ValueError, match="at least one key"):
        key_skew_profile(df, [])
    with pytest.raises(ValueError, match="collide"):
        key_skew_profile(df.withColumnRenamed("k", "n_rows"), ["n_rows"])


SQL_SKEW_EVENTS = """
WITH counts AS (SELECT user_id, count(*) AS n_rows FROM events GROUP BY 1),
tot AS (SELECT sum(n_rows) AS t, count(*) AS nk FROM counts),
top AS (SELECT * FROM counts ORDER BY n_rows DESC, user_id ASC LIMIT 20)
SELECT user_id, n_rows,
       n_rows / t AS share,
       sum(n_rows) OVER (ORDER BY n_rows DESC, user_id ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t
         AS cum_share,
       n_rows * nk / t AS over_mean
FROM top, tot
"""


def test_key_skew_profile_oracle_parity(spark, oracle):
    from web_api_postgres_etl_spark.operators.aggregates import key_skew_profile

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    prof = key_skew_profile(events, ["user_id"], top_k=20)
    s_rows = [
        (r.user_id, r.n_rows, r.share, r.cum_share, r.over_mean)
        for r in prof.collect()
    ]
    d_rows = [tuple(r) for r in oracle.execute(SQL_SKEW_EVENTS).fetchall()]
    # deterministic order AND bit-exact ratios (integer cumsum, one division)
    assert s_rows == d_rows
    assert len(s_rows) == 20


# ----------------------------------------- incremental aggregation
def test_incremental_agg_equals_full_recompute(spark):
    """State(batch1) ⊕ State(batch2) finalized == one-shot aggregate
    over the union — on integer-valued doubles the sums are exact, so
    the equality is bit-for-bit, not approximate."""
    from web_api_postgres_etl_spark.operators.aggregates import (
        finalize_agg,
        incremental_agg_state,
        merge_agg_state,
    )

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    spec = dict(
        keys=["l_returnflag", "l_linestatus"],
        sum_cols=["l_quantity"],
        min_cols=["l_extendedprice"],
        max_cols=["l_extendedprice"],
    )
    b1 = li.filter(F.col("l_orderkey") % 2 == 0)
    b2 = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = merge_agg_state(
        incremental_agg_state(b1, **spec), incremental_agg_state(b2, **spec),
        keys=spec["keys"],
    )
    got = finalize_agg(merged, avg_of=["l_quantity"])
    want = finalize_agg(
        incremental_agg_state(li, **spec), avg_of=["l_quantity"]
    )
    canon = lambda df: sorted(map(tuple, df.select(sorted(df.columns)).collect()))
    assert canon(got) == canon(want)
    # merge is commutative
    flipped = merge_agg_state(
        incremental_agg_state(b2, **spec), incremental_agg_state(b1, **spec),
        keys=spec["keys"],
    )
    assert canon(finalize_agg(flipped, avg_of=["l_quantity"])) == canon(want)


def test_incremental_agg_null_semantics(spark):
    from web_api_postgres_etl_spark.operators.aggregates import (
        finalize_agg,
        incremental_agg_state,
        merge_agg_state,
    )
    import pytest

    df1 = spark.createDataFrame(
        [("a", None), ("a", 4.0), ("b", None)], "k string, v double"
    )
    df2 = spark.createDataFrame([("a", 2.0), ("b", None)], "k string, v double")
    s = merge_agg_state(
        incremental_agg_state(df1, ["k"], sum_cols=["v"]),
        incremental_agg_state(df2, ["k"], sum_cols=["v"]),
        ["k"],
    )
    rows = {r.k: r for r in finalize_agg(s, avg_of=["v"]).collect()}
    # a: 3 rows, 2 non-null -> avg 3.0; b: all-null -> avg NULL not 0/0
    assert (rows["a"].n_rows, rows["a"].cnt_v, rows["a"].avg_v) == (3, 2, 3.0)
    assert (rows["b"].n_rows, rows["b"].cnt_v, rows["b"].avg_v) == (2, 0, None)
    # schema mismatch fails loudly
    other = incremental_agg_state(df1, ["k"], sum_cols=["v"], min_cols=["v"])
    with pytest.raises(ValueError, match="schemas differ"):
        merge_agg_state(s, other, ["k"])


# ------------------------------------------------- event transitions
def test_event_transitions_ground_truth(spark):
    import datetime as dt
    from web_api_postgres_etl_spark.operators.aggregates import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # u1: a -> b -> a ; u2: a -> b ; u3: single event (no pairs)
        (1, t0, "a"), (1, t0 + dt.timedelta(minutes=1), "b"),
        (1, t0 + dt.timedelta(minutes=2), "a"),
        (2, t0, "a"), (2, t0 + dt.timedelta(minutes=1), "b"),
        (3, t0, "z"),
        # u4: NULL event is a real state
        (4, t0, None), (4, t0 + dt.timedelta(minutes=1), "a"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        (r.from_event, r.to_event): (r.n_transitions, r.p)
        for r in event_transitions(df).collect()
    }
    assert got == {
        ("a", "b"): (2, 1.0),
        ("b", "a"): (1, 1.0),
        (None, "a"): (1, 1.0),
    }


SQL_TRANSITIONS = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS from_event,
         lag(1) OVER (PARTITION BY user_id ORDER BY ts) AS has_prev,
         event_type AS to_event
  FROM events
), counted AS (
  SELECT from_event, to_event, count(*) AS n_transitions
  FROM pairs WHERE has_prev IS NOT NULL GROUP BY 1, 2
)
SELECT from_event, to_event, n_transitions,
       n_transitions / sum(n_transitions) OVER (PARTITION BY from_event) AS p
FROM counted
"""


def test_event_transitions_oracle_parity(spark, oracle):
    from web_api_postgres_etl_spark.operators.aggregates import event_transitions

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = sorted(
        (r.from_event, r.to_event, r.n_transitions, r.p)
        for r in event_transitions(events).collect()
    )
    want = sorted(tuple(r) for r in oracle.execute(SQL_TRANSITIONS).fetchall())
    assert got == want
    # probabilities per from-state sum to 1 exactly-ish (sanity)
    import collections
    by_from = collections.defaultdict(float)
    for f, t, n, p in got:
        by_from[f] += p
    assert all(abs(v - 1.0) < 1e-9 for v in by_from.values())


def test_incremental_agg_distinct_sketches(spark):
    """DISTINCT is not algebraic — HLL sketches make it mergeable:
    the merge is deterministic and order-free (flipped merge == merge),
    and both merged and one-shot estimates land within ~3% of truth
    (they may differ from EACH OTHER slightly: the one-shot sketch's
    HIP estimator is discarded by union, by DataSketches design)."""
    from web_api_postgres_etl_spark.operators.aggregates import (
        finalize_agg,
        incremental_agg_state,
        merge_agg_state,
    )

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    spec = dict(keys=["l_returnflag"], distinct_cols=["l_partkey"])
    b1 = li.filter(F.col("l_orderkey") % 2 == 0)
    b2 = li.filter(F.col("l_orderkey") % 2 == 1)
    merged = finalize_agg(
        merge_agg_state(
            incremental_agg_state(b1, **spec),
            incremental_agg_state(b2, **spec),
            keys=spec["keys"],
        ),
        distinct_of=["l_partkey"],
    )
    oneshot = finalize_agg(
        incremental_agg_state(li, **spec), distinct_of=["l_partkey"]
    )
    flipped = finalize_agg(
        merge_agg_state(
            incremental_agg_state(b2, **spec),
            incremental_agg_state(b1, **spec),
            keys=spec["keys"],
        ),
        distinct_of=["l_partkey"],
    )
    got = {r.l_returnflag: r.n_distinct_l_partkey for r in merged.collect()}
    assert got == {
        r.l_returnflag: r.n_distinct_l_partkey for r in flipped.collect()
    }  # merge order never matters
    oneshot_est = {
        r.l_returnflag: r.n_distinct_l_partkey for r in oneshot.collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for k in exact:
        assert abs(got[k] - exact[k]) / exact[k] < 0.03, (k, got[k], exact[k])
        assert abs(oneshot_est[k] - exact[k]) / exact[k] < 0.03


def test_exact_percentiles_oracle_parity(spark, oracle):
    """PERCENTILE_CONT linear interpolation matches DuckDB's
    quantile_cont bit-for-bit on the same doubles (sort + one
    interpolation — no fold-order ambiguity); NULL groups total."""
    from web_api_postgres_etl_spark.operators.aggregates import exact_percentiles

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    got = {
        r.l_returnflag: (r.p_0_5, r.p_0_9, r.p_0_99)
        for r in exact_percentiles(
            li, "l_extendedprice", [0.5, 0.9, 0.99], by=["l_returnflag"]
        ).collect()
    }
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in oracle.execute(
            """
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.5),
                   quantile_cont(l_extendedprice, 0.9),
                   quantile_cont(l_extendedprice, 0.99)
            FROM lineitem GROUP BY 1
            """
        ).fetchall()
    }
    assert got == want

    import pytest

    with pytest.raises(ValueError, match="within"):
        exact_percentiles(li, "l_extendedprice", [1.5])
    # all-NULL group -> NULL percentile, group still present
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None)], "k string, v double"
    )
    rows = {r.k: r.p_0_5 for r in exact_percentiles(df, "v", [0.5], by=["k"]).collect()}
    assert rows == {"a": 2.0, "b": None}


def test_funnel_conversion_window(spark, oracle):
    """within_seconds: later stages count only inside the horizon of
    the user's FIRST step-0 event (planted semantics + DuckDB mirror
    on events with a 2-hour window)."""
    import datetime as dt

    from web_api_postgres_etl_spark.operators.aggregates import (
        funnel,
        funnel_users,
    )

    t0 = dt.datetime(2024, 1, 1)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    rows = [
        # u1 converts inside the 60-min window
        (1, m(0), "view"), (1, m(10), "click"),
        # u2's click lands after the window -> stuck at view
        (2, m(0), "view"), (2, m(90), "click"),
        # u3: earliest view anchors; the click is within 60min of the
        # SECOND view but not the first -> not re-anchored, stuck
        (3, m(0), "view"), (3, m(100), "view"), (3, m(120), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.step: r.n_users
        for r in funnel(
            df, "user_id", "ts", "event_type", ["view", "click"],
            within_seconds=3600,
        ).collect()
    }
    assert got == {"view": 3, "click": 1}
    deep = {
        r.user_id: r.max_step
        for r in funnel_users(
            df, "user_id", "ts", "event_type", ["view", "click"],
            within_seconds=3600,
        ).collect()
    }
    assert deep == {1: "click", 2: "view", 3: "view"}
    # no window == original semantics
    got_open = {
        r.step: r.n_users
        for r in funnel(df, "user_id", "ts", "event_type", ["view", "click"]).collect()
    }
    assert got_open == {"view": 3, "click": 3}

    # mirror on the real events table, 2h window
    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    steps = ["view", "click", "purchase"]
    gotw = sorted(
        tuple(r)
        for r in funnel(
            events, "user_id", "ts", "event_type", steps, within_seconds=7200
        ).collect()
    )
    want = sorted(
        tuple(row)
        for row in oracle.execute(
            """
        WITH s0 AS (
          SELECT user_id AS u, min(ts) AS t FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        s1 AS (
          SELECT e.user_id AS u, min(e.ts) AS t, min(s0.t) AS a FROM events e
          JOIN s0 ON e.user_id = s0.u AND e.ts > s0.t
           AND epoch_us(e.ts) <= epoch_us(s0.t) + CAST(7200 AS BIGINT) * 1000000
          WHERE e.event_type = 'click' GROUP BY e.user_id),
        s2 AS (
          SELECT e.user_id AS u, min(e.ts) AS t FROM events e
          JOIN s1 ON e.user_id = s1.u AND e.ts > s1.t
           AND epoch_us(e.ts) <= epoch_us(s1.a) + CAST(7200 AS BIGINT) * 1000000
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT CAST(0 AS INT) AS step_idx, 'view' AS step,
               (SELECT count(*) FROM s0) AS n_users
        UNION ALL SELECT 1, 'click', (SELECT count(*) FROM s1)
        UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM s2)
        """
        ).fetchall()
    )
    assert gotw == want


def test_funnel_and_percentile_validation(spark):
    """Review regressions: within_seconds<=0 raises (zero window is
    unsatisfiable with strictly-after, silently yielding 0 conversions);
    duplicate probs and name-collision probs raise at the API."""
    import pytest

    from web_api_postgres_etl_spark.operators.aggregates import (
        exact_percentiles,
        funnel,
    )

    df = spark.createDataFrame([(1, None, "a")], "user_id long, ts timestamp, event_type string")
    with pytest.raises(ValueError, match="must be positive"):
        funnel(df, "user_id", "ts", "event_type", ["a"], within_seconds=0)
    vals = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="distinct"):
        exact_percentiles(vals, "v", [0.5, 0.5])
    # scientific-notation probs get column-safe names
    out = exact_percentiles(vals, "v", [1e-05])
    assert out.columns == ["p_1e_05"]
    assert out.first()["p_1e_05"] == 1.0


SQL_TOPK_GROUP = """
WITH ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY l_returnflag
    ORDER BY l_extendedprice DESC NULLS LAST, l_orderkey ASC, l_linenumber ASC
  ) AS rank
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice, rank
FROM ranked WHERE rank <= 5
"""


def test_topk_per_group_oracle_parity(spark, oracle):
    import pytest

    from web_api_postgres_etl_spark.operators.aggregates import topk_per_group

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    got = sorted(
        (r.l_orderkey, r.l_linenumber, r.l_returnflag, r.l_extendedprice, r.rank)
        for r in topk_per_group(
            li, ["l_returnflag"], "l_extendedprice", 5,
            tiebreakers=["l_orderkey", "l_linenumber"],
        ).select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice", "rank"
        ).collect()
    )
    want = sorted(tuple(r) for r in oracle.execute(SQL_TOPK_GROUP).fetchall())
    assert got == want and len(got) == 15  # 3 flags x 5

    with pytest.raises(ValueError, match="k must be"):
        topk_per_group(li, ["l_returnflag"], "l_extendedprice", 0)
    # NULL order values never make the top
    df = spark.createDataFrame(
        [("g", None), ("g", 1.0), ("g", 2.0)], "k string, v double"
    )
    top = topk_per_group(df, ["k"], "v", 2, tiebreakers=["v"]).collect()
    assert sorted((r.v, r.rank) for r in top) == [(1.0, 2), (2.0, 1)]


def test_topk_per_group_null_exclusion_and_guards(spark):
    """Review regression: NULL order values are EXCLUDED (a group of
    only-NULLs emits nothing; short groups don't backfill with NULLs),
    and empty keys raise instead of single-partitioning the table."""
    import pytest

    from web_api_postgres_etl_spark.operators.aggregates import topk_per_group

    df = spark.createDataFrame(
        [("g", None), ("h", None), ("h", 1.0)], "k string, v double"
    )
    got = [(r.k, r.v, r.rank) for r in topk_per_group(df, ["k"], "v", 2).collect()]
    assert got == [("h", 1.0, 1)]
    with pytest.raises(ValueError, match="group keys"):
        topk_per_group(df, [], "v", 1)


def test_sample_exact_tolerates_rank_column(spark):
    """Review regression: grouped sampling uses an internal __rank, so
    frames already carrying a 'rank' column pass through."""
    from web_api_postgres_etl_spark.operators.sampling import sample_exact

    df = spark.createDataFrame(
        [(1, "a", 9), (2, "a", 8), (3, "b", 7)], "doc_id long, lang string, rank long"
    )
    out = sample_exact(df, 1, "doc_id", by="lang")
    assert out.count() == 2  # one per group, rank column intact
    assert "rank" in out.columns


# -------------------------------------------------------- top paths
def test_top_paths_planted_and_mirror(spark, oracle):
    """Planted journeys recover; truncation and ties are pinned; the
    full computation matches a DuckDB mirror on the events table."""
    import datetime as dt

    from web_api_postgres_etl_spark.operators.aggregates import top_paths

    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)
    rows = [
        # u1: two sessions (gap 100s > 60s): [a,b] then [a,b]
        (1, s(0), "a"), (1, s(10), "b"),
        (1, s(200), "a"), (1, s(210), "b"),
        # u2: one session [a,b]
        (2, s(0), "a"), (2, s(5), "b"),
        # u3: equal-ts batch -> step-value tiebreak pins [x, y]
        (3, s(0), "y"), (3, s(0), "x"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, e string")
    got = [
        (tuple(r["path"]), r["n_sessions"])
        for r in top_paths(df, "user_id", "ts", "e", gap_seconds=60, k=5).collect()
    ]
    assert got == [(("a", "b"), 3), (("x", "y"), 1)]

    # truncation folds long sessions and reports the untruncated length
    longrows = [(9, s(i), "z") for i in range(5)]
    df2 = spark.createDataFrame(longrows, "user_id long, ts timestamp, e string")
    r = top_paths(df2, "user_id", "ts", "e", gap_seconds=60, max_steps=3).first()
    assert tuple(r["path"]) == ("z", "z", "z") and r["max_session_events"] == 5

    import pytest as _pt
    with _pt.raises(ValueError, match="k must"):
        top_paths(df, "user_id", "ts", "e", 60, k=0)
    with _pt.raises(ValueError, match="max_steps"):
        top_paths(df, "user_id", "ts", "e", 60, max_steps=0)

    # pathological never-gapping session: one bot user emitting an event
    # per second for 100k seconds never hits the inactivity gap — the
    # bounded-state rewrite must still answer (rank-filter BEFORE the
    # collect_list; the old form built one 100k-struct array in a single
    # aggregation buffer)
    burst = spark.range(100_000).select(
        F.lit(7).alias("user_id"),
        F.timestamp_seconds(F.lit(1_704_067_200) + F.col("id")).alias("ts"),
        F.lit("z").alias("e"),
    )
    rb = top_paths(burst, "user_id", "ts", "e", gap_seconds=60,
                   max_steps=5).first()
    assert tuple(rb["path"]) == ("z",) * 5
    assert rb["n_sessions"] == 1 and rb["max_session_events"] == 100_000

    # events-table mirror: 30-minute sessions, first 5 steps, top 10
    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    got2 = [
        (tuple(r["path"]), r["n_sessions"], r["max_session_events"])
        for r in top_paths(
            events, "user_id", "ts", "event_type",
            gap_seconds=1800, k=10, max_steps=5,
        ).collect()
    ]
    want = [
        (tuple(p), n, m)
        for p, n, m in oracle.execute("""
            WITH ev AS (
              SELECT user_id, epoch_us(ts) AS t, event_type,
                     lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY epoch_us(ts)) AS p
              FROM events WHERE ts IS NOT NULL),
            lab AS (
              SELECT user_id, t, event_type,
                CAST(sum(CASE WHEN t - p >= 1800000000
                         THEN 1 ELSE 0 END) OVER
                  (PARTITION BY user_id ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS INT) AS s
              FROM ev),
            per AS (
              SELECT user_id, s,
                     list_transform(
                       list_sort(list(ROW(t, event_type))),
                       x -> x[2])[1:5] AS path,
                     count(*) AS len
              FROM lab GROUP BY user_id, s)
            SELECT path, count(*) AS n_sessions,
                   max(len) AS max_session_events
            FROM per GROUP BY path
            ORDER BY n_sessions DESC, path ASC LIMIT 10
        """).fetchall()
    ]
    assert got2 == want and len(got2) == 10


# ------------------------------------------------------ MAD outliers
def test_mad_outliers_planted_and_mirror(spark, oracle):
    from web_api_postgres_etl_spark.operators.aggregates import mad_outliers

    rows = (
        [(1, float(i)) for i in range(1, 12)]     # k=1: 1..11, tight
        + [(1, 1000.0)]                           # planted spike
        + [(2, 5.0)] * 6                          # k=2: degenerate (MAD 0)
        + [(2, None)]                             # NULL rides along
        + [(None, float(i)) for i in range(1, 12)]  # NULL group key
        + [(None, -900.0)]                        # spike in NULL group
    )
    df = spark.createDataFrame(rows, "k long, v double")
    out = mad_outliers(df, "v", by=["k"]).collect()
    assert len(out) == len(rows)                  # labeling is TOTAL
    spikes = [r for r in out if r["is_outlier"]]
    # the NULL group is a group like any other: its spike is labeled
    assert sorted(
        ((r["k"], r["v"]) for r in spikes), key=repr
    ) == [(1, 1000.0), (None, -900.0)]
    by_kv = {(r["k"], r["v"]): r for r in out}
    assert by_kv[(2, 5.0)]["robust_z"] is None    # MAD 0 -> NULL z
    assert by_kv[(2, None)]["is_outlier"] is False

    # mirror on events.value per user: identical z to DuckDB (exact
    # medians, one fixed-order float expression)
    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "user_id", "value"
    )
    got = sorted(
        (r["event_id"], repr(r["robust_z"]), r["is_outlier"])
        for r in mad_outliers(events, "value", by=["user_id"]).collect()
    )
    want = sorted(
        (e, repr(z), o)
        for e, z, o in oracle.execute("""
            WITH med AS (
              SELECT user_id,
                     quantile_cont(CAST(value AS DOUBLE), 0.5) AS m
              FROM events GROUP BY user_id),
            dev AS (
              SELECT e.event_id, e.user_id,
                     CAST(e.value AS DOUBLE) AS v, med.m
              FROM events e LEFT JOIN med USING (user_id)),
            mad AS (
              SELECT user_id, quantile_cont(abs(v - m), 0.5) AS d
              FROM dev GROUP BY user_id)
            SELECT dev.event_id,
                   CASE WHEN mad.d > 0
                        THEN 0.6745 * (dev.v - dev.m) / mad.d END AS z,
                   coalesce(abs(CASE WHEN mad.d > 0
                        THEN 0.6745 * (dev.v - dev.m) / mad.d END) > 3.5,
                        false) AS o
            FROM dev LEFT JOIN mad USING (user_id)
        """).fetchall()
    )
    assert got == want and len(got) == 10000

    import pytest as _pt
    bad = spark.createDataFrame([(1, 0.5)], "k long, robust_z double")
    with _pt.raises(ValueError, match="collide"):
        mad_outliers(bad, "k")
    with _pt.raises(ValueError, match="group columns"):
        mad_outliers(df, "v", by=["nope"])


# ------------------------------------------ mergeable quantile state
def test_quantile_state_merge_is_exact_and_deterministic(spark):
    """The algebraic property: state(b1) ⊕ state(b2) == state(b1 ∪ b2)
    BIT-FOR-BIT (bottom-k closure), and the state is invariant to
    input partitioning — the two guarantees that make it a legitimate
    member of the incremental-maintenance family."""
    from web_api_postgres_etl_spark.operators.aggregates import (
        merge_quantile_states,
        quantile_sample_state,
    )

    df = spark.range(5_000).select(
        F.col("id"),
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    K = 64
    b1 = df.filter(F.col("id") % 2 == 0)
    b2 = df.filter(F.col("id") % 2 == 1)
    s1 = quantile_sample_state(b1, ["g"], "v", "id", k=K)
    s2 = quantile_sample_state(b2, ["g"], "v", "id", k=K)
    merged = {
        r["g"]: (r["n_rows"], [tuple(x) for x in r["qsample"]])
        for r in merge_quantile_states(s1.unionByName(s2), ["g"], k=K).collect()
    }
    oneshot = {
        r["g"]: (r["n_rows"], [tuple(x) for x in r["qsample"]])
        for r in quantile_sample_state(df, ["g"], "v", "id", k=K).collect()
    }
    assert merged == oneshot
    # partitioning invariance
    reparted = {
        r["g"]: (r["n_rows"], [tuple(x) for x in r["qsample"]])
        for r in quantile_sample_state(
            df.repartition(13), ["g"], "v", "id", k=K
        ).collect()
    }
    assert reparted == oneshot
    for n, sample in oneshot.values():
        assert len(sample) == K and n > K  # capped, counts exact


def test_quantile_state_estimate_accuracy_and_finalize_mirror(spark, oracle):
    """The finalized quantile lands within the O(1/√k) sampling band of
    the exact percentile, the global (no-keys) face works, NULLs are
    excluded, and finalize ≡ DuckDB quantile_cont over the SAME sample
    — bit-exact (pinned interpolation arithmetic)."""
    from web_api_postgres_etl_spark.operators.aggregates import (
        finalize_quantiles,
        quantile_sample_state,
    )

    n = 20_000
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 100 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("id").cast("double"))
        .alias("v"),
    )
    st = quantile_sample_state(df, [], "v", "id", k=1024)
    fin = finalize_quantiles(st, [0.5, 0.9], prefix="q_").first()
    assert fin["n_rows"] == n - n // 100
    # uniform 0..n: true p50 ≈ n/2, p90 ≈ 0.9n; 1024-sample rank error
    # ~3*sqrt(p(1-p)/1024)*n — use a generous 5-sigma band
    assert abs(fin["q_0"] - n / 2) < 0.08 * n
    assert abs(fin["q_1"] - 0.9 * n) < 0.08 * n

    # finalize ≡ quantile_cont over the same sampled values
    vals = sorted(x["__v"] for x in fin["qsample"])
    lit = "[" + ", ".join(repr(v) for v in vals) + "]"
    # CAST: DuckDB parses decimal-looking literals as DECIMAL
    want = oracle.execute(
        f"SELECT quantile_cont(CAST(x AS DOUBLE), 0.5), "
        f"quantile_cont(CAST(x AS DOUBLE), 0.9) "
        f"FROM (SELECT unnest({lit}) AS x)"
    ).fetchone()
    assert repr(fin["q_0"]) == repr(want[0])
    assert repr(fin["q_1"]) == repr(want[1])

    import pytest as _pt
    from web_api_postgres_etl_spark.operators.aggregates import (
        merge_quantile_states,
    )
    with _pt.raises(ValueError, match="k must"):
        quantile_sample_state(df, [], "v", "id", k=0)
    with _pt.raises(ValueError, match="probabilities"):
        finalize_quantiles(st, [1.5])
    with _pt.raises(ValueError, match="collide"):
        quantile_sample_state(
            df.withColumnRenamed("v", "n_rows"), ["n_rows"], "id", "id"
        )
    with _pt.raises(Exception, match="NULL id"):
        spark.createDataFrame([(None, 1.0)], "id long, v double").transform(
            lambda d: quantile_sample_state(d, [], "v", "id", k=4)
        ).collect()
