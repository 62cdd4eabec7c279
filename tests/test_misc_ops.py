"""Round-7 utility operators: k-fold assignment (md5 arithmetic,
DuckDB-mirrored), n-gram novelty scoring (ground truth + reference
semantics), and event debouncing (burst-chaining semantics)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from web_api_postgres_etl_spark.operators.aggregates import debounce_events
from web_api_postgres_etl_spark.operators.dedup import novelty_score
from web_api_postgres_etl_spark.operators.sampling import assign_folds


# ------------------------------------------------------ assign_folds
def test_assign_folds_mirror_and_properties(spark, oracle):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    got = {
        r["doc_id"]: r["fold"]
        for r in assign_folds(docs, "doc_id", k=5).collect()
    }
    want = dict(oracle.execute("""
        SELECT doc_id,
               CAST(CAST(('0x' || substr(md5('fold' || '#' ||
                    CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) % 5 AS INT)
        FROM documents
    """).fetchall())
    assert got == want
    # ~balanced, all folds occupied, stable under re-run/repartition
    sizes = [list(got.values()).count(i) for i in range(5)]
    assert min(sizes) > 0 and max(sizes) - min(sizes) < 0.3 * 500
    again = {
        r["doc_id"]: r["fold"]
        for r in assign_folds(docs.repartition(13), "doc_id", k=5).collect()
    }
    assert again == got
    with pytest.raises(ValueError, match="k must"):
        assign_folds(docs, "doc_id", k=1)
    with pytest.raises(ValueError, match="already exists"):
        assign_folds(assign_folds(docs, "doc_id"), "doc_id")


# ----------------------------------------------------- novelty_score
def test_novelty_score_ground_truth_and_totality(spark):
    ref = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string"
    )
    rows = [
        (1, "the quick brown fox jumps"),       # fully covered (n=3)
        (2, "a completely different sentence entirely here"),
        (3, "the quick brown fox said something new"),  # mixed
        (4, "too short"),                        # < n words
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in novelty_score(df, ref, "doc_id", "text", ngram_n=3).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}           # labeling is total
    assert out[1] == (3, 0, 0.0)                 # verbatim sub-span
    assert out[2][0] == out[2][1] and out[2][2] == 1.0
    assert 0.0 < out[3][2] < 1.0                 # recombination detected
    assert out[4] == (0, 0, None)                # nothing measurable
    assert out[5] == (0, 0, None)

    # distinct-gram semantics: repeating a covered phrase adds nothing
    rep = spark.createDataFrame(
        [(9, "the quick brown the quick brown the quick brown")],
        "doc_id long, text string",
    )
    r = novelty_score(rep, ref, "doc_id", "text", ngram_n=3).first()
    # grams: {the quick brown, quick brown the, brown the quick} — only
    # the first occurs in the reference
    assert r["n_grams"] == 3 and r["n_novel"] == 2


def test_novelty_score_on_documents(spark):
    """Self-reference gives novelty 0 everywhere; a disjoint reference
    gives novelty 1 for every measurable doc."""
    # deterministic filter, not limit(): novelty_score evaluates this
    # frame on BOTH plan branches (grams + reference) with no subplan
    # reuse, and an unordered limit could pick different rows per branch
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").filter(
        "doc_id < 60"
    )
    self_scored = novelty_score(docs, docs, "doc_id", "text", ngram_n=5)
    vals = [r["novelty"] for r in self_scored.collect() if r["novelty"] is not None]
    assert vals and all(v == 0.0 for v in vals)
    alien = spark.createDataFrame(
        [("zz yy xx ww vv uu tt ss rr qq",)], "text string"
    )
    alien_scored = novelty_score(docs, alien, "doc_id", "text", ngram_n=5)
    vals2 = [r["novelty"] for r in alien_scored.collect() if r["novelty"] is not None]
    assert vals2 and all(v == 1.0 for v in vals2)


# --------------------------------------------------- debounce_events
def test_debounce_burst_chaining_and_mirror(spark, oracle):
    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)
    rows = [
        # u1: burst 0,5,9 chains past the 6s window -> ONE survivor;
        # then 30 starts a new burst
        (1, s(0), 100), (1, s(5), 101), (1, s(9), 102), (1, s(30), 103),
        # u2: isolated events keep both
        (2, s(0), 200), (2, s(20), 201),
        # u3: equal-ts tie -> tiebreaker asc picks the lower id
        (3, s(0), 301), (3, s(0), 300),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    kept = sorted(
        r["event_id"]
        for r in debounce_events(
            df, "user_id", "ts", quiet_seconds=6, tiebreaker="event_id"
        ).collect()
    )
    assert kept == [100, 103, 200, 201, 300]
    assert debounce_events(df, "user_id", "ts", 6).columns == df.columns
    with pytest.raises(ValueError, match="quiet_seconds"):
        debounce_events(df, "user_id", "ts", 0)
    # review regression: pre-existing session columns must raise, not
    # be silently clobbered by the internal sessionize
    from web_api_postgres_etl_spark.operators.aggregates import sessionize

    labeled = sessionize(df, "user_id", "ts", 1800)
    with pytest.raises(ValueError, match="collide"):
        debounce_events(labeled, "user_id", "ts", 6)

    # events-table mirror: survivors == first event of each 120s burst
    events = spark.read.parquet(f"{SF_ORACLE}/events.parquet").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    got = sorted(
        r["event_id"]
        for r in debounce_events(
            events, "user_id", "ts", quiet_seconds=120, tiebreaker="event_id"
        ).collect()
    )
    want = sorted(
        row[0]
        for row in oracle.execute("""
            WITH ev AS (
              SELECT event_id, user_id, epoch_us(ts) AS t,
                     lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS p
              FROM events WHERE ts IS NOT NULL),
            lab AS (
              SELECT event_id, user_id, t,
                CAST(sum(CASE WHEN t - p >= 120000000 THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS INT) AS s
              FROM ev)
            SELECT event_id FROM lab
            QUALIFY row_number() OVER
              (PARTITION BY user_id, s ORDER BY t, event_id) = 1
        """).fetchall()
    )
    assert got == want and 0 < len(got) < 10000


# -------------------------------------------------------- bucketize
def test_bucketize_labels_match_equi_depth_bins(spark):
    from web_api_postgres_etl_spark.operators.aggregates import (
        bucketize,
        histogram_equi_depth,
    )

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    labeled = bucketize(orders, "o_totalprice", 4)
    counts = {
        r["bucket"]: r["n"]
        for r in labeled.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    hist = {
        r["bin"]: r["n"]
        for r in histogram_equi_depth(orders, "o_totalprice", 4).collect()
    }
    assert counts == hist  # the labels land exactly in the histogram bins
    # totality + guards
    nulls = spark.createDataFrame([(None,), (1.0,)], "v double")
    rows = {r["v"]: r["b"] for r in bucketize(nulls, "v", 2, "b").collect()}
    assert rows[None] is None and rows[1.0] is not None
    assert bucketize(nulls, "v", 1, "b").filter("v IS NOT NULL").first()["b"] == 0
    with pytest.raises(ValueError, match="bins"):
        bucketize(nulls, "v", 0)
    with pytest.raises(ValueError, match="already exists"):
        bucketize(nulls.withColumnRenamed("v", "bucket"), "bucket", 2)


# ------------------------------------------------- stratified_sample
def test_stratified_sample_mirror_and_semantics(spark, oracle):
    from web_api_postgres_etl_spark.operators.sampling import (
        stratified_sample,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    fr = {"en": 0.5, "fr": 1.0, "de": 0.0}
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(docs, "lang", "doc_id", fr,
                                   default_fraction=0.25).collect()
    )
    want = sorted(
        row[0]
        for row in oracle.execute("""
            SELECT doc_id FROM documents
            WHERE CAST(('0x' || substr(md5('strata' || '#' ||
                    CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
                  / 4503599627370496.0
                < CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 1.0
                            WHEN 'de' THEN 0.0 ELSE 0.25 END
        """).fetchall()
    )
    assert got == want
    kept = spark.createDataFrame([(i,) for i in got], "doc_id long")
    by_lang = {
        r["lang"]: r["n"]
        for r in docs.join(kept, "doc_id", "left_semi")
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["fr"] == totals["fr"]       # fraction 1.0 keeps all
    assert "de" not in by_lang                 # fraction 0.0 drops all
    assert 0 < by_lang["en"] < totals["en"]
    with pytest.raises(ValueError, match="fraction for group"):
        stratified_sample(docs, "lang", "doc_id", {"en": 1.5})
    with pytest.raises(ValueError, match="default_fraction"):
        stratified_sample(docs, "lang", "doc_id", {}, default_fraction=-1)


# -------------------------------------------------- grouping sets
def test_grouping_sets_matches_duckdb(spark, oracle):
    from web_api_postgres_etl_spark.operators.aggregates import (
        grouping_sets_agg,
    )

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    rows = grouping_sets_agg(
        orders,
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,10)"))
            .alias("total"),
        ],
    ).collect()
    from decimal import Decimal

    q2 = Decimal("0.01")
    got = sorted(
        (
            (r["o_orderstatus"], r["o_orderpriority"], r["n"],
             str(Decimal(r["total"]).quantize(q2)), r["grouping_id"])
            for r in rows
        ),
        key=repr,
    )
    fetched = oracle.execute("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               sum(CAST(o_totalprice AS DECIMAL(38,10))) AS total,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT)
                 AS grouping_id
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """).fetchall()
    # exact DECIMALs on both sides (a decimal->double CAST is NOT
    # engine-reproducible at scale 10: DuckDB divides in floating
    # point, Spark rounds the BigDecimal correctly)
    want = sorted(
        ((s, p, n, str(Decimal(t).quantize(q2)), g)
         for s, p, n, t, g in fetched),
        key=repr,
    )
    assert got == want and len(got) > 10
    # the grand-total row is identifiable by its grouping_id, never by
    # NULL-key guessing
    grand = [g for *_, g in got if g == 3]
    assert len(grand) == 1

    with pytest.raises(ValueError, match="at least one set"):
        grouping_sets_agg(orders, [], [F.count(F.lit(1)).alias("n")])
    with pytest.raises(ValueError, match="not in"):
        grouping_sets_agg(orders, [["nope"]], [F.count(F.lit(1)).alias("n")])
    with pytest.raises(ValueError, match="at least one aggregate"):
        grouping_sets_agg(orders, [["o_orderstatus"]], [])


def test_review_regressions_round7_tail(spark):
    """Ninth-review fixes: dotted id columns in keywords/grouping sets,
    the NULL stratum in stratified_sample, empty-frame binary_metrics."""
    from web_api_postgres_etl_spark.operators.aggregates import (
        grouping_sets_agg,
    )
    from web_api_postgres_etl_spark.operators.classifier import binary_metrics
    from web_api_postgres_etl_spark.operators.retrieval import keywords_per_doc
    from web_api_postgres_etl_spark.operators.sampling import (
        stratified_sample,
    )

    dotted = spark.createDataFrame(
        [(1, "solar solar farm"), (2, "castle castle keep")],
        "`meta.version` long, text string",
    )
    kw = {
        r["meta.version"]: r["term"]
        for r in keywords_per_doc(dotted, "meta.version", "text", k=1,
                                  max_df_frac=1.0).collect()
    }
    assert kw == {1: "solar", 2: "castle"}

    gdf = spark.createDataFrame(
        [(1, "a", 2), (2, "b", 3)], "`meta.version` long, k string, v int"
    )
    gs = grouping_sets_agg(
        gdf, [["meta.version"], []], [F.sum("v").alias("s")]
    ).collect()
    got_gs = sorted(
        ((r["meta.version"], r["s"], r["grouping_id"]) for r in gs), key=repr
    )
    assert got_gs == sorted([(1, 2, 0), (2, 3, 0), (None, 5, 1)], key=repr)

    # the NULL stratum is addressable with a None key
    sdf = spark.createDataFrame(
        [(i, None if i < 5 else "en") for i in range(10)],
        "doc_id long, lang string",
    )
    kept = stratified_sample(sdf, "lang", "doc_id", {None: 0.0},
                             default_fraction=1.0)
    assert sorted(r["doc_id"] for r in kept.collect()) == [5, 6, 7, 8, 9]

    # empty scored frame: exact-zero counts, never NULL
    empty = spark.createDataFrame([], "label int, score double")
    row = binary_metrics(empty, "label", "score", [0.5]).first()
    assert (row["tp"], row["fp"], row["tn"], row["fn"], row["n_skipped"]) \
        == (0, 0, 0, 0, 0)


def test_cli_profile_histogram_and_drift(spark, tmp_path, capsys):
    import json

    from web_api_postgres_etl_spark.__main__ import main

    path = str(tmp_path / "t")
    spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS v").write.parquet(path)
    assert main(["profile", "--table", path, "--histogram", "v",
                 "--bins", "4"], spark=spark) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 4 and sum(l["n"] for l in lines) == 1000

    shifted = str(tmp_path / "s")
    spark.range(500).selectExpr("CAST(90 + id % 10 AS DOUBLE) AS v").write.parquet(shifted)
    assert main(["profile", "--table", shifted, "--histogram", "v",
                 "--drift-vs", path, "--bins", "4"], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    head = json.loads(out[0])
    assert head["verdict"] == "drifted" and head["psi"] > 0.25
    assert len(out) == 5  # header + 4 per-bin rows

    # keys still required for the skew/join faces
    import pytest as _pt
    with _pt.raises(SystemExit, match="pass --keys"):
        main(["profile", "--table", path], spark=spark)


# ------------------------------------------------------- winsorize
def test_winsorize_ground_truth_nulls_and_duckdb_mirror(spark, oracle):
    """Clamping semantics on a planted frame (NULL value stays NULL —
    least/greatest skip NULLs, so the bare clamp would have turned it
    into the LOWER bound; all-NULL group untouched; NULL group keys
    labeled), then a bit-exact grouped + global mirror on lineitem."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.aggregates import winsorize

    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
        ("a", None),
        (None, 5.0), (None, 50.0),
        ("z", None),            # all-NULL group
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["v"]): r["v_winsorized"]
        for r in winsorize(df, "v", 0.25, 0.75, by=["g"]).collect()
    }
    # group a: sorted [1,2,3,100]; p25 = 1.75, p75 = 27.25 (PERCENTILE_CONT)
    assert got[("a", 1.0)] == 1.75
    assert got[("a", 100.0)] == 27.25
    assert got[("a", 2.0)] == 2.0
    assert got[("a", None)] is None            # NULL value stays NULL
    assert got[("z", None)] is None            # all-NULL group untouched
    assert got[(None, 5.0)] is not None        # NULL group key labeled

    with _pt.raises(ValueError, match="p_low"):
        winsorize(df, "v", 0.9, 0.1)
    with _pt.raises(ValueError, match="collide"):
        winsorize(df.withColumnRenamed("g", "v_winsorized"), "v")
    with _pt.raises(ValueError, match="group columns"):
        winsorize(df, "v", by=["nope"])

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    got_g = sorted(
        (r["l_orderkey"], r["l_linenumber"], repr(r["p_winsorized"]))
        for r in winsorize(
            li, "l_extendedprice", 0.05, 0.95, by=["l_returnflag"],
            out_col="p_winsorized",
        ).select("l_orderkey", "l_linenumber", "p_winsorized").collect()
    )
    want_g = sorted(
        (a, b, repr(c))
        for a, b, c in oracle.execute("""
        WITH b AS (
          SELECT l_returnflag AS g,
                 quantile_cont(l_extendedprice, 0.05) AS lo,
                 quantile_cont(l_extendedprice, 0.95) AS hi
          FROM lineitem GROUP BY 1)
        SELECT l_orderkey, l_linenumber,
               least(greatest(l_extendedprice, lo), hi)
        FROM lineitem JOIN b ON l_returnflag IS NOT DISTINCT FROM g
    """).fetchall())
    assert got_g == want_g

    # GLOBAL (by=None) path — the 1-row broadcast cross join — mirrored
    # too, not just guarded: a regression there must not ship green
    got_all = sorted(
        (r["l_orderkey"], r["l_linenumber"], repr(r["p_w"]))
        for r in winsorize(
            li, "l_extendedprice", 0.05, 0.95, out_col="p_w"
        ).select("l_orderkey", "l_linenumber", "p_w").collect()
    )
    want_all = sorted(
        (a, b, repr(c))
        for a, b, c in oracle.execute("""
        WITH b AS (
          SELECT quantile_cont(l_extendedprice, 0.05) AS lo,
                 quantile_cont(l_extendedprice, 0.95) AS hi
          FROM lineitem)
        SELECT l_orderkey, l_linenumber,
               least(greatest(l_extendedprice, lo), hi)
        FROM lineitem, b
    """).fetchall())
    assert got_all == want_all


# --------------------------------------------------- percentile rank
def test_percentile_rank_cume_dist_and_duckdb_mirror(spark, oracle):
    """Ranks equal CUME_DIST semantics (ties share, NULL value → NULL
    rank, NULL group keys labeled), grouped + global forms both
    mirrored bit-exact on lineitem; the plan windows over DISTINCT
    values, never rows."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.aggregates import (
        percentile_rank,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0), ("a", None),
         (None, 3.0), (None, 4.0)],
        "g string, v double",
    )
    got = {
        (r["g"], r["v"]): r["v_pct_rank"]
        for r in percentile_rank(df, "v", by=["g"]).collect()
    }
    assert got[("a", 1.0)] == 0.25
    assert got[("a", 2.0)] == 0.75      # ties share the upper rank
    assert got[("a", 5.0)] == 1.0
    assert got[("a", None)] is None     # NULL value → NULL rank
    assert got[(None, 3.0)] == 0.5      # NULL group labeled

    with _pt.raises(ValueError, match="collide"):
        percentile_rank(df.withColumnRenamed("g", "v_pct_rank"), "v")
    with _pt.raises(ValueError, match="group columns"):
        percentile_rank(df, "v", by=["nope"])

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    for by, part in [(["l_returnflag"], "PARTITION BY l_returnflag"),
                     (None, "")]:
        out = percentile_rank(li, "l_extendedprice", by=by, out_col="pr")
        got_li = sorted(
            (r["l_orderkey"], r["l_linenumber"], repr(r["pr"]))
            for r in out.select(
                "l_orderkey", "l_linenumber", "pr"
            ).collect()
        )
        want_li = sorted(
            (a, b, repr(c))
            for a, b, c in oracle.execute(f"""
            SELECT l_orderkey, l_linenumber,
                   cume_dist() OVER ({part} ORDER BY l_extendedprice)
            FROM lineitem
        """).fetchall())
        assert got_li == want_li, by

    # plan shape: the window input is the distinct-value count table
    plan = percentile_rank(
        li, "l_extendedprice", by=["l_returnflag"]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" in plan and "Aggregate" in plan
