"""Data-quality expectations: ground truth, NULL-fails semantics, the
raise gate, quarantine split, and a DuckDB mirror on lineitem."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_api_postgres_etl_spark.operators.quality import (
    expect,
    expect_or_raise,
    quarantine,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, -5.0, "b"),      # fails non_negative
            (3, None, "c"),      # NULL predicate -> fails non_negative
            (4, 7.0, None),      # fails tag_present
        ],
        "id long, amount double, tag string",
    )


def _rules():
    # built lazily: Column construction needs an active SparkContext
    return {
        "non_negative": F.col("amount") >= 0,
        "tag_present": "tag IS NOT NULL",
        "id_positive": F.col("id") > 0,
    }


def test_expect_report(spark):
    rows = {r["rule"]: (r["n_rows"], r["n_failed"], r["pass"])
            for r in expect(_df(spark), _rules()).collect()}
    assert rows == {
        "non_negative": (4, 2, False),   # -5 and NULL both fail
        "tag_present": (4, 1, False),
        "id_positive": (4, 0, True),
    }
    # report preserves mapping order
    order = [r["rule"] for r in expect(_df(spark), _rules()).collect()]
    assert order == list(_rules())


def test_expect_or_raise(spark):
    with pytest.raises(ValueError, match="non_negative: 2 rows"):
        expect_or_raise(_df(spark), _rules())
    ok = _df(spark).filter("amount >= 0 AND tag IS NOT NULL")
    assert expect_or_raise(ok, _rules()) is ok


def test_quarantine_split(spark):
    clean, bad = quarantine(_df(spark), _rules())
    assert sorted(r["id"] for r in clean.collect()) == [1]
    got = {r["id"]: sorted(r["failed_rules"]) for r in bad.collect()}
    assert got == {
        2: ["non_negative"],
        3: ["non_negative"],
        4: ["tag_present"],
    }
    assert "failed_rules" not in clean.columns


def test_expect_single_pass_plan(spark):
    """All rules ride ONE aggregate over one scan — no per-rule jobs."""
    df = _df(spark)
    report = expect(df, _rules())
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_expect_matches_duckdb_mirror(spark, oracle):
    from tests.conftest import SF_ORACLE

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    rules = {
        "qty_in_range": "l_quantity BETWEEN 1 AND 50",
        "price_positive": F.col("l_extendedprice") > 0,
        "discount_unit_interval": "l_discount BETWEEN 0 AND 1",
        "impossible": "l_quantity < 0",
    }
    got = sorted(
        (r["rule"], r["n_rows"], r["n_failed"], r["pass"])
        for r in expect(li, rules).collect()
    )
    want = sorted(
        map(
            tuple,
            oracle.sql("""
WITH a AS (
  SELECT count(*) AS n,
    sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE)
             THEN 1 ELSE 0 END) AS f1,
    sum(CASE WHEN NOT coalesce(l_extendedprice > 0, FALSE)
             THEN 1 ELSE 0 END) AS f2,
    sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 1, FALSE)
             THEN 1 ELSE 0 END) AS f3,
    sum(CASE WHEN NOT coalesce(l_quantity < 0, FALSE)
             THEN 1 ELSE 0 END) AS f4
  FROM lineitem)
SELECT 'qty_in_range', n, f1, f1 = 0 FROM a
UNION ALL SELECT 'price_positive', n, f2, f2 = 0 FROM a
UNION ALL SELECT 'discount_unit_interval', n, f3, f3 = 0 FROM a
UNION ALL SELECT 'impossible', n, f4, f4 = 0 FROM a
""").fetchall(),
        )
    )
    assert got == want
    # sanity: the impossible rule fails on EVERY row
    imp = next(r for r in got if r[0] == "impossible")
    assert imp[2] == imp[1] and not imp[3]


def test_expect_rule_names_are_data(spark):
    """Rule names are data, not SQL: any characters survive verbatim
    (the unpivot carries them as literals, no string splicing)."""
    for name in ("o'brien's \\ rule", "multi\nline", "tab\tname"):
        rows = expect(_df(spark), {name: "id > 0"}).collect()
        assert rows[0]["rule"] == name and rows[0]["pass"]


def test_expect_or_raise_rejects_empty_load(spark):
    empty = _df(spark).filter("id < 0")
    with pytest.raises(ValueError, match="0 rows"):
        expect_or_raise(empty, _rules())
    assert expect_or_raise(empty, _rules(), require_rows=False).count() == 0


def test_quarantine_rejects_reasons_col_collision(spark):
    df = _df(spark).withColumn("failed_rules", F.lit("x"))
    with pytest.raises(ValueError, match="failed_rules"):
        quarantine(df, _rules())


# -------------------------------------------------- column profiler
def test_profile_columns_one_pass_and_exact_fields(spark, oracle):
    """Exact fields (n_rows/n_null/null_frac/min/max) vs DuckDB on
    lineitem; HLL distinct within its rsd of the exact count; complex
    columns carry NULL min/max; empty frame is total; ONE aggregate
    (single scan) plan-asserted."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.quality import profile_columns

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    prof = profile_columns(
        li, ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"]
    )
    # one scan: exactly one (partial+final) aggregate pair, no joins
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    got = {r["column"]: r for r in prof.collect()}

    for col in got:
        want = oracle.execute(f"""
            SELECT COUNT(*),
                   SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END),
                   COUNT(DISTINCT {col}),
                   CAST(MIN({col}) AS VARCHAR), CAST(MAX({col}) AS VARCHAR)
            FROM lineitem
        """).fetchone()
        r = got[col]
        assert r["n_rows"] == want[0]
        assert r["n_null"] == (want[1] or 0)
        assert r["null_frac"] == (want[1] or 0) / want[0]
        exact = want[2]
        assert abs(r["approx_distinct"] - exact) <= max(3, 0.2 * exact), col
        # numeric min/max are NUMERIC ordering (cast after, not before)
        if col == "l_quantity":
            assert float(r["min_repr"]) == 1.0
            assert float(r["max_repr"]) == 50.0

    # complex columns: null/distinct profiled, min/max NULL
    arr = li.limit(10).select(
        "l_orderkey", F.array("l_orderkey").alias("keys")
    )
    prow = {r["column"]: r for r in profile_columns(arr).collect()}["keys"]
    assert prow["min_repr"] is None and prow["max_repr"] is None
    assert prow["approx_distinct"] > 0

    # empty frame: totality
    empty = {
        r["column"]: r
        for r in profile_columns(li.filter(F.lit(False))).collect()
    }
    assert empty["l_orderkey"]["n_rows"] == 0
    assert empty["l_orderkey"]["null_frac"] is None

    with _pt.raises(ValueError, match="not in"):
        profile_columns(li, ["nope"])
    with _pt.raises(ValueError, match="no columns"):
        profile_columns(li, [])


def test_cli_profile_columns(spark, tmp_path, capsys):
    """profile --columns prints the one-pass column profile — all
    columns bare, a subset when comma-listed."""
    import json as _json

    from web_api_postgres_etl_spark.__main__ import main

    t = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y")], "id long, s string"
    ).write.parquet(t)

    assert main(["profile", "--table", t, "--columns"], spark=spark) == 0
    rows = {
        r["column"]: r
        for r in (
            _json.loads(x)
            for x in capsys.readouterr().out.splitlines() if x.strip()
        )
    }
    assert set(rows) == {"id", "s"}
    assert rows["s"]["n_null"] == 1 and rows["id"]["n_null"] == 0
    assert rows["id"]["min_repr"] == "1" and rows["id"]["max_repr"] == "3"

    assert main(
        ["profile", "--table", t, "--columns", "s"], spark=spark
    ) == 0
    only = [
        _json.loads(x)
        for x in capsys.readouterr().out.splitlines() if x.strip()
    ]
    assert [r["column"] for r in only] == ["s"]

    # combining --columns with another mode is rejected, not silently
    # reduced to the column profile
    import pytest as _pt
    with _pt.raises(SystemExit, match="cannot combine"):
        main(
            ["profile", "--table", t, "--columns", "--histogram", "id"],
            spark=spark,
        )


# ------------------------------------------------------- table diff
def test_table_diff_multiset_semantics_and_duckdb_mirror(spark, oracle):
    """Multiplicities drive the diff (an extra copy of an equal row IS
    a difference); NULLs compare equal; equal frames diff to empty;
    mirror on a perturbed lineitem slice is bit-exact."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.quality import table_diff

    a = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, None), (3, "z")], "id long, s string"
    )
    b = spark.createDataFrame(
        [("x", 1), (None, 2), ("w", 3)], "s string, id long"
    )  # column ORDER differs from a — names decide
    got = {
        (r["id"], r["s"]): (r["n_a"], r["n_b"])
        for r in table_diff(a, b).collect()
    }
    assert got == {
        (1, "x"): (2, 1),     # multiplicity mismatch
        (3, "z"): (1, 0),
        (3, "w"): (0, 1),
    }  # (2, NULL) matched null-safely → absent
    assert table_diff(a, a).count() == 0

    with _pt.raises(ValueError, match="must match"):
        table_diff(a, b.withColumnRenamed("s", "t"))
    # type drift must RAISE, not silently coerce-and-match-empty
    with _pt.raises(ValueError, match="column types differ"):
        table_diff(a, b.withColumn("id", F.col("id").cast("string")))
    with _pt.raises(ValueError, match="collide"):
        table_diff(
            a.withColumnRenamed("s", "n_a"), b.withColumnRenamed("s", "n_a")
        )

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    perturbed = li.withColumn(
        "l_returnflag",
        F.when(F.col("l_orderkey") % 997 == 0, F.lit("X")).otherwise(
            F.col("l_returnflag")
        ),
    )
    got_li = sorted(
        tuple(r) for r in table_diff(li, perturbed).collect()
    )
    want_li = sorted(oracle.execute("""
        WITH a AS (SELECT l_orderkey, l_linenumber, l_returnflag,
                          COUNT(*) AS n_a
                   FROM lineitem GROUP BY 1, 2, 3),
        b AS (SELECT l_orderkey, l_linenumber,
                     CASE WHEN l_orderkey % 997 = 0 THEN 'X'
                          ELSE l_returnflag END AS l_returnflag,
                     COUNT(*) AS n_b
              FROM lineitem GROUP BY 1, 2, 3)
        SELECT COALESCE(a.l_orderkey, b.l_orderkey),
               COALESCE(a.l_linenumber, b.l_linenumber),
               COALESCE(a.l_returnflag, b.l_returnflag),
               COALESCE(n_a, 0), COALESCE(n_b, 0)
        FROM a FULL OUTER JOIN b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_linenumber = b.l_linenumber
         AND a.l_returnflag IS NOT DISTINCT FROM b.l_returnflag
        WHERE COALESCE(n_a, 0) <> COALESCE(n_b, 0)
    """).fetchall())
    assert got_li == want_li and len(got_li) > 0


def test_table_fingerprint_invariance_and_sensitivity(spark):
    """The fingerprint is invariant under repartitioning, row order,
    and column order (commutative exact sum of canonical digests), and
    sensitive to any value change and to row multiplicity."""
    import pytest

    from web_api_postgres_etl_spark.operators.quality import (
        table_fingerprint,
    )

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, None, 2.5), (3, None, 2.5)],
        "id long, s string, x double",
    )
    base = table_fingerprint(df).first()
    assert base["n_rows"] == 4
    for variant in [
        df.repartition(13),
        df.orderBy(F.col("s").desc_nulls_first()),
        df.select("x", "id", "s"),
    ]:
        row = table_fingerprint(variant).first()
        assert (row["n_rows"], row["fingerprint"]) == (
            base["n_rows"], base["fingerprint"],
        )
    # column subset: explicit cols match regardless of the frame's extras
    sub = table_fingerprint(df, ["id", "s"]).first()
    assert sub["fingerprint"] == table_fingerprint(
        df.select("s", "id")
    ).first()["fingerprint"]
    # sensitivity: one changed value, one dropped duplicate
    changed = table_fingerprint(
        df.withColumn("id", F.when(F.col("id") == 2, 99).otherwise(F.col("id")))
    ).first()
    assert changed["fingerprint"] != base["fingerprint"]
    dedup = table_fingerprint(df.distinct()).first()
    assert dedup["n_rows"] == 3
    assert dedup["fingerprint"] != base["fingerprint"]
    # empty frame → (0, 0); guards raise
    empty = table_fingerprint(df.filter("id < 0")).first()
    assert (empty["n_rows"], int(empty["fingerprint"])) == (0, 0)
    with pytest.raises(ValueError, match="not in"):
        table_fingerprint(df, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        table_fingerprint(df, [])


def test_table_fingerprint_survives_layout_rewrites_and_matches_duckdb(
    spark, oracle, tmp_path
):
    """The 100 TB claim: layout maintenance (a Z-order rewrite through
    parquet) preserves the fingerprint bit-for-bit; and the value is
    engine-exact — DuckDB's mirror of the same md5 arithmetic over
    lineitem integer/string columns computes the identical DECIMAL."""
    from web_api_postgres_etl_spark.operators.layout import (
        cluster_by_zorder,
    )
    from web_api_postgres_etl_spark.operators.quality import (
        table_fingerprint,
    )
    from tests.conftest import SF_ORACLE

    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag"]
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    base = table_fingerprint(li, cols).first()

    out = str(tmp_path / "rewritten")
    cluster_by_zorder(
        li.select(*cols, "l_quantity"), ["l_orderkey", "l_partkey"], 4
    ).write.parquet(out)
    again = table_fingerprint(spark.read.parquet(out), cols).first()
    assert (again["n_rows"], again["fingerprint"]) == (
        base["n_rows"], base["fingerprint"],
    )

    parts = " || chr(1) || ".join(
        f"coalesce(CAST({c} AS VARCHAR), chr(0))" for c in sorted(cols)
    )
    row = oracle.execute(
        f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               COALESCE(SUM(CAST(CAST(('0x' || substr(md5({parts}), 1, 15))
                 AS UBIGINT) AS DECIMAL(38,0))), 0) AS fingerprint
        FROM lineitem
        """
    ).fetchone()
    assert (base["n_rows"], int(base["fingerprint"])) == (row[0], int(row[1]))
