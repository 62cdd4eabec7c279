"""Data-quality expectations: declarative row-level rules validated in
ONE aggregate pass, returning a per-rule report — the
Great-Expectations / Delta-constraints move for plain DataFrames.

Reference surface: the reference ETL trusts its API payloads blindly
(mabna_tables_etl.py loads whatever arrives); a production load wants
the contract checked — and at 100 TB it must cost one scan, not one
scan per rule.

Scale shape: every rule compiles to ``sum(NOT predicate)`` inside a
single map-side-combining aggregate over one pass of the input —
k rules add k counters to the same scan, never k scans. NULL
predicate results count as FAILURES (a rule that cannot evaluate did
not pass — SQL's WHERE-clause semantics would silently bless them).
The report is k tiny rows; gating on it is one driver-side check.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect(
    df: DataFrame,
    rules: Mapping[str, Column | str],
) -> DataFrame:
    """(rule, n_rows, n_failed, pass) — one row per rule, one scan
    total. ``rules`` maps rule name → boolean Column (or SQL string,
    ``F.expr``-ed). A row fails a rule when the predicate is false OR
    NULL. ``pass`` is n_failed == 0.

    Report shape is deterministic: rules appear in mapping order via
    an explicit unpivot, not k separate jobs. An EMPTY input passes
    every rule vacuously (n_rows shows 0) — gate zero-row loads with
    ``expect_or_raise``'s ``require_rows``.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    names = list(rules)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, name in enumerate(names):
        pred = rules[name]
        c = F.expr(pred) if isinstance(pred, str) else pred
        aggs.append(
            F.sum((~F.coalesce(c, F.lit(False))).cast("long")).alias(f"__f{i}")
        )
    wide = df.agg(*aggs)
    # unpivot via inline(array(struct(...))): rule names travel as
    # literal DATA (F.lit), never spliced into a SQL string — no
    # escaping surface, any character works
    rows = F.inline(
        F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col(f"__f{i}").alias("n_failed"),
                )
                for i, name in enumerate(names)
            ]
        )
    )
    return wide.select(F.col("__n").alias("__n"), rows).select(
        "rule",
        F.col("__n").alias("n_rows"),
        F.coalesce(F.col("n_failed"), F.lit(0)).alias("n_failed"),
        (F.coalesce(F.col("n_failed"), F.lit(0)) == 0).alias("pass"),
    )


def expect_or_raise(
    df: DataFrame,
    rules: Mapping[str, Column | str],
    require_rows: bool = True,
) -> DataFrame:
    """Gate form: return ``df`` untouched when every rule passes, else
    raise ``ValueError`` naming each failing rule and its count — the
    load-abort pattern (check the staging layer BEFORE the swap to
    production, same place the pipeline's compaction swap sits).

    ``require_rows`` (default True) also rejects an EMPTY frame: a
    zero-row load vacuously passes every row-level rule, and blessing
    it would let a silently-failed extraction promote an empty table
    over production. Pass False only when empty is a legal state."""
    report = expect(df, rules).collect()
    if require_rows and report and report[0]["n_rows"] == 0:
        raise ValueError(
            "expectations failed — input has 0 rows (every row rule "
            "passes vacuously; pass require_rows=False if an empty "
            "load is expected)"
        )
    failed = [(r["rule"], r["n_failed"]) for r in report if not r["pass"]]
    if failed:
        detail = ", ".join(f"{name}: {n} rows" for name, n in failed)
        raise ValueError(f"expectations failed — {detail}")
    return df


def quarantine(
    df: DataFrame,
    rules: Mapping[str, Column | str],
    reasons_col: str = "failed_rules",
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — rows failing ANY rule are diverted with
    an array column naming every rule they failed (the CSV-reader
    quarantine pattern generalized to semantic rules). Each returned
    frame filters one shared projection: evaluate the rule columns
    once, then split — two scans of the input (Catalyst has no
    subplan reuse across actions), or persist upstream for one."""
    if not rules:
        raise ValueError("rules must be non-empty")
    if reasons_col in df.columns:
        raise ValueError(
            f"input already has a {reasons_col!r} column — pass a "
            "different reasons_col (quarantine would silently destroy it)"
        )
    flags = [
        F.when(
            ~F.coalesce(
                F.expr(p) if isinstance(p, str) else p, F.lit(False)
            ),
            F.lit(name),
        )
        for name, p in rules.items()
    ]
    tagged = df.withColumn(
        reasons_col,
        F.filter(F.array(*flags), lambda x: x.isNotNull()),
    )
    clean = tagged.filter(F.size(reasons_col) == 0).drop(reasons_col)
    bad = tagged.filter(F.size(reasons_col) > 0)
    return clean, bad
