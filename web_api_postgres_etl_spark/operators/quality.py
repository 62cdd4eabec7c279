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


def expect_schema(df: DataFrame, expected, allow_extra: bool = False) -> None:
    """Raise with a FULL diff when ``df``'s schema deviates from
    ``expected`` (a StructType or a DDL string): missing columns,
    unexpected columns (unless ``allow_extra``), and per-column type
    mismatches are all reported AT ONCE — a loader that fails one
    column at a time takes k deploys to discover k drifts. Nullability
    is deliberately ignored AT EVERY NESTING LEVEL (parquet
    round-trips, unions, and F.array()/F.split() flip top-level and
    containsNull/struct-field flags freely; types compare by
    simpleString, which strips them all). Column order is ignored too
    — select-reordering is not drift. Names fold per the session's
    ``spark.sql.caseSensitive`` (default: insensitive, matching how
    Spark resolves references). DUPLICATE column names in the frame
    are themselves reported as drift — they pass a naive gate and then
    kill the first downstream reference with AMBIGUOUS_REFERENCE.
    Metadata-only: no job runs."""
    from pyspark.sql.types import StructType

    if isinstance(expected, str):
        expected = StructType.fromDDL(expected)
    case_sensitive = (
        str(
            df.sparkSession.conf.get("spark.sql.caseSensitive", "false")
        ).lower()
        == "true"
    )

    def _fold(name: str) -> str:
        return name if case_sensitive else name.lower()

    problems = []
    seen: dict[str, int] = {}
    for f in df.schema.fields:
        seen[_fold(f.name)] = seen.get(_fold(f.name), 0) + 1
    for name, cnt in seen.items():
        if cnt > 1:
            problems.append(
                f"duplicate column name {name!r} ({cnt} occurrences — "
                "ambiguous references downstream)"
            )
    want = {_fold(f.name): (f.name, f.dataType) for f in expected.fields}
    have = {_fold(f.name): (f.name, f.dataType) for f in df.schema.fields}
    for key, (name, t) in want.items():
        if key not in have:
            problems.append(f"missing column {name!r} ({t.simpleString()})")
        elif have[key][1].simpleString() != t.simpleString():
            problems.append(
                f"type drift on {name!r}: expected {t.simpleString()}, "
                f"got {have[key][1].simpleString()}"
            )
    if not allow_extra:
        for key, (name, t) in have.items():
            if key not in want:
                problems.append(
                    f"unexpected column {name!r} ({t.simpleString()})"
                )
    if problems:
        raise ValueError(
            "expect_schema: schema drift detected:\n  - "
            + "\n  - ".join(problems)
        )


def population_stability(
    reference: DataFrame,
    current: DataFrame,
    value_col: str,
    bins: int = 10,
    epsilon: float = 1e-6,
) -> tuple[float, DataFrame]:
    """Population Stability Index between a reference batch and the
    current batch of ``value_col`` — the standard drift gate (rule of
    thumb: < 0.1 stable, 0.1-0.25 shifting, > 0.25 drifted). Bins are
    the REFERENCE's equi-depth quantile buckets (plus open-ended edge
    bins), so the reference distribution is ~uniform by construction
    and drift shows as current-batch mass piling into few bins.

    Returns ``(psi, per_bin)`` where ``per_bin`` carries each bin's
    reference/current fractions and PSI term for the audit trail.
    NULL values are excluded on both sides (count them with
    ``expect``; a fraction-of-NULLs drift is a different rule).
    ``epsilon`` floors empty fractions — PSI's ln explodes on zeros.

    Scale shape: one percentile aggregate on the reference (boundary
    literals), one map-side-combining bin count per side, and the PSI
    fold runs driver-side over ≤ ``bins`` rows — deterministic
    regardless of partitioning (never a float sum over data)."""
    from .aggregates import _equi_depth_edges_and_index
    from .project import qcol

    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if not epsilon > 0:
        raise ValueError(
            f"epsilon must be > 0 (it floors empty-bin fractions for the "
            f"ln), got {epsilon}"
        )
    v_ref = qcol(value_col).cast("double")
    edges, idx_ref = _equi_depth_edges_and_index(reference, v_ref, bins)
    if edges is None:
        raise ValueError(
            "population_stability: reference has no non-NULL values — "
            "there is no distribution to compare against"
        )

    def _counts(frame: DataFrame) -> dict[int, int]:
        # idx_ref is an unbound expression over the value column — the
        # ONE bin-assignment definition (aggregates helper) applied to
        # both frames; out-of-range current values land in the edge
        # bins naturally (0 boundaries exceeded below, bins-1 above)
        v = qcol(value_col).cast("double")
        rows = (
            frame.filter(v.isNotNull())
            .groupBy(idx_ref.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return {r["bin"]: r["n"] for r in rows}

    import math

    rc = _counts(reference)
    cc = _counts(current)
    n_ref = sum(rc.values())
    n_cur = sum(cc.values())
    if n_cur == 0:
        raise ValueError(
            "population_stability: current batch has no non-NULL values"
        )
    spark = reference.sparkSession
    per_rows = []
    psi = 0.0
    for b in range(bins):
        p = max(rc.get(b, 0) / n_ref, epsilon)
        q = max(cc.get(b, 0) / n_cur, epsilon)
        term = (p - q) * math.log(p / q)
        psi += term
        per_rows.append((b, rc.get(b, 0), cc.get(b, 0), p, q, term))
    per_bin = spark.createDataFrame(
        per_rows,
        "bin int, n_ref long, n_cur long, frac_ref double, "
        "frac_cur double, psi_term double",
    )
    return psi, per_bin
