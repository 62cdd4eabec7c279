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


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_distinct_rsd: float = 0.05,
) -> DataFrame:
    """One-pass column profile — (column, n_rows, n_null, null_frac,
    approx_distinct, min_repr, max_repr): the first thing to run
    against an unfamiliar or freshly-landed table (the data-profiling
    face next to ``expect``'s rule face and ``expect_schema``'s shape
    face). Defaults to every top-level column; pass ``columns`` to
    restrict.

    Semantics pinned: ``approx_distinct`` is HLL
    (``approx_count_distinct``, ``approx_distinct_rsd`` relative error
    — never claim it exact; the exact form is a groupBy away at full
    shuffle cost); min/max ship as STRING reprs (``min_repr`` /
    ``max_repr``) so one report schema serves every column type —
    ordering happens in the column's OWN type first, then casts, so
    numeric min/max are numeric, not lexicographic. Complex-typed
    columns (array/map/struct) profile null/distinct but carry NULL
    min/max (no total order to report). ``null_frac`` is one division
    of two exact longs. An empty frame reports n_rows 0, NULL
    fractions — totality, not an error.

    Scale shape: the whole report is ONE map-side-combining aggregate
    (k columns add 4k counters/sketches to a single scan — never k
    scans), unpivoted via the inline(array(struct(...))) pattern with
    column names as literal DATA; the shuffle carries one partial
    state row per partition."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_columns: no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"profile_columns: columns {missing} not in {df.columns}"
        )
    orderable = {
        c.name: not c.dataType.typeName() in ("array", "map", "struct")
        for c in df.schema.fields
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        qc = F.col(f"`{c}`")
        aggs.append(F.sum(qc.isNull().cast("long")).alias(f"__null{i}"))
        aggs.append(
            F.approx_count_distinct(qc, rsd=approx_distinct_rsd).alias(
                f"__ad{i}"
            )
        )
        if orderable.get(c, True):
            aggs.append(F.min(qc).cast("string").alias(f"__min{i}"))
            aggs.append(F.max(qc).cast("string").alias(f"__max{i}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max{i}"))
    wide = df.agg(*aggs)
    rows = F.inline(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"__null{i}").alias("n_null"),
                    F.col(f"__ad{i}").alias("approx_distinct"),
                    F.col(f"__min{i}").alias("min_repr"),
                    F.col(f"__max{i}").alias("max_repr"),
                )
                for i, c in enumerate(cols)
            ]
        )
    )
    return wide.select(F.col("__n"), rows).select(
        "column",
        F.col("__n").alias("n_rows"),
        F.coalesce(F.col("n_null"), F.lit(0)).alias("n_null"),
        (
            F.coalesce(F.col("n_null"), F.lit(0))
            / F.nullif(F.col("__n"), F.lit(0))
        ).alias("null_frac"),
        "approx_distinct",
        "min_repr",
        "max_repr",
    )


def table_diff(
    df_a: DataFrame,
    df_b: DataFrame,
) -> DataFrame:
    """MULTISET difference of two same-schema frames — the
    reconciliation primitive (validate a migration, an engine swap, a
    rewritten pipeline): one row per DISTINCT row value whose
    multiplicity differs between the sides, as all the original
    columns plus ``n_a``/``n_b`` (0 when absent). Empty result ⇔ the
    frames are equal as multisets. Column ORDER may differ between
    inputs; names must match (``expect_schema`` is the stricter shape
    gate — this op reconciles VALUES).

    Pinned semantics: rows compare null-safely (NULL == NULL — a
    groupBy key, like every aggregate); counts are exact longs.
    Floating-point columns compare by exact bits, which is the honest
    default for "are these the same table" — round or quantize
    upstream when last-ulp drift is expected (the engine's own
    decimal-division seam applies to its own outputs too).

    Scale shape: each side reduces to (row-values, count) via one
    map-side-combining groupBy over ALL columns, then ONE null-safe
    full-outer equi-join on those values — shuffles carry each
    distinct row once per side, and a mostly-equal comparison's join
    output is tiny. No collect, no broadcast of either table."""
    if set(df_a.columns) != set(df_b.columns):
        raise ValueError(
            "table_diff: column names must match — "
            f"A has {sorted(df_a.columns)}, B has {sorted(df_b.columns)} "
            "(run expect_schema for a full drift report)"
        )
    for side, frame in (("A", df_a), ("B", df_b)):
        if len(set(frame.columns)) != len(frame.columns):
            raise ValueError(
                f"table_diff: duplicate column names in {side} cannot "
                f"be reconciled — {frame.columns}"
            )
    # TYPES must match too: Spark would insert implicit casts into the
    # null-safe join (1 == '01'), returning an EMPTY diff for exactly
    # the type drift a reconciliation primitive exists to catch
    ta, tb = dict(df_a.dtypes), dict(df_b.dtypes)
    drift = {c: (ta[c], tb[c]) for c in ta if ta[c] != tb[c]}
    if drift:
        raise ValueError(
            f"table_diff: column types differ — {drift} (cast one side "
            "first; implicit-coercion equality would mask the drift)"
        )
    cols = list(df_a.columns)
    clash = {"n_a", "n_b"} & set(cols)
    if clash:
        raise ValueError(
            f"table_diff: input columns {sorted(clash)} collide with "
            "the output count columns — rename them first"
        )
    ca = df_a.groupBy(*[F.col(f"`{c}`") for c in cols]).agg(
        F.count(F.lit(1)).alias("n_a")
    )
    cb = df_b.groupBy(*[F.col(f"`{c}`") for c in cols]).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    cb2 = cb.select(
        *[F.col(f"`{c}`").alias(f"__b_{c}") for c in cols], "n_b"
    )
    cond = None
    for c in cols:
        eq = ca[c].eqNullSafe(cb2[f"__b_{c}"])
        cond = eq if cond is None else (cond & eq)
    return (
        ca.join(cb2, cond, "full_outer")
        .select(
            *[F.coalesce(ca[c], cb2[f"__b_{c}"]).alias(c) for c in cols],
            F.coalesce(F.col("n_a"), F.lit(0).cast("long")).alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0).cast("long")).alias("n_b"),
        )
        .filter(F.col("n_a") != F.col("n_b"))
    )


def table_fingerprint(
    df: DataFrame,
    cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """ONE row ``(n_rows BIGINT, fingerprint DECIMAL(38,0))`` — an
    order- and partition-independent exact content digest of the
    frame: fingerprint = Σ over rows of the first-60-bit integer of
    the canonical sorted-column row digest
    (``operators.layout.row_digest`` — the SAME recipe the CDC apply
    gate compares). A commutative exact-integer sum, so ANY
    partitioning, row order, or column order computes the identical
    value — the cheap invariance check the layout family needs at
    100 TB: ``compact_small_files``, Z-order clustering, a no-op
    upsert replay, or an engine migration must all preserve it, in
    one column-pruned scan per side instead of ``table_diff``'s full
    multiset join.

    CROSS-ENGINE scope: "any engine computes the identical value"
    holds only for columns whose string rendering is engine-invariant
    — integers, strings, booleans, and date-like values. Doubles and
    timestamps render differently across engines (Spark ``1.0E-7``
    vs DuckDB ``1e-07``), so fingerprints over float/timestamp
    columns are exact WITHIN one engine but not comparable ACROSS
    engines — canonicalize the rendering first (e.g. cast to
    DECIMAL / epoch integers). The digest recipe's NUL null-sentinel
    and ``\\u0001`` column separator can in principle collide with
    literal values containing those control bytes; data that embeds
    them should be hex/base64-encoded before fingerprinting.

    MULTISET-sensitive: a duplicated row adds its term twice, so
    equal fingerprints+counts ⇔ equal multisets of canonical row
    strings (md5-collision caveat, same as every digest op here).
    Directional caveat vs ``table_diff``: a fingerprint MISMATCH
    proves the tables differ, a match is probabilistic — reconcile
    with ``table_diff`` when you need the differing rows themselves.
    60 bits per term keeps the sum exact in DECIMAL(38,0) up to
    ~10^19 rows; NULLs and column order are canonicalized by the
    shared digest recipe. Empty frame → (0, 0)."""
    from .layout import row_digest

    use = list(cols) if cols is not None else list(df.columns)
    if not use:
        raise ValueError("table_fingerprint: no columns to digest")
    missing = [c for c in use if c not in df.columns]
    if missing:
        raise ValueError(
            f"table_fingerprint: columns {missing} not in {df.columns}"
        )
    word = F.conv(F.substring(row_digest(use), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    # a NULL sum means DECIMAL(38,0) OVERFLOW (non-ANSI sum), not an
    # empty frame — mapping it to 0 would let two overflowed tables
    # report identical fingerprints and a --vs comparison exit 0, a
    # silent false positive. Empty input is the ONLY case coalesced;
    # overflow (~1e19+ rows) fails loudly instead.
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(word).alias("__sum"),
    ).select(
        "n_rows",
        F.when(F.col("n_rows") == 0, F.lit(0).cast("decimal(38,0)"))
        .when(
            F.col("__sum").isNull(),
            F.expr(
                "cast(raise_error('table_fingerprint: DECIMAL(38,0) sum "
                "overflow — fingerprint undefined at this row count; "
                "fingerprint disjoint shards and compare shard-wise') "
                "as decimal(38,0))"
            ),
        )
        .otherwise(F.col("__sum"))
        .alias("fingerprint"),
    )
