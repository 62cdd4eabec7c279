"""Joins (J1 star join, J2 two-way) — all inner equi-joins.

The reference delegates join planning to Postgres (SQL strings at
mabna_tables_create.py:235-243, 286-288); here Catalyst owns it. Every
dimension in the reference is a small lookup table, so the physical
plan we want is a chain of **BroadcastHashJoin** with zero shuffles of
the fact table — the ``broadcast()`` hints pin that even if stats are
missing. At 100 TB the fact side streams through unshuffled; only if a
dimension outgrew the broadcast threshold would AQE fall back to a
shuffle join (and the skew-join config in session.py handles hot keys).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .project import qcol, qident as _qident_j


def two_way_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    broadcast_dim: bool = True,
    how: str = "inner",
) -> DataFrame:
    """J2: fact ⋈ dim on single-column equi keys
    (indexvalues ⋈ indexes — mabna_tables_create.py:286-288)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, qcol(fact_key) == d[_q(dim_key)], how)


def star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, str, str]],
    broadcast_dims: bool | Sequence[bool] = True,
) -> DataFrame:
    """J1: chained star join — fact ⋈ dim1 ⋈ dim2 ⋈ …

    ``dims`` is a sequence of ``(dim_df, fact_side_key, dim_key)`` where
    ``fact_side_key`` may live on the original fact or on a previously
    joined dim (the reference chains instruments→assets→categories and
    instruments→exchanges — mabna_tables_create.py:235-243).

    ``broadcast_dims`` may be one bool for all dims or one bool PER dim.
    Broadcast is correct only for sides that stay small at scale (true
    lookup tables): the fact streams through unshuffled. A side that
    grows WITH the fact (e.g. an orders table joined to lineitem) must
    NOT be broadcast — at 100 TB the broadcast build would OOM every
    executor — mark it False to route through a shuffle join (AQE picks
    sort-merge/shuffled-hash and handles skew), or pre-bucket both
    sides on the key (sources.writers.write_bucketed) for a
    shuffle-free co-located join.
    """
    if isinstance(broadcast_dims, bool):
        flags = [broadcast_dims] * len(dims)
    else:
        flags = list(broadcast_dims)
        if len(flags) != len(dims):
            raise ValueError(
                f"broadcast_dims has {len(flags)} flags for {len(dims)} dims"
            )
    out = fact
    for (dim, left_key, right_key), bc in zip(dims, flags):
        d = F.broadcast(dim) if bc else dim
        out = out.join(d, out[_q(left_key)] == d[_q(right_key)], "inner")
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    left_id: str,
    right_on: str | None = None,
    tiebreaker: str | None = None,
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """AS-OF join (an operator Spark lacks natively): for each left row
    (identified by unique ``left_id``), the single most recent matching
    right row whose time is ≤ the left time (``backward``; ``forward``
    = earliest ≥). Inner semantics: unmatched left rows drop.

    ``tolerance`` (pandas ``merge_asof`` parity) bounds the staleness:
    backward matches must satisfy ``right_time >= left_time -
    tolerance``, forward ones ``right_time <= left_time + tolerance``.
    Pass whatever subtracts from the time columns' type — an ``INTERVAL``
    expression (``F.expr("INTERVAL 7 DAYS")``) for timestamps/dates, a
    number for numeric times. A join against a feed that went quiet
    should surface the gap, not silently pair events with month-old
    state.

    Composition: equi-join on key → time predicate → row_number window
    per left row → rank 1. ``tiebreaker`` pins equal-time ties. The
    tolerance tightens the join condition itself (fewer candidates into
    the window), never a post-filter.

    Scale shape: the equi-join bounds candidates per key so window
    partitions stay small; bucket both sides on the key (see
    write_bucketed) and it runs shuffle-free. For keyless as-of (pure
    time ordering) use ``asof_join_keyless`` below.
    """
    from pyspark.sql import Window

    rk = right_on or on
    l = left.alias("l")
    r = right.alias("r")
    cond = F.col(f"l.{on}") == F.col(f"r.{rk}")
    # Column arithmetic lifts scalars via lit, so one form serves both
    # the numeric and the INTERVAL-expression tolerance
    if direction == "backward":
        cond = cond & (F.col(f"r.{right_time}") <= F.col(f"l.{left_time}"))
        if tolerance is not None:
            cond = cond & (
                F.col(f"r.{right_time}")
                >= F.col(f"l.{left_time}") - tolerance
            )
        order = [F.col(f"r.{right_time}").desc()]
    else:
        cond = cond & (F.col(f"r.{right_time}") >= F.col(f"l.{left_time}"))
        if tolerance is not None:
            cond = cond & (
                F.col(f"r.{right_time}")
                <= F.col(f"l.{left_time}") + tolerance
            )
        order = [F.col(f"r.{right_time}").asc()]
    if tiebreaker:
        order.append(F.col(f"r.{tiebreaker}").asc())
    w = Window.partitionBy(F.col(f"l.{left_id}")).orderBy(*order)
    return (
        l.join(r, cond, "inner")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _asof_keyless_discrete(
    lf: DataFrame,
    rf: DataFrame,
    lt: str,
    rt: str,
    lcols: list[str],
    rcols: list[str],
    hi,
) -> DataFrame:
    """Discrete-domain fast path of ``asof_join_keyless`` for a
    DATE-typed right side: densify the right rows into one covering row
    per calendar day of the right span ([day, next day) validity,
    computed with a lead window over the SMALL build side), then
    broadcast equi-join the fact side on ``least(to_date(left_time),
    max_day)``. The fact table is never shuffled and never window-sorted
    — at 100 TB that deletes the union shuffle + per-bucket sort of the
    generic path entirely; the only data movement is the broadcast of
    one row per day of the right span. Tie semantics are identical to
    the generic path: equal right days resolve to the struct max over
    (time, remaining right columns)."""
    from pyspark.sql import Window

    order_cols = [rt] + [c for c in rcols if c != rt]
    rstruct = F.struct(*[qcol(c) for c in order_cols])
    # one row per distinct right day (to_date also normalizes a
    # day-aligned timestamp right side), ties resolved exactly like the
    # generic path's running-last (struct max)
    rday = rf.groupBy(F.to_date(qcol(rt)).alias("__asof_d0")).agg(
        F.max(rstruct).alias("__r")
    )
    # single-partition window over the build side's DISTINCT days only
    # — small BY CONTRACT (a per-period summary) and hard-bounded by
    # discrete_max_days (default 100k ≈ 274 years of daily rows, a
    # few-MB broadcast at most). partitionBy a constant-valued but
    # UNFOLDABLE expression (x*0; a bare F.lit(0) is constant-folded
    # out of the partition spec): same single partition, without
    # spamming "WindowExec: No Partition Defined" into the executor
    # logs per run — at 100 TB ops read those logs. d0 is never NULL
    # here (NULL right times are filtered before the day groupBy).
    w = Window.partitionBy(
        F.unix_date(F.col("__asof_d0")) * 0
    ).orderBy("__asof_d0")
    rexp = rday.withColumn(
        "__asof_until",
        F.coalesce(F.date_sub(F.lead("__asof_d0").over(w), 1), F.col("__asof_d0")),
    ).select(
        F.explode(F.sequence(F.col("__asof_d0"), F.col("__asof_until"))).alias(
            "__asof_day"
        ),
        "__r",
    )
    # left rows beyond the right span clamp to the last right day; left
    # rows before the span find no covering day and drop (inner as-of)
    probe = lf.withColumn(
        "__asof_day", F.least(F.to_date(qcol(lt)), F.lit(hi))
    )
    return probe.join(F.broadcast(rexp), "__asof_day", "inner").select(
        *[qcol(c) for c in lcols],
        *[F.col("__r").getField(c).alias(c) for c in rcols],
    )


def asof_join_keyless(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    num_buckets: int = 32,
    discrete_max_days: int = 100_000,
) -> DataFrame:
    """Keyless AS-OF join (pure time ordering, no equi key): each left
    row matched to the single latest right row with
    ``right_time <= left_time``. Inner semantics: left rows earlier
    than every right row drop. Equal right times are resolved by the
    lexicographic max over the remaining right columns (deterministic;
    give the right side unique times — e.g. a per-period aggregate —
    for an engine-independent result).

    Scale shape (a global sort/window would serialize onto one
    partition): range-bucket BOTH sides on evenly spaced cut points of
    the RIGHT side's time span, union probe and build rows into one
    frame, and run a per-bucket running ``last(right_struct,
    ignoreNulls)`` window ordered by (time, side, struct) — right rows
    sort before left rows at equal times (exact matches included) and
    equal-time right rows resolve to the struct max. Everything stays
    JVM-side in whole-stage codegen: no Python workers, no Arrow
    transfer of the fact table (this replaced an applyInPandas
    cogroup + pandas.merge_asof formulation — same results, ~3× less
    wall time, and deterministic even with duplicate right times).
    Bucket heads are fixed by a driver-side prefix-carry: one tiny
    aggregate computes each bucket's latest right row, a prefix scan
    hands bucket b the latest row from buckets < b, and that carry row
    is injected as an extra build row of bucket b (its earlier
    timestamp sorts it first inside the bucket). Cost: one min/max
    aggregate over the SMALL right side (the left/fact side is never
    pre-scanned — any cut points are correct, the carry fixes
    boundaries; an approxQuantile over the left would add a full extra
    pass over the big table purely for balance), one small aggregate,
    one union shuffle into ``num_buckets`` window partitions — no
    global sort. Left rows beyond the right span share the edge
    buckets; if the LEFT side is heavily skewed inside the right span,
    raise ``num_buckets``.
    """
    from pyspark.sql import Window
    from pyspark.sql.types import IntegerType, StructField, StructType

    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"left/right column collision: {sorted(overlap)}")
    lt, rt = left_time, right_time
    lf = left.filter(qcol(lt).isNotNull())
    # The build side of an as-of is small BY CONTRACT (a per-period
    # summary); the operator needs it for three separate jobs (span
    # probe, per-bucket carry, final merge). Materialize it once —
    # without this, an expensive upstream aggregate re-runs per job
    # (measured 3× a 0.4s orders rollup at sf0.1).
    rf = right.filter(qcol(rt).isNotNull()).localCheckpoint(eager=True)
    lcols, rcols = list(lf.columns), list(rf.columns)

    # Discrete-domain fast path: a day-granular right side (DATE type,
    # or a timestamp column whose values are all midnight — one probe
    # aggregate over the SMALL checkpointed build side decides) over a
    # bounded span needs no union-window merge at all — densified
    # calendar days + one broadcast equi-join (zero fact-side shuffle).
    # Falls through to the generic bucketed merge for continuous
    # timestamps or an unbounded/empty span.
    def _tnum(df: DataFrame, tcol: str):
        # monotonic numeric image of the time column (for quantiles +
        # bucket assignment only — the merge compares raw values);
        # TIMESTAMP_NTZ/DATE need the ltz hop to reach DOUBLE
        if df.schema[tcol].dataType.typeName() in {
            "timestamp", "timestamp_ntz", "date"
        }:
            return qcol(tcol).cast("timestamp_ltz").cast("double")
        return qcol(tcol).cast("double")

    rt_tn = rf.schema[rt].dataType.typeName()
    lt_tn = lf.schema[lt].dataType.typeName()
    num_lo = num_hi = None
    probed_num = False
    if (
        discrete_max_days
        and rt_tn in {"date", "timestamp", "timestamp_ntz"}
        and lt_tn in {"date", "timestamp", "timestamp_ntz"}
    ):
        # ONE probe aggregate decides the fast path AND carries the
        # numeric span the generic fallback needs — a misaligned right
        # side must not pay a second driver-blocking job
        aggs = [
            F.min(F.to_date(qcol(rt))).alias("lo"),
            F.max(F.to_date(qcol(rt))).alias("hi"),
            F.min(_tnum(rf, rt)).alias("nlo"),
            F.max(_tnum(rf, rt)).alias("nhi"),
        ]
        if rt_tn != "date":
            aggs.append(
                F.max(
                    (qcol(rt) != F.date_trunc("DAY", qcol(rt))).cast("int")
                ).alias("misaligned")
            )
        dspan = rf.agg(*aggs).first()
        dlo, dhi = dspan["lo"], dspan["hi"]
        aligned = rt_tn == "date" or not dspan["misaligned"]
        if (
            dlo is not None
            and aligned
            and (dhi - dlo).days + 1 <= discrete_max_days
        ):
            return _asof_keyless_discrete(lf, rf, lt, rt, lcols, rcols, dhi)
        num_lo, num_hi = dspan["nlo"], dspan["nhi"]
        probed_num = True

    # evenly spaced cut points across the right side's [min, max] time
    # span (any cuts are CORRECT — the carry fixes boundaries — cuts
    # only balance work); num_buckets=1 means no cuts (single bucket)
    bounds: list[float] = []
    if num_buckets > 1:
        if not probed_num:
            span = rf.agg(
                F.min(_tnum(rf, rt)).alias("lo"),
                F.max(_tnum(rf, rt)).alias("hi"),
            ).first()
            num_lo, num_hi = span["lo"], span["hi"]
        if num_lo is not None and num_hi is not None and num_hi > num_lo:
            step = (num_hi - num_lo) / num_buckets
            bounds = sorted({num_lo + i * step for i in range(1, num_buckets)})
    barr = F.array(*[F.lit(float(b)) for b in bounds])

    def bucketed(df: DataFrame, tcol: str) -> DataFrame:
        t = _tnum(df, tcol)
        return df.withColumn(
            "__bucket", F.size(F.filter(barr, lambda b: b <= t))
        )

    lb, rb = bucketed(lf, lt), bucketed(rf, rt)

    # per-bucket latest right row → driver prefix scan (|buckets| rows)
    order_cols = [rt] + [c for c in rcols if c != rt]
    per_bucket = (
        rb.groupBy("__bucket")
        .agg(F.max(F.struct(*order_cols)).alias("__last"))
        .collect()
    )
    last_by_bucket = {int(r["__bucket"]): r["__last"].asDict() for r in per_bucket}
    carry_rows: list[tuple] = []
    running: dict | None = None
    for b in range(len(bounds) + 1):
        if running is not None:
            carry_rows.append(tuple([b] + [running[c] for c in rcols]))
        running = last_by_bucket.get(b, running)

    # build rows: right side (+ injected carry seeds), probe rows: left
    rstruct = F.struct(*[qcol(c) for c in order_cols])
    rfields = {f.name: f for f in rf.schema.fields}
    build = rb.select(
        F.col("__bucket"),
        _tnum(rb, rt).alias("__t"),
        F.lit(0).alias("__side"),
        rstruct.alias("__r"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in lf.schema.fields],
    )
    if carry_rows:
        seed_schema = StructType(
            [StructField("__bucket", IntegerType(), False)]
            + [rfields[c] for c in rcols]
        )
        seeds = rb.sparkSession.createDataFrame(carry_rows, seed_schema)
        build = build.unionByName(
            seeds.select(
                "__bucket",
                _tnum(seeds, rt).alias("__t"),
                F.lit(0).alias("__side"),
                rstruct.alias("__r"),
                *[
                    F.lit(None).cast(f.dataType).alias(f.name)
                    for f in lf.schema.fields
                ],
            )
        )
    rstruct_type = build.schema["__r"].dataType
    probe = lb.select(
        F.col("__bucket"),
        _tnum(lb, lt).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rstruct_type).alias("__r"),
        *[qcol(c) for c in lcols],
    )

    # constraint barrier: Spark 4.1's UnionBase.rewriteConstraints
    # crashes (NoSuchElementException in PruneFilters) when a union
    # child carries an isnotnull constraint on a nullable time column —
    # exactly what the null-drop filters above create. inline(array(
    # struct(...))) is a Generate node whose output attrs are fresh, so
    # child constraints are severed before the union; one codegen'd
    # no-op per side, no data movement.
    def _barrier(df: DataFrame) -> DataFrame:
        return df.select(
            F.inline(F.array(F.struct(*[df[_q(c)] for c in df.columns])))
        )

    # running last-non-null right struct per bucket: right rows sort
    # before left rows at equal __t (backward as-of includes exact
    # matches); equal-time right rows sort by __r so "last" = struct max
    w = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__r").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = _barrier(build).unionByName(_barrier(probe)).withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    )
    return matched.filter(
        (F.col("__side") == 1) & F.col("__m").isNotNull()
    ).select(
        *[qcol(c) for c in lcols],
        *[F.col("__m").getField(c).alias(c) for c in rcols],
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffle equi-join: the fact side gets a per-row salt in
    [0, salt), the dim side is replicated ``salt``× (explode of a salt
    array), and the join runs on (key, salt) — a hot key's rows spread
    over ``salt`` reducers instead of melting one.

    Result set is IDENTICAL to the plain join (every fact row meets its
    dim row exactly once, at its own salt) — which is what makes it
    oracle-checkable. Use when the dim is too big to broadcast AND the
    fact key is skewed; AQE's skew-join split handles the same problem
    reactively, this handles it by construction.

    ``how`` is restricted to fact-preserving joins: under 'right'/
    'full', every UNMATCHED dim row would surface once per replica
    (salt× duplicates), silently breaking the identical-result
    guarantee above.
    """
    # every Spark spelling of the fact-preserving join types
    allowed = {"inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join how={how!r} would duplicate unmatched dim rows "
            "salt x; use an inner/left/semi/anti join"
        )
    fct = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int"),
    )
    dm = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = fct.join(
        dm,
        (fct[_q(fact_key)] == dm[_q(dim_key)]) & (fct["__salt"] == dm["__salt"]),
        how,
    )
    return out.drop("__salt")


def _q(name: str) -> str:
    return f"`{name}`" if "." in name else name


# ------------------------------------------------------------ range join
def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    time_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Point-in-interval range join: every (point, interval) pair with
    ``start <= ts <= end`` — the classic Spark pain point (a naive
    ``ON ts BETWEEN s AND e`` is a BroadcastNestedLoopJoin / cartesian
    at scale because there is no equi-key).

    Scale shape: both sides map onto coarse time buckets of
    ``bucket_seconds``; each interval explodes to the buckets it
    covers, each point to exactly one, and the match becomes a bucket
    EQUI-join + exact containment filter. A matching pair meets in
    precisely one bucket (the point's), so no post-join distinct is
    needed. The shuffle is keyed on bucket — time-uniform data spreads
    evenly; a hot bucket is AQE skew-split.

    Pick ``bucket_seconds`` near the median interval length: the
    explode factor is ~len/bucket_seconds per interval, while too-wide
    buckets inflate the false-pair filter work. An interval wider than
    ``max_buckets_per_interval`` buckets fails the job loudly
    (``raise_error``) rather than exploding unboundedly or being
    silently dropped — widen the bucket or split such intervals first.
    Column names of the two inputs must be disjoint (raise otherwise)
    — alias before joining.

    Degenerate rows are handled consistently with how the containment
    filter would treat them, without detouring through the loud-failure
    branch: an interval with a NULL start or end matches nothing and is
    dropped (mirroring a NULL point timestamp, which can satisfy no
    BETWEEN), and an inverted interval (end < start) is empty — it
    produces no buckets at all rather than a descending bucket sequence
    the filter would discard row by row.

    Timestamp columns are bucketed via ``unix_timestamp``; numeric
    columns are used as-is (already in seconds).
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"point/interval column names must be disjoint, both have "
            f"{sorted(overlap)} — alias one side first"
        )

    def _secs(df: DataFrame, col: str):
        dt = dict(df.dtypes)[col]
        c = qcol(col)
        return c.cast("double") if dt in ("bigint", "int", "double",
                                          "float", "long") else (
            F.unix_timestamp(c).cast("double")
        )

    w = float(bucket_seconds)
    p = points.withColumn(
        "__b", F.floor(_secs(points, time_col) / w).cast("long")
    )
    s_b = F.floor(_secs(intervals, start_col) / w).cast("long")
    e_b = F.floor(_secs(intervals, end_col) / w).cast("long")
    empty = F.array().cast("array<bigint>")
    # NULL-bound and inverted intervals match nothing: empty bucket
    # array → explode drops the row (the loud failure is reserved for
    # genuinely oversized intervals, where proceeding would blow up)
    degenerate = (
        F.col("__sb").isNull()
        | F.col("__eb").isNull()
        | (F.col("__eb") < F.col("__sb"))
    )
    guard = (e_b - s_b) < max_buckets_per_interval
    iv = (
        intervals.withColumn("__sb", s_b)
        .withColumn("__eb", e_b)
        .withColumn(
            "__b",
            F.explode(
                F.when(degenerate, empty)
                .when(guard, F.sequence(F.col("__sb"), F.col("__eb")))
                .otherwise(
                    F.raise_error(
                        F.format_string(
                            "interval_join: interval spans %s buckets "
                            "(max %s) — widen bucket_seconds or split "
                            "the interval",
                            (F.col("__eb") - F.col("__sb") + 1).cast("string"),
                            F.lit(str(max_buckets_per_interval)),
                        )
                    ).cast("array<bigint>")
                )
            ),
        )
        .drop("__sb", "__eb")
    )
    joined = p.join(iv, "__b").filter(
        (qcol(time_col) >= qcol(start_col))
        & (qcol(time_col) <= qcol(end_col))
    )
    return joined.drop("__b")


# ------------------------------------------------- join cardinality
def join_cardinality_profile(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    top_k: int = 10,
    pins: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Pre-join explosion detector: BEFORE paying for a join, compute
    exactly how many rows an inner equi-join on ``keys`` would emit
    and which keys drive the cost. Returns (summary, hot_keys):

    - summary (one row): per-side row/key counts, keys on both/one
      side, matched row counts, and ``est_join_rows`` = Σ n_left·n_right
      over matched keys — EXACT for the inner join, and the number
      that exposes an accidental many-to-many (est_join_rows ≫
      max(rows) means the key is not what the author thinks it is);
    - hot_keys (≤ top_k rows): the keys with the largest n_left·n_right
      products — the rows to inspect (or salt, `salted_join`) first.

    Scale shape: one map-side-combining groupBy per side (count tables
    only — never the payloads), one full-outer equi-join of those
    count tables, tree-reduced totals; the hot-key list is a
    TakeOrderedAndProject over products of counts. Cost is two scans +
    a key-cardinality shuffle — orders of magnitude below the join it
    vets; the joined count table is persisted because BOTH returned
    frames read it (append it to ``pins`` to release, the repo-wide
    contract — without the persist, collecting summary then hot would
    rebuild it and double the scans). Products and sums run in
    DECIMAL(38,0): a profile that overflows LongType exactly on the
    extreme explosions it exists to catch would report garbage
    (non-ANSI Spark wraps silently). NULL keys are reported in the
    unmatched counts (SQL equality never matches NULL), not silently
    dropped.
    """
    if not keys:
        raise ValueError("join_cardinality_profile needs join keys")
    key_out = [k.split(".")[-1] for k in keys]
    reserved = {"join_rows", "n_left", "n_right", "__n_l", "__n_r"}
    clash = reserved & set(key_out)
    if clash:
        raise ValueError(
            f"join_cardinality_profile: key columns collide with output "
            f"columns {sorted(clash)}"
        )

    def _counts(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy(
            *[qcol(k).alias(o) for k, o in zip(keys, key_out)]
        ).agg(F.count(F.lit(1)).alias(f"__n_{side}"))

    lc, rc = _counts(left, "l"), _counts(right, "r")
    both = lc.join(rc, on=key_out, how="full_outer").persist()
    if pins is not None:
        pins.append(both)
    # NULL keys never equi-join; full_outer key-equality also keeps
    # them unmatched per side, which is exactly the semantics we report
    nl, nr = F.col("__n_l"), F.col("__n_r")
    dl, dr = nl.cast("decimal(38,0)"), nr.cast("decimal(38,0)")
    has_null_key = None
    for c in key_out:
        cond = F.col(c).isNull()
        has_null_key = cond if has_null_key is None else (has_null_key | cond)
    really_matched = nl.isNotNull() & nr.isNotNull() & ~has_null_key
    # outer coalesce: SUM over ZERO rows is NULL (both inputs empty), and
    # callers do int(est) — an empty profile must report zeros, not None
    zero = F.lit(0)
    summary = both.agg(
        F.coalesce(F.sum(F.coalesce(nl, zero)), zero).alias("rows_left"),
        F.coalesce(F.sum(F.coalesce(nr, zero)), zero).alias("rows_right"),
        F.count(F.when(nl.isNotNull(), 1)).alias("keys_left"),
        F.count(F.when(nr.isNotNull(), 1)).alias("keys_right"),
        F.count(F.when(really_matched, 1)).alias("keys_matched"),
        F.coalesce(
            F.sum(F.when(really_matched, nl).otherwise(zero)), zero
        ).alias("rows_left_matched"),
        F.coalesce(
            F.sum(F.when(really_matched, nr).otherwise(zero)), zero
        ).alias("rows_right_matched"),
        F.coalesce(
            F.sum(
                F.when(really_matched, dl * dr).otherwise(
                    zero.cast("decimal(38,0)")
                )
            ),
            zero.cast("decimal(38,0)"),
        ).alias("est_join_rows"),
    )
    hot = (
        both.filter(really_matched)
        .select(*key_out, (dl * dr).alias("join_rows"), nl.alias("n_left"), nr.alias("n_right"))
        .orderBy(F.col("join_rows").desc(), *[F.col(c).asc() for c in key_out])
        .limit(top_k)
    )
    return summary, hot


# ------------------------------------------------------ bloom-filter gate
def _bloom_pos_sql(key_sql: str, m_bits: int, i: int) -> str:
    """SQL text for deterministic bit position i of a key: md5(key ':'
    i) digits → bigint mod m. Pure md5 arithmetic — no RNG state,
    identical in any engine, any partitioning, any run (the repo's
    standard recipe). Rendered as SQL text, not Column calls — k
    probes per row built from Columns would cost a py4j round-trip
    per node (the similarity-module rule)."""
    return (
        f"(cast(conv(substring(md5(concat_ws(':', "
        f"cast({key_sql} as string), '{i}')), 1, 15), 16, 10) as bigint) "
        f"% {m_bits})"
    )





def bloom_build(
    keys_df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> DataFrame:
    """ONE-ROW DataFrame ``(bits array<long>, m_bits, k_hashes)`` — a
    Bloom filter over the distinct non-NULL keys, as plain relational
    data: bits are packed 64 per long, set via an explode of the k
    md5-derived positions per key + one bit-OR aggregate per word +
    one bounded collect into the array (m_bits/64 longs — 16 KiB at
    m = 2^20, always driver-safe metadata).

    The 100 TB use is the semi-join the engine can't broadcast: when
    the interesting key SET is too large to ship as a broadcast join
    but its bloom is small (1.2 GiB of bits covers 1e9 keys at ~1%
    fpp), ``bloom_filter_gate`` prunes the fact table BEFORE the
    shuffle join — false positives just ride to the real join (which
    stays correct); false negatives are impossible, so no row that
    would have matched is lost.

    Engine-reproducible by construction (md5 arithmetic + integer
    bit-ops) — a DuckDB oracle rebuilds the identical bit array."""
    if m_bits < 64 or m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    n_words = m_bits // 64
    key_sql = _qident_j(key_col)
    pos_list = ", ".join(
        _bloom_pos_sql(key_sql, m_bits, i) for i in range(k_hashes)
    )
    words = (
        keys_df.filter(qcol(key_col).isNotNull())
        .selectExpr(f"explode(array({pos_list})) AS __pos")
        .selectExpr(
            "__pos div 64 AS __word",
            "shiftleft(1L, cast(__pos % 64 AS int)) AS __bit",
        )
        .groupBy("__word")
        .agg(F.bit_or("__bit").alias("__bits"))
    )
    # dense array: absent words are 0 (no key hashed there)
    spark = keys_df.sparkSession
    grid = spark.range(n_words).select(F.col("id").alias("__word"))
    dense = grid.join(words, on="__word", how="left").select(
        "__word",
        F.coalesce(F.col("__bits"), F.lit(0).cast("long")).alias("__bits"),
    )
    return dense.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__word"), F.col("__bits")))
        ).alias("__wb")
    ).select(
        F.transform(F.col("__wb"), lambda s: s["__bits"]).alias("bits"),
        F.lit(m_bits).alias("m_bits"),
        F.lit(k_hashes).alias("k_hashes"),
    )


def bloom_filter_gate(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 5,
) -> DataFrame:
    """Keep rows whose key MIGHT be in the bloom (plus all NULL-key
    rows — a bloom says nothing about NULL, and silently dropping them
    would turn a pre-filter into a semantics change; the downstream
    join drops them itself if it wants inner-join semantics). Schema
    unchanged. Zero false negatives by construction; false positives
    pass through to whatever exact operation follows.

    Plan shape: the one-row bloom broadcasts via crossJoin (a 1-row
    nested-loop — the repo's bounded pattern for scalar state), then
    membership is k array probes + bit tests as pure column
    expressions: the fact table is never shuffled by this gate."""
    if m_bits < 64 or m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    clash = {"bits", "m_bits", "k_hashes"} & set(df.columns)
    if clash:
        raise ValueError(
            f"bloom_filter_gate: input columns {sorted(clash)} collide "
            "with the bloom columns — rename them first"
        )
    key_sql = _qident_j(key_col)
    tests = []
    for i in range(k_hashes):
        p = _bloom_pos_sql(key_sql, m_bits, i)
        tests.append(
            f"(element_at(bits, cast({p} div 64 AS int) + 1) & "
            f"shiftleft(1L, cast({p} % 64 AS int))) != 0"
        )
    member = f"({key_sql} IS NULL) OR ({' AND '.join(tests)})"
    # the bloom row CARRIES its family — a gate called with different
    # m_bits/k_hashes computes positions that don't line up and would
    # silently drop TRUE MATCHES (element_at past the array is NULL,
    # the AND-chain goes NULL, the filter drops the row): validate
    # lazily against the broadcast row instead of trusting the caller
    keep = (
        f"CASE WHEN m_bits <> {m_bits} OR k_hashes <> {k_hashes} THEN "
        f"CAST(raise_error(concat('bloom_filter_gate: bloom was built "
        f"with (m_bits=', CAST(m_bits AS STRING), ', k_hashes=', "
        f"CAST(k_hashes AS STRING), ') but the gate was called with "
        f"(m_bits={m_bits}, k_hashes={k_hashes}) — mismatched positions "
        f"would silently drop true matches')) AS BOOLEAN) "
        f"ELSE ({member}) END"
    )
    return (
        df.crossJoin(F.broadcast(bloom))
        .filter(F.expr(keep))
        .drop("bits", "m_bits", "k_hashes")
    )
