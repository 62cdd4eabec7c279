"""Count-min sketch — a BOUNDED-SIZE mergeable frequency summary.

``key_skew_profile`` (aggregates.py) is exact but its intermediate is
one row per DISTINCT key — fine for join keys, wrong for open-ended
domains (URLs, n-grams, user agents) where the distinct count is
itself corpus-sized. The count-min sketch caps the state at
``depth × width`` integer counters no matter the cardinality, answers
point frequency queries with a one-sided guarantee (estimate ≥ true
count; error ≤ N/width with probability 1 - (1/2)^depth for the
classic 2-universal construction), and MERGES by cell-wise addition —
the property that makes it a streaming / incremental-maintenance
state: sketch(batch₁ ∪ batch₂) ≡ sketch(batch₁) ⊕ sketch(batch₂),
bit-for-bit, because every cell is an exact integer count.

Representation: a sparse DataFrame of (row, bucket, cnt) cells —
untouched cells are absent (zero), so small batches stay small and a
parquet roundtrip is trivial. Hashing is the repo's standard md5
arithmetic (13 hex chars = a 52-bit integer, mod width), so any
engine reproduces the cells exactly; no RNG state, no seeds to ship.

Scale shape: building is ONE map-side-combining groupBy on
(row, bucket) — the shuffle carries at most depth × width rows
regardless of input size; merging is a union + the same groupBy;
point queries join the value list (bounded, caller-supplied) against
the cells and take the min over rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .project import qcol


def _bucket(value: Column, row: int, width: int) -> Column:
    """md5-arithmetic bucket of ``value`` for hash row ``row`` — the
    same 52-bit draw every sampling operator in the repo uses, keyed
    by the row index so the depth hash functions are independent."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(f"cms{row}"), value)), 1, 13),
        16,
        10,
    ).cast("long")
    return (h % width).cast("int")


def _check(depth: int, width: int) -> None:
    if depth < 1 or depth > 16:
        raise ValueError(f"depth must be in [1, 16], got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """(row, bucket, cnt) — the sketch of ``col``'s value frequencies.
    NULL values are not events (skipped, like COUNT(col)). Each input
    row lands in exactly ``depth`` cells; the result has at most
    depth × width rows however large the input."""
    _check(depth, width)
    v = qcol(col).cast("string")
    rows = df.filter(qcol(col).isNotNull()).select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("row"),
                    _bucket(v, j, width).alias("bucket"),
                )
                for j in range(depth)
            ])
        ).alias("__c")
    )
    return rows.groupBy(
        F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — sketches built with the SAME (depth, width)
    merge exactly: merged ≡ the sketch of the concatenated inputs,
    bit-for-bit (integer counters, order-free addition). Merging
    sketches of different shapes is silently wrong (cells are
    positional), so keep the family parameters with the artifact —
    same discipline as the minhash index sidecar."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    values: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(value, est) — the count-min point estimate for every value in
    ``values`` (distinct, NULLs dropped): min over the depth rows of
    the addressed cells, absent cells = 0. Guarantee: est ≥ true
    count, with overshoot bounded by collisions (exact when the
    addressed cells saw no other values).

    Scale shape: the value list is caller-bounded (candidates, top
    suspects, a vocabulary slice); each value probes ``depth`` cells
    via one equi-join against the ≤ depth × width cell table —
    broadcast-sized by construction."""
    _check(depth, width)
    v = qcol(value_col).cast("string")
    probes = (
        values.filter(qcol(value_col).isNotNull())
        .select(v.alias("value"))
        .distinct()
        .select(
            "value",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(j).alias("row"),
                        _bucket(F.col("value"), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ])
            ).alias("__c"),
        )
        .select("value", F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
    )
    joined = probes.join(F.broadcast(sketch), on=["row", "bucket"], how="left")
    return joined.groupBy("value").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    candidates: DataFrame,
    min_count: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(value, est) for candidate values whose estimated frequency
    reaches ``min_count`` — the sketch-side heavy-hitter filter. The
    one-sided guarantee means NO false negatives (a value with true
    count ≥ min_count always survives); false positives are bounded
    by collisions and verified downstream if exactness matters (one
    semi-join + count on the survivors only)."""
    sk = cms_build(df, col, depth, width)
    est = cms_estimate(sk, candidates, col, depth, width)
    return est.filter(F.col("est") >= min_count)
