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

from .project import qcol


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
    broadcast_dims: bool = True,
) -> DataFrame:
    """J1: chained star join — fact ⋈ dim1 ⋈ dim2 ⋈ …

    ``dims`` is a sequence of ``(dim_df, fact_side_key, dim_key)`` where
    ``fact_side_key`` may live on the original fact or on a previously
    joined dim (the reference chains instruments→assets→categories and
    instruments→exchanges — mabna_tables_create.py:235-243).

    Each dim is broadcast: the fact table is never shuffled, which is
    the correct physical plan for a 100 TB fact × kB..MB dims star.
    """
    out = fact
    for dim, left_key, right_key in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
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
) -> DataFrame:
    """AS-OF join (an operator Spark lacks natively): for each left row
    (identified by unique ``left_id``), the single most recent matching
    right row whose time is ≤ the left time (``backward``; ``forward``
    = earliest ≥). Inner semantics: unmatched left rows drop.

    Composition: equi-join on key → time predicate → row_number window
    per left row → rank 1. ``tiebreaker`` pins equal-time ties.

    Scale shape: the equi-join bounds candidates per key so window
    partitions stay small; bucket both sides on the key (see
    write_bucketed) and it runs shuffle-free. For keyless as-of (pure
    time ordering), range-partition on time and merge with mapInPandas.
    """
    from pyspark.sql import Window

    rk = right_on or on
    l = left.alias("l")
    r = right.alias("r")
    cond = F.col(f"l.{on}") == F.col(f"r.{rk}")
    if direction == "backward":
        cond = cond & (F.col(f"r.{right_time}") <= F.col(f"l.{left_time}"))
        order = [F.col(f"r.{right_time}").desc()]
    else:
        cond = cond & (F.col(f"r.{right_time}") >= F.col(f"l.{left_time}"))
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
    """
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
