"""Contract-integrity guard: queries()/oracle_sql() must be constructible
and mutually consistent WITHOUT a Spark session.

Round 3 shipped a half-landed rename where both dicts referenced deleted
names and raised NameError at call time — the driver could run zero
queries. This module pins the contract shape so any future refactor that
breaks registration fails in milliseconds at collection, not at the
end-of-round snapshot.
"""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_queries_constructs_and_all_values_callable():
    q = entrymod.queries()
    assert isinstance(q, dict) and q, "queries() must return a non-empty dict"
    for name, fn in q.items():
        assert callable(fn), f"queries()[{name!r}] is not callable"


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    dangling = set(o) - set(q)
    assert not dangling, f"oracle_sql() keys with no queries() entry: {dangling}"
    for name, sql in o.items():
        assert isinstance(sql, str) and sql.strip(), f"empty oracle for {name!r}"


def test_every_query_is_oracle_backed():
    # r15: the r14 verdict established the driver evaluates EVERY
    # declared entry (nothing caps the contract at 50 slots — the old
    # first-50 window assumption is retired with it), so the invariant
    # is now simply: every queries() entry carries an oracle, and vice
    # versa (the subset direction is test_oracle_keys_subset_of_queries).
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    missing = set(q) - set(o)
    assert not missing, f"queries() entries with no oracle: {missing}"


def test_bench_headline_names_exist():
    # HEADLINE is methodology-frozen and resolves q_ functions directly
    # (a query rotated out of the 50-slot contract window keeps its
    # definition and stays benchmarked)
    import bench

    missing = [
        n for n in bench.HEADLINE
        if not callable(getattr(entrymod, f"q_{n}", None))
    ]
    assert not missing, f"bench HEADLINE q_ functions missing: {missing}"


def test_operator_package_exports_resolve():
    """Every name in operators.__all__ imports and is callable — the
    public API surface a user of the package reaches for."""
    import web_api_postgres_etl_spark.operators as ops

    for name in ops.__all__:
        assert callable(getattr(ops, name)), name
