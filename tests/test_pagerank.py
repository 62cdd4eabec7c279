"""PageRank (operators/graph.py): the pinned integer arithmetic is
reproduced EXACTLY by a literal Python model, ranks are
partitioning-invariant (the whole point of integer mass units),
planted structure is recovered, and the edge-universe semantics hold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_api_postgres_etl_spark.operators.graph import pagerank

M = 10**12


def _model(node_ids, edge_list, damping_pm=850, iterations=10):
    """Literal Python twin of the pinned arithmetic."""
    n = len(node_ids)
    outdeg: dict = {}
    for s, _ in edge_list:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: M // n for v in node_ids}
    teleport = ((1000 - damping_pm) * M) // (1000 * n)
    for _ in range(iterations):
        dangling = sum(r[v] for v in node_ids if v not in outdeg)
        share = {v: r[v] // outdeg[v] for v in node_ids if v in outdeg}
        inflow = {v: 0 for v in node_ids}
        for s, d in edge_list:
            if s in share and d in inflow:
                inflow[d] += share[s]
        r = {
            v: teleport
            + (damping_pm * (inflow[v] + dangling // n)) // 1000
            for v in node_ids
        }
    return r


GRAPH = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 2), (5, 2),
    (2, 6), (6, 0), (7, 8),  # 9 is dangling, 8 is dangling
]
NODES = list(range(10))


def _frames(spark):
    nodes = spark.createDataFrame([(v,) for v in NODES], "id long")
    edges = spark.createDataFrame(GRAPH, "src long, dst long")
    return nodes, edges


def test_matches_python_model_exactly(spark):
    nodes, edges = _frames(spark)
    got = {
        r["id"]: r["rank_units"]
        for r in pagerank(nodes, edges, iterations=10).collect()
    }
    want = _model(NODES, GRAPH, 850, 10)
    assert got == want
    # node 2 is the planted hub (5 in-links): top rank
    assert max(got, key=got.get) == 2
    # convenience double is the single exact division
    rows = {r["id"]: r["rank"] for r in pagerank(nodes, edges).collect()}
    assert rows[2] == pytest.approx(got[2] / M, rel=0, abs=0)


def test_partitioning_invariance(spark):
    """Identical rank_units under different shuffle partitionings —
    the property float PageRank cannot give."""
    nodes, edges = _frames(spark)
    a = {
        r["id"]: r["rank_units"]
        for r in pagerank(
            nodes.repartition(7), edges.repartition(3), iterations=8
        ).collect()
    }
    b = {
        r["id"]: r["rank_units"]
        for r in pagerank(
            nodes.coalesce(1), edges.repartition(11), iterations=8
        ).collect()
    }
    assert a == b


def test_mass_conservation_and_dangling(spark):
    nodes, edges = _frames(spark)
    got = {
        r["id"]: r["rank_units"]
        for r in pagerank(nodes, edges, iterations=5).collect()
    }
    total = sum(got.values())
    # floor divisions leak strictly sub-unit mass per node/edge/round:
    # bounded well under (N + E + 2) * iterations units
    assert M >= total > M - (len(NODES) + len(GRAPH) + 2) * 5 * 2
    # a dangling-only graph is pure teleport + redistributed dangling
    iso_nodes = spark.createDataFrame([(1,), (2,)], "id long")
    no_edges = spark.createDataFrame([], "src long, dst long")
    iso = {
        r["id"]: r["rank_units"]
        for r in pagerank(iso_nodes, no_edges, iterations=3).collect()
    }
    assert iso[1] == iso[2]  # symmetry


def test_universe_semantics_and_guards(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "id long")
    # edges referencing unknown nodes: src 99 contributes nothing,
    # dst 99 receives nothing (and adds no row)
    edges = spark.createDataFrame(
        [(1, 2), (99, 1), (2, 99)], "src long, dst long"
    )
    got = {r["id"]: r["rank_units"] for r in pagerank(nodes, edges).collect()}
    assert set(got) == {1, 2}
    want = _model([1, 2], [(1, 2), (99, 1), (2, 99)])
    # the model drops unknown endpoints the same way (guards in loop)
    assert got == {k: v for k, v in want.items() if k in (1, 2)}

    with pytest.raises(ValueError, match="damping"):
        pagerank(nodes, edges, damping=1.5)
    with pytest.raises(ValueError, match="iterations"):
        pagerank(nodes, edges, iterations=0)
    empty = spark.createDataFrame([], "id long")
    with pytest.raises(ValueError, match="empty node table"):
        pagerank(empty, edges)


def test_pins_contract(spark):
    from web_api_postgres_etl_spark.plans.curation import release_pins

    nodes, edges = _frames(spark)
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    pins: list = []
    pagerank(nodes, edges, iterations=3, pins=pins).collect()
    assert pins
    release_pins(pins)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= before


def _ppr_model(node_ids, edge_list, seed_ids, damping_pm=850, iterations=10):
    """Literal Python twin of the personalized arithmetic."""
    ns = len(seed_ids)
    seeds = set(seed_ids)
    outdeg: dict = {}
    for s, _ in edge_list:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: (M // ns if v in seeds else 0) for v in node_ids}
    teleport = ((1000 - damping_pm) * M) // (1000 * ns)
    for _ in range(iterations):
        dangling = sum(r[v] for v in node_ids if v not in outdeg)
        share = {v: r[v] // outdeg[v] for v in node_ids if v in outdeg}
        inflow = {v: 0 for v in node_ids}
        for s, d in edge_list:
            if s in share and d in inflow:
                inflow[d] += share[s]
        r = {
            v: (teleport if v in seeds else 0)
            + (damping_pm * (inflow[v]
                             + (dangling // ns if v in seeds else 0)))
            // 1000
            for v in node_ids
        }
    return r


# Spark PPR ranks on the shared fixture (seeds {3,4}, 10 rounds),
# computed once per session and reused by the mirror test — the
# iterative localCheckpoint loop is the expensive half of both tests
# and its output is identical (r13 suite-time trim, r12 VERDICT #7)
_PPR_FIXTURE_RANKS: dict = {}


def _ppr_fixture_ranks(spark):
    if not _PPR_FIXTURE_RANKS:
        from web_api_postgres_etl_spark.operators.graph import pagerank

        nodes, edges = _frames(spark)
        seeds = spark.createDataFrame([(3,), (4,)], "id long")
        _PPR_FIXTURE_RANKS.update({
            r["id"]: r["rank_units"]
            for r in pagerank(nodes, edges, seeds=seeds).collect()
        })
    return dict(_PPR_FIXTURE_RANKS)


def test_personalized_matches_python_model_exactly(spark):
    """Seeded restart, integer-exact: the Spark ranks equal the Python
    twin unit-for-unit; seeds-as-all-nodes reduces EXACTLY to plain
    pagerank; mass concentrates near the seeds; out-of-universe seeds
    drop; an empty effective seed set raises."""
    import pytest as pt

    from web_api_postgres_etl_spark.operators.graph import pagerank

    nodes, edges = _frames(spark)
    got = _ppr_fixture_ranks(spark)
    want = _ppr_model(NODES, GRAPH, [3, 4])
    assert got == want
    # seed-adjacent beats seed-distant: 3 and 4 both point at 2
    assert got[2] > got[8] and got[2] > got[9]
    # all-nodes seeds ≡ plain pagerank, unit-for-unit
    allseed = {
        r["id"]: r["rank_units"]
        for r in pagerank(nodes, edges, seeds=nodes).collect()
    }
    plain = {
        r["id"]: r["rank_units"]
        for r in pagerank(nodes, edges).collect()
    }
    assert allseed == plain
    # out-of-universe seeds are dropped (universe contract); the
    # surviving seed alone defines the restart
    mixed = spark.createDataFrame([(3,), (777,)], "id long")
    got_m = {
        r["id"]: r["rank_units"]
        for r in pagerank(nodes, edges, seeds=mixed).collect()
    }
    assert got_m == _ppr_model(NODES, GRAPH, [3])
    with pt.raises(ValueError, match="no seeds inside"):
        pagerank(
            nodes, edges,
            seeds=spark.createDataFrame([(999,)], "id long"),
        )


def test_personalized_duckdb_mirror_oracle_ready(spark, oracle):
    """The seeded integer arithmetic unrolls to DuckDB CTE rounds
    exactly like the pagerank driver row's oracle — seed-conditional
    teleport and dangling redistribution — and matches the Spark ranks
    unit-for-unit on the shared fixture graph (seeds {3, 4}, 10
    rounds). Since r13 this is the FIXTURE twin of the live
    `pagerank_personalized` driver row (tests/test_oracle_parity.py),
    which generalizes the mirror to an in-SQL data-dependent seed
    count; the Spark ranks are shared with the model test (one
    iterative run per session)."""
    got = _ppr_fixture_ranks(spark)
    seed_sql = "(3, 4)"
    ns = 2
    teleport = ((1000 - 850) * M) // (1000 * ns)
    vals_nodes = ", ".join(f"({v})" for v in NODES)
    vals_edges = ", ".join(f"({s}, {d})" for s, d in GRAPH)
    ctes = [
        f"nodes0(id) AS (VALUES {vals_nodes})",
        f"edges0(src, dst) AS (VALUES {vals_edges})",
        "outdeg AS (SELECT src AS id, COUNT(*) AS deg FROM edges0"
        " GROUP BY src)",
        "base AS (SELECT n.id AS id, o.deg AS deg FROM nodes0 n"
        " LEFT JOIN outdeg o ON n.id = o.id)",
        f"r0 AS MATERIALIZED (SELECT b.id, b.deg, CASE WHEN b.id IN {seed_sql}"
        f" THEN {M // ns} ELSE 0 END AS r FROM base b)",
    ]
    for k in range(10):
        ctes.append(
            f"d{k} AS (SELECT COALESCE(SUM(r), 0) AS s FROM r{k}"
            " WHERE deg IS NULL)"
        )
        ctes.append(
            f"i{k} AS (SELECT e.dst AS id, SUM(r.r // r.deg) AS s"
            f" FROM edges0 e JOIN r{k} r ON e.src = r.id"
            " WHERE r.deg IS NOT NULL GROUP BY e.dst)"
        )
        ctes.append(
            f"r{k + 1} AS MATERIALIZED (SELECT b.id, b.deg,"
            f" (CASE WHEN b.id IN {seed_sql} THEN {teleport} ELSE 0 END)"
            f" + ((850 * (COALESCE(x.s, 0)"
            f" + (CASE WHEN b.id IN {seed_sql} THEN dd.s // {ns}"
            f" ELSE 0 END))) // 1000) AS r"
            f" FROM base b CROSS JOIN d{k} dd"
            f" LEFT JOIN i{k} x ON b.id = x.id)"
        )
    sql = (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT CAST(id AS BIGINT) AS id,"
        " CAST(r AS BIGINT) AS rank_units FROM r10"
    )
    want = dict(oracle.execute(sql).fetchall())
    assert got == want
