"""Degenerate-scale smoke: every contract query must RUN at sf0.001.

Catalyst behavior is data-dependent — round 4 hit a
UnionBase.rewriteConstraints crash that reproduced ONLY at sf0.001
(parquet column nullability differs per file), while sf0.01/sf0.1 were
green. The driver also smoke-checks entry() at sf0.001, so this is the
exact surface it exercises first.

r11 trim: tests/test_plan_shapes.py's nested-loop scan already
COLLECTS every non-SKIP contract entry at this same sf0.001 — a
degenerate-scale crash fails there identically, so re-running those
~44 entries here only repeated the work. This file keeps the coverage
the plan scan deliberately skips: entry() and the run-to-produce
streaming/pipeline entries whose plans are post-hoc.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.test_plan_shapes import SKIP as PLAN_SCAN_SKIPS

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    assert entrymod.entry(spark).count() >= 0


@pytest.mark.parametrize("name", sorted(PLAN_SCAN_SKIPS))
def test_query_runs_at_smallest_sf(spark, name):
    df = entrymod.queries()[name](spark, SF)
    assert df.count() >= 0
    assert df.columns, f"{name} returned no columns"
