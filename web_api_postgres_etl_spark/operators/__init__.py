"""Composable DataFrame operators (SURVEY.md §2).

Each operator is a function ``DataFrame -> DataFrame`` (or a small
builder returning one) so pipelines compose with plain chaining while
Catalyst still sees one lazy plan per pipeline — filters and projections
written here reach the parquet scan as PushedFilters/ReadSchema.
"""

from .aggregates import max_watermark, max_watermarks
from .dedup import dedup_exact, dedup_last_wins
from .filters import drop_required_nulls, in_range, newer_than
from .joins import star_join, two_way_join
from .project import project, project_alias, drop_columns, qcol

__all__ = [
    "dedup_exact",
    "dedup_last_wins",
    "drop_columns",
    "drop_required_nulls",
    "in_range",
    "max_watermark",
    "max_watermarks",
    "newer_than",
    "project",
    "project_alias",
    "qcol",
    "star_join",
    "two_way_join",
]
