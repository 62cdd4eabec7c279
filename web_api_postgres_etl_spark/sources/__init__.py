"""Source/sink connectors (SURVEY.md §2.1)."""

from .json_flatten import flatten
from .writers import write_append, write_overwrite

__all__ = ["flatten", "write_append", "write_overwrite"]
