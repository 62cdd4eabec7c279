"""Source/sink connectors (SURVEY.md §2.1)."""

from .json_flatten import flatten
from .jsonl import (
    read_csv_corpus,
    read_jsonl_corpus,
    stream_jsonl_corpus,
    write_jsonl,
)
from .writers import write_append, write_overwrite

__all__ = [
    "flatten",
    "read_csv_corpus",
    "read_jsonl_corpus",
    "stream_jsonl_corpus",
    "write_append",
    "write_jsonl",
    "write_overwrite",
]
