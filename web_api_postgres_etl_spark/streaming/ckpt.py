"""Checkpoint-scoped partition tags — the ONE definition.

The streaming stores (agg_stream, sketch_stream, curation_stream)
write each micro-batch to its own partition keyed
``{ckpt_tag(checkpoint_dir)}-{batch_id}`` with dynamic partition
overwrite, which makes a replayed batch overwrite itself (idempotent
at-least-once). Three hand-maintained copies of the tag recipe is how
round 7's bug happened — sketch_stream normalized the path before
hashing, the other two did not, so ``'/x'`` vs ``'/x/'`` gave a
replayed batch a DIFFERENT tag and the merged store double-counted.

MIGRATION NOTE (round 8): the tag now hashes the rstrip('/')-
normalized path everywhere. A store whose writer passed a
trailing-slash checkpoint spelling BEFORE this change carries
partitions under the old un-normalized tag; resuming the same
checkpoint after upgrading re-tags future (and replayed) batches under
the normalized tag, so a batch replayed across the upgrade boundary
would duplicate instead of overwrite. Fold such stores once
(``compact_agg_state`` / the family's compaction) or start a fresh
checkpoint before resuming.

The tag is checkpoint-PATH-scoped: resetting to a NEW checkpoint path
duplicates contributions visibly (a compaction's job to fold), but
deleting and reusing the SAME path restarts batch_id at 0 under the
same tag — the replayed first batch overwrites {tag}-0 while stale
{tag}-1..n remain and the merged state silently over-counts. Pair any
checkpoint reset with a fresh checkpoint dir.
"""

from __future__ import annotations

import hashlib


def ckpt_tag(checkpoint_dir: str) -> str:
    """8-hex-char tag for a checkpoint path; normalized so every
    spelling of one path maps to ONE tag."""
    return hashlib.md5(checkpoint_dir.rstrip("/").encode()).hexdigest()[:8]


def is_missing_path_error(exc) -> bool:
    """True when an AnalysisException means "nothing readable at this
    path" — the bootstrap face every partial-state store must
    distinguish from a real failure (permissions, corrupt footers).
    THE one matcher: Spark 4 spells it PATH_NOT_FOUND /
    UNABLE_TO_INFER_SCHEMA, older releases spell the message out; a
    zero-row write leaves only _SUCCESS, which reads as the
    schema-inference face. Four modules used to carry private copies
    of this block — exactly the drift that caused round 7's replay
    double-count (one copy normalized, the others didn't)."""
    msg = str(exc)
    return (
        "PATH_NOT_FOUND" in msg
        or "Path does not exist" in msg
        or "UNABLE_TO_INFER_SCHEMA" in msg
        or "Unable to infer schema" in msg
    )


def state_has_files(state_dir: str) -> bool:
    """True when a state directory holds any non-hidden data file —
    the "are there existing partitions a missing sidecar would orphan"
    probe (a store with data but no readable sidecar must REFUSE to
    adopt whatever family the next writer brings)."""
    import os

    if not os.path.isdir(state_dir):
        return False
    for root, dirs, files in os.walk(state_dir):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if not f.startswith(("_", ".")):
                return True
    return False
