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
