"""Entity-resolution operators: fuzzy (edit-distance) joins over short
string keys — names, titles, codes, URLs.

The all-pairs `levenshtein` comparison is quadratic and never runs
here. Candidate generation uses SymSpell-style DELETION NEIGHBORHOODS
(Garbe's symmetric delete algorithm): two strings within edit
distance ``k`` (insert/delete/substitute) always share at least one
string reachable from each by at most ``k`` character deletions —
substitution meets in the middle (one deletion on each side),
insertion/deletion on one side only. So an equi-self-join on the
md5 digests of every ≤k-deletion variant finds EVERY qualifying pair
(lossless, unlike q-gram count filters whose bound collapses on
short strings), and ``F.levenshtein`` verifies only those
candidates.

Scale shape: a row explodes into O(len^k) variant digests (len+1 for
k=1 — designed for short keys; a guard refuses long strings rather
than silently exploding), the join shuffles (digest, id) pairs, and
verification is candidates-only. Same banded-join discipline as the
MinHash/SimHash/winnowing generators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .project import qcol


def _deletion_variants(s):
    """array<string> of ``s`` plus every 1-deletion variant."""
    n = F.length(s)
    one = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, n)),
    )
    return F.array_distinct(
        F.concat(
            F.array(s),
            F.when(n >= 1, one).otherwise(F.array().cast("array<string>")),
        )
    )


def deletion_neighborhood(text_col, k: int = 1, max_len: int = 64):
    """array<string>: every string reachable by deleting at most ``k``
    characters (k in {1, 2}), the original included. Pure column
    expression. Strings longer than ``max_len`` raise at runtime via
    ``raise_error`` — the neighborhood is O(len^k) and a rogue long
    value would explode a task silently otherwise."""
    if k not in (1, 2):
        raise ValueError(f"k must be 1 or 2, got {k}")
    c = qcol(text_col) if isinstance(text_col, str) else text_col
    guarded = F.when(
        F.length(c) > max_len,
        F.raise_error(
            F.concat(
                F.lit(f"deletion_neighborhood: value longer than {max_len}: "),
                c,
            )
        ),
    ).otherwise(c)
    vars1 = _deletion_variants(guarded)
    if k == 1:
        return vars1
    # depth 2: variants of every depth-1 variant, deduplicated
    nested = F.transform(vars1, _deletion_variants)
    return F.array_distinct(F.flatten(nested))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_col: str,
    right_col: str,
    max_distance: int = 1,
    max_len: int = 64,
    cache_candidates: bool = True,
    pins: list[DataFrame] | None = None,
) -> DataFrame:
    """(left_id, right_id, left value, right value, distance) — every
    cross-frame pair whose values are within ``max_distance`` edits
    (exact levenshtein, verified). NULL keys never match. Candidates
    come from the deletion-neighborhood digest join (lossless for
    edit distance ≤ k), so no cross product ever forms.

    ``cache_candidates`` persists the distinct candidate pairs —
    consumed by the verify join's build side once per input frame —
    with the usual ``pins`` release contract.
    """
    if max_distance not in (1, 2):
        raise ValueError(f"max_distance must be 1 or 2, got {max_distance}")

    def _sig(df: DataFrame, id_col: str, col: str, side: str) -> DataFrame:
        return (
            df.filter(qcol(col).isNotNull())
            .select(
                qcol(id_col).alias(f"{side}_id"),
                qcol(col).alias(f"{side}_val"),
            )
            .withColumn(
                "__d",
                F.explode(
                    deletion_neighborhood(f"{side}_val", max_distance, max_len)
                ),
            )
            .select(f"{side}_id", f"{side}_val", F.md5("__d").alias("__d"))
        )

    lsig = _sig(left, left_id, left_col, "l")
    rsig = _sig(right, right_id, right_col, "r")
    cands = lsig.join(rsig, "__d").select(
        "l_id", "l_val", "r_id", "r_val"
    ).distinct()
    if cache_candidates:
        cands = cands.persist()
        if pins is not None:
            pins.append(cands)
    out = cands.withColumn(
        "distance", F.levenshtein("l_val", "r_val")
    ).filter(F.col("distance") <= max_distance)
    return out.select(
        F.col("l_id").alias(left_id if left_id != right_id else f"{left_id}_l"),
        F.col("r_id").alias(right_id if left_id != right_id else f"{right_id}_r"),
        F.col("l_val").alias("left_value"),
        F.col("r_val").alias("right_value"),
        "distance",
    )


def fuzzy_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 1,
    max_len: int = 64,
) -> DataFrame:
    """(id_a, id_b, distance) — within-frame pairs (id_a < id_b) whose
    values are within ``max_distance`` edits: the dedup face (typo'd
    names, mistyped codes). Same lossless neighborhood join."""
    out = fuzzy_join(
        df, df, id_col, id_col, text_col, text_col,
        max_distance, max_len, cache_candidates=False,
    )
    a, b = f"{id_col}_l", f"{id_col}_r"
    return (
        out.filter(F.col(a) < F.col(b))
        .select(
            F.col(a).alias("id_a"), F.col(b).alias("id_b"), "distance"
        )
        .distinct()
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 1,
    max_len: int = 64,
    pins: list | None = None,
) -> DataFrame:
    """Entity resolution end-to-end: fuzzy-duplicate pairs →
    connected components → one CANONICAL id per entity cluster.
    Returns the input rows plus ``entity_id`` (the minimum member id —
    deterministic) and ``is_canonical`` (TRUE on the representative
    row), so callers can either collapse to representatives
    (``filter(is_canonical)``) or keep a full alias→canonical mapping
    (the "customer X and customer X' are the same party" table this
    module exists for).

    Edit distance is not transitive, so clusters CHAIN by design:
    "kathy"~"cathy"~"cath" groups all three even though the ends are 2
    apart — the standard transitive-closure semantics of pair-based
    resolution (same convention as ``graph.dedup_clusters``). Pairs
    come from the lossless deletion-neighborhood join (no missed
    matches ≤ max_distance); components run pointer-doubling
    (O(log n) rounds) via ``connected_components_fast``.

    A NULL id cannot join back to its component label (NULL never
    equals NULL), so NULL ids raise loudly instead of silently
    vanishing from the output. The component pass localCheckpoints its
    label frame; pass ``pins=[]`` and release after materializing
    (``caching.release_frame``) in long-lived sessions — the
    repo-wide pins contract.
    """
    from .graph import connected_components_fast

    checked = F.when(
        qcol(id_col).isNull(),
        F.raise_error(
            F.lit(f"resolve_entities: NULL {id_col} cannot be resolved")
        ),
    ).otherwise(qcol(id_col))
    pairs = fuzzy_dup_pairs(df, id_col, text_col, max_distance, max_len)
    comp = connected_components_fast(
        df.select(checked.alias("id")),
        pairs,
        pins=pins,
    )
    labeled = df.join(
        comp.select(
            F.col("id").alias(id_col), F.col("component").alias("entity_id")
        ),
        on=id_col,
        how="inner",
    )
    return labeled.withColumn(
        "is_canonical", qcol(id_col) == F.col("entity_id")
    )
