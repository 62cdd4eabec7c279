"""Curation sampling operators for a training-data pipeline.

The reference has no sampling surface (its pipelines move whole
tables — mabna_tables_create.py:141-146); a 100 TB corpus pipeline
needs deterministic, resumable selection: train/val splits that never
move a document between splits across reruns, per-domain caps so no
single source dominates (CCNet/Gopher-style), token-budget draws, and
a reproducible global shuffle for shard writing.

Design rules shared by every operator here:

- **No RNG state.** Randomness is md5 of the id — the same row lands
  in the same split/shard on every run, on any cluster, and the exact
  construction is replicable in any SQL engine with md5 (same trade as
  the MinHash/SimHash oracles in operators.dedup).
- **No global sorts of the corpus.** Splits and shards are per-row
  hash arithmetic (narrow, codegen'd); quota/budget caps use windows
  partitioned by the group key, so state never exceeds one group's
  rows per partition — skewed groups are bounded by the quota itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .project import qcol


def _md5_key(id_col: Column | str, salt: str, hex_chars: int) -> Column:
    """The ONE definition of the portable md5 integer key every
    sampling draw derives from: the first ``hex_chars`` hex chars of
    md5(salt # id) as a BIGINT — replicable in any engine with md5."""
    c = qcol(id_col) if isinstance(id_col, str) else id_col
    digest = F.md5(F.concat_ws("#", F.lit(salt), c.cast("string")))
    return F.conv(F.substring(digest, 1, hex_chars), 16, 10).cast("long")


def hash_unit(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform draw in [0, 1): the first 13 hex chars of
    md5(salt || id) scaled by 16^13. 13 hex chars = 52 bits, within the
    DOUBLE mantissa, so the integer→double cast is EXACT and any SQL
    engine computing the same construction lands on the identical
    double — no rounding disagreement at split boundaries."""
    return _md5_key(id_col, salt, 13).cast("double") / F.lit(float(16**13))


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign every row a split label ('train'/'val'/...) with the
    given weights, keyed ONLY on md5(salt, id): stable across reruns,
    insensitive to partitioning/row order, and a document can never
    migrate between splits when the corpus grows (its draw depends on
    its id alone). Weights are normalized; label boundaries are the
    cumulative weight prefix. Returns the input plus a ``split``
    column — a narrow projection, no shuffle."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError(f"weights must sum > 0, got {weights}")
    u = hash_unit(id_col, salt)
    acc = 0.0
    expr = None
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def quota_by_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    quota: int,
    priority_col: str | None = None,
) -> DataFrame:
    """Keep at most ``quota`` rows per group (per-domain caps): rank
    rows inside each group and keep rank ≤ quota. Ranking order is
    ``priority_col`` DESC when given (keep the best N), else the
    deterministic md5 draw (keep a uniform N); ``id_col`` breaks ties
    so the result is a function of the data, not the partitioning.

    Scale shape: one hash-partitioned window on the group key — state
    per partition is one group at a time, and AQE's skew split handles
    a hot domain. No global sort, no collect."""
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    if priority_col is not None:
        order = [qcol(priority_col).desc(), qcol(id_col).asc()]
    else:
        order = [hash_unit(id_col, "quota").asc(), qcol(id_col).asc()]
    w = Window.partitionBy(qcol(group_col)).orderBy(*order)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= quota)
        .drop("__rank")
    )


def token_budget_by_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    token_col: str,
    budget: int,
    priority_col: str | None = None,
) -> DataFrame:
    """Select rows per group until the group's cumulative token count
    reaches ``budget`` (the 'give me 10B tokens per language' draw).
    Rows are taken in priority order (``priority_col`` DESC, else the
    deterministic md5 draw), tie-broken by id; a row is kept while the
    running total INCLUDING it stays within budget. Rows that are
    individually over budget are pre-filtered — they could never be
    kept, and must not poison their group's running sum. (A row that
    fits individually but overflows the running sum still consumes it —
    prefix semantics, not greedy knapsack, which would need sequential
    state.) Adds ``tokens_running`` (the inclusive running sum over
    surviving rows) for auditability.

    Same scale shape as ``quota_by_group``: one window partitioned by
    the group key, running sum bounded per group."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    df = df.filter(qcol(token_col).cast("long") <= budget)
    if priority_col is not None:
        order = [qcol(priority_col).desc(), qcol(id_col).asc()]
    else:
        order = [hash_unit(id_col, "budget").asc(), qcol(id_col).asc()]
    w = (
        Window.partitionBy(qcol(group_col))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(
            "tokens_running", F.sum(qcol(token_col).cast("long")).over(w)
        )
        .filter(F.col("tokens_running") <= budget)
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    salt: str = "shard",
) -> DataFrame:
    """Deterministic global shuffle for training-shard writing: every
    row gets a ``shard`` in [0, num_shards) and a stable pseudorandom
    position inside it, both pure functions of md5(salt, id). Writing
    is ``.repartition(num_shards, "shard")`` + ``sortWithinPartitions
    ("shard", "shard_pos")`` → ``partitionBy("shard")`` — one shuffle,
    no global sort, and a rerun reproduces byte-identical shards (the
    property that makes data-loading order auditable).

    Returns the input plus ``shard`` and ``shard_pos`` columns so
    callers can also just ``orderBy(shard, shard_pos, id)`` at small
    scale (always tie-break on the id: ``shard_pos`` is a 60-bit
    digest, which WILL collide at billions of rows).
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    key = _md5_key(id_col, salt, 15)
    return df.withColumn("shard", (key % num_shards).cast("int")).withColumn(
        "shard_pos", key
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    window: int,
    num_shards: int = 64,
    salt: str = "pack",
    group_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-window packs (the training-side
    'concatenate docs to sequence length' step, minus tokenization):
    every row gets (shard, pack_id, pack_offset, pack_key) where
    ``pack_offset`` is the document's first token position inside its
    pack and ``pack_key`` is the SELF-CONTAINED pack identity
    (``[group#]shard#pack_id``). With ``group_col`` set, ``pack_id``
    restarts per (group, shard) — consumers must key packs by
    ``pack_key`` (or the full (group, shard, pack_id) triple), never by
    (shard, pack_id) alone, or rows from different groups (e.g. train
    and val) silently share a pack identity.

    Construction: deterministic md5 shard + in-shard pseudorandom order
    (both pure functions of the id), then an inclusive running token
    sum per shard; ``pack_id = floor(exclusive_cumsum / window)`` — a
    document lands in the pack holding its first token, so a pack can
    overflow by at most one document's tokens (streaming first-token
    binning, the standard approximation; exact bin packing is
    sequential and not worth a distributed pass). Documents longer than
    ``window`` still pack (they would overflow any pack); pre-split or
    filter them upstream if the consumer requires hard caps.

    Scale shape: one hash-partitioned window per shard — no global
    sort, no driver state; reruns reproduce the identical packing.

    ``group_col`` scopes packs: the running sum partitions on
    (group, shard) so a pack never mixes rows from different groups —
    pass the train/val split column or a pack can straddle the split
    boundary (train sequences silently absorbing eval text).
    """
    if window < 1 or num_shards < 1:
        raise ValueError(
            f"need window >= 1 and num_shards >= 1, got {window}, {num_shards}"
        )
    sharded = shuffle_shards(df, id_col, num_shards, salt)
    part_cols = [qcol(group_col), F.col("shard")] if group_col else [F.col("shard")]
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("shard_pos").asc(), qcol(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(qcol(token_col).cast("long")).over(w)
    excl = run - qcol(token_col).cast("long")
    # pack_key must be injective: concat_ws silently SKIPS NULLs (a
    # NULL group would alias the no-group 'shard#pack' format) and a
    # '#' inside a group value could alias another group — so escape
    # '%'/'#' (URL-style, injective) and send NULL to '%N', which no
    # escaped real value can produce ('%' always escapes to '%25')
    if group_col:
        esc = F.regexp_replace(
            F.regexp_replace(qcol(group_col).cast("string"), "%", "%25"),
            "#",
            "%23",
        )
        group_parts = [F.coalesce(esc, F.lit("%N"))]
    else:
        group_parts = []
    key_parts = group_parts + [
        F.col("shard").cast("string"),
        F.col("pack_id").cast("string"),
    ]
    return (
        sharded.withColumn("pack_id", F.floor(excl / F.lit(window)))
        .withColumn("pack_offset", excl - F.col("pack_id") * F.lit(window))
        .withColumn("pack_key", F.concat_ws("#", *key_parts))
        .drop("shard_pos")
    )


def write_shuffled_shards(
    df: DataFrame, path: str, id_col: str, num_shards: int, salt: str = "shard"
) -> None:
    """Materialize ``shuffle_shards`` as one parquet directory per
    shard: a single hash shuffle into ``num_shards`` partitions, rows
    ordered by the deterministic position within each."""
    sharded = shuffle_shards(df, id_col, num_shards, salt)
    (
        # id tiebreaker: shard_pos is a 60-bit digest — collisions are
        # expected at billions of rows, and an untied sort would make
        # "byte-identical rerun" silently false exactly at scale
        sharded.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "shard_pos", qcol(id_col))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """``deterministic_split`` with a leakage guarantee: near-duplicate
    documents always land in the SAME split. Splitting by document id
    leaks — a train doc's near-twin in the eval split inflates every
    metric — so the draw is keyed on the document's near-dup CLUSTER
    representative (connected components over ``pairs``, min reachable
    id), not the document itself. Isolated docs are their own cluster,
    so for a dedup'd corpus this degrades to the plain split.

    ``pairs`` (id_a, id_b): any near-dup pair source —
    minhash_lsh_candidates output, verified near_dup_pairs, or
    semantic_dup_pairs. Returns the input plus ``split`` and the
    ``split_key`` (cluster representative) it was keyed on.

    Scale shape: the components loop shuffles (node, label) ids only
    (O(log n) pointer-doubling rounds), then ONE broadcast-or-shuffle
    join attaches the representative; the split itself stays a narrow
    projection.
    """
    from .graph import dedup_clusters

    clusters = dedup_clusters(df, pairs, id_col).select(
        qcol(id_col).alias(id_col), F.col("cluster").alias("split_key")
    )
    with_key = df.join(clusters, on=id_col, how="left").withColumn(
        "split_key", F.coalesce(F.col("split_key"), qcol(id_col))
    )
    return deterministic_split(with_key, "split_key", weights, salt)


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_words: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Split documents into fixed word-count chunks with optional
    overlap — the standard pre-training prep step between curation and
    sequence packing (long documents must become context-window-sized
    pieces; the overlap preserves cross-boundary context).

    Output: (id, chunk_idx, chunk_text, n_chunk_words), one row per
    chunk, whitespace normalized to single spaces inside chunks
    (chunks are reassembled word lists). A document shorter than one
    chunk yields exactly one chunk; NULL/empty text yields none.

    Pure expressions + one posexplode: the only row growth is the
    chunk fan-out itself, there is no shuffle at all. The word array is
    bound to a projected column before the slicing lambda (the HOF
    inline-subtree trap, see operators.dedup.word_shingles).
    """
    if chunk_words < 1:
        raise ValueError(f"chunk_words must be >= 1, got {chunk_words}")
    if not 0 <= overlap < chunk_words:
        raise ValueError(
            f"need 0 <= overlap < chunk_words, got overlap={overlap}"
        )
    step = chunk_words - overlap
    words_df = df.select(
        qcol(id_col).alias("__id"),
        F.filter(
            F.split(qcol(text_col), r"\s+"), lambda w: w != ""
        ).alias("__w"),
    )
    n = F.size(F.col("__w"))
    # starts: 1, 1+step, 1+2*step, …; ceil((n-overlap)/step) chunks,
    # floored at 1 so a non-empty doc with n <= overlap still yields
    # its single (short) chunk instead of silently vanishing
    n_chunks = F.when(
        n > 0,
        F.greatest(
            F.ceil((n - F.lit(overlap)).cast("double") / F.lit(step)),
            F.lit(1),
        ),
    ).otherwise(F.lit(0)).cast("int")
    starts = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: i * F.lit(step) + 1,
        ),
    ).otherwise(F.array().cast("array<int>"))
    chunks = words_df.select(
        "__id",
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.concat_ws(
                    " ", F.slice(F.col("__w"), s, chunk_words)
                ),
            )
        ).alias("chunk_idx", "chunk_text"),
    )
    return chunks.select(
        F.col("__id").alias(id_col),
        "chunk_idx",
        "chunk_text",
        F.size(
            F.filter(F.split("chunk_text", " "), lambda w: w != "")
        ).alias("n_chunk_words"),
    )
