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

from collections.abc import Mapping, Sequence

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


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.7,
    target_rows: int | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based source mixing (the multilingual-LM data-
    balancing move, mBERT/XLM-R exponential smoothing): resample so
    group g's share of the output follows ``c_g^alpha / sum(c^alpha)``
    instead of its raw share ``c_g / sum(c)``. ``alpha=1`` keeps
    natural proportions; ``alpha=0`` equalizes groups; the common
    0.3-0.7 band boosts low-resource sources without flattening the
    mix. ``target_rows`` sets the expected output size (default: the
    input size, i.e. pure re-balancing).

    Down-sampling only: a group whose target share exceeds its size
    keeps ALL its rows (keep probability capped at 1.0) — so the
    realized total can undershoot ``target_rows`` when small groups
    saturate. Up-sampling is a different operator
    (``upsample_by_factor``) because it must replicate rows, not
    filter them. NULL groups form their own group (the md5 draw and
    the null-safe join-back both treat NULL as a value).

    Deterministic: the keep decision is the ``hash_unit`` md5 draw on
    (salt, id) against the group's keep probability — reruns and
    engine ports reproduce the identical row set (pow() is IEEE
    double on both engines; a draw landing within float-error of the
    cutoff is a ~2^-40 event per corpus).

    Scale shape: one count aggregate on the group key (map-side
    combine), one 2-scalar collect (sum c, sum c^alpha), one join of
    the tiny per-group frame back onto the corpus (AQE broadcasts
    it), one filter. No window over the corpus, no global sort.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(qcol(group_col).alias("__g")).agg(
        F.count("*").alias("__c")
    )
    totals = counts.agg(
        F.sum("__c").alias("n"),
        F.sum(F.pow("__c", F.lit(float(alpha)))).alias("s"),
    ).first()
    n_total = int(totals["n"] or 0)
    if n_total == 0:
        return df
    target = float(target_rows if target_rows is not None else n_total)
    s_alpha = float(totals["s"])
    probs = counts.select(
        "__g",
        F.least(
            F.lit(1.0),
            F.lit(target) * F.pow("__c", F.lit(float(alpha)))
            / F.lit(s_alpha) / F.col("__c"),
        ).alias("__p"),
    )
    joined = df.join(
        probs,
        qcol(group_col).eqNullSafe(F.col("__g")),
        "left",
    ).drop("__g")
    return joined.filter(
        hash_unit(qcol(id_col), salt) < F.col("__p")
    ).drop("__p")


def upsample_by_factor(
    df: DataFrame,
    group_col: str,
    id_col: str,
    factors: dict[str, float],
    default_factor: float = 1.0,
    salt: str = "rep",
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Deterministic per-group replication (the 'epochs per source'
    half of a data recipe — e.g. books x3, wiki x2.5, crawl x1):
    every row in group g appears ``floor(f_g)`` times, plus one more
    with probability ``frac(f_g)`` decided by the md5 draw on
    (salt, id) — so a 2.5x group gets exactly 2 or 3 copies per row,
    deterministically, and the group's expected size is f_g * c_g.
    Factors below 1 down-sample the same way (0 or 1 copies);
    ``factor 0`` drops the group. Groups absent from ``factors`` get
    ``default_factor``; NULL groups get ``default_factor`` too (map
    lookup misses) — pre-bucket NULLs if they need their own factor.

    Output rows carry ``copy_col`` (0-based copy index) so
    (id, copy) stays unique for downstream shuffling/packing — pack
    or shard on a composed key, never on the bare id, after
    upsampling.

    Scale shape: one broadcast map lookup + one per-row
    sequence/posexplode bounded by ceil(f) — no shuffle at all; the
    replication multiplies bytes exactly where the recipe asks for
    it. Keep factors modest (single digits) or shard counts grow by
    the same multiple.
    """
    if any(f < 0 for f in factors.values()) or default_factor < 0:
        raise ValueError("factors must be >= 0")
    if copy_col in df.columns:
        raise ValueError(
            f"column {copy_col!r} already exists on the input — pass a "
            "different copy_col instead of silently overwriting it"
        )
    pairs: list[Column] = []
    for k, v in sorted(factors.items()):
        pairs.extend([F.lit(k), F.lit(float(v))])
    fmap = F.create_map(*pairs) if pairs else None
    looked = (
        fmap[qcol(group_col).cast("string")] if fmap is not None
        else F.lit(None).cast("double")
    )
    f = F.coalesce(looked, F.lit(float(default_factor)))
    n_copies = (
        F.floor(f).cast("int")
        + F.when(hash_unit(qcol(id_col), salt) < (f - F.floor(f)), 1)
        .otherwise(0)
    )
    with_n = df.withColumn("__nc", n_copies)
    return (
        with_n.select(
            "*",
            F.posexplode(
                F.when(
                    F.col("__nc") > 0,
                    F.sequence(F.lit(1), F.col("__nc")),
                ).otherwise(F.array().cast("array<int>"))
            ).alias(copy_col, "__one"),
        )
        .drop("__one", "__nc")
    )


def shard_manifest(
    df: DataFrame,
    shard_col: str = "shard",
    token_col: str | None = None,
    content_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-shard reproducibility manifest: (shard, n_rows[, n_tokens],
    content_digest) — the audit artifact a training run records next
    to its shards so a re-materialized corpus can be verified without
    re-reading it row-by-row against the original.

    ``content_digest`` is an ORDER-INSENSITIVE fold: the md5 of each
    row's concatenated ``content_cols`` is split into two 60-bit
    integers and summed per shard with wraparound — a pure function of
    the shard's row MULTISET, never of partitioning or task order (a
    sorted-concat digest would need a per-shard global sort; the sum
    needs only a map-side-combining aggregate). Any single-row
    difference flips the digest (accidental collisions need matched
    120-bit sums — an integrity audit, not a security boundary).

    Scale shape: one pass, one (shard) aggregate; the shuffle carries
    per-partition partial sums — three numbers per shard per task."""
    if content_cols is None:
        content_cols = [
            c for c in df.columns if c != shard_col and c != token_col
        ]
    if not content_cols:
        raise ValueError("content_cols resolved empty — nothing to digest")
    # injective row serialization: escape '%' then the separator inside
    # each value ('%25'/'%1F'), NULL → '%N' (unreachable by escaping,
    # same scheme as pack_key) — without this, ('x\x1fy','z') and
    # ('x','y\x1fz') would concat identically and a changed shard
    # could verify as unchanged
    def _esc(c: str):
        v = F.regexp_replace(
            F.regexp_replace(qcol(c).cast("string"), "%", "%25"),
            "\x1f",
            "%1F",
        )
        return F.coalesce(v, F.lit("%N"))

    row_h = F.md5(F.concat_ws("\x1f", *[_esc(c) for c in content_cols]))
    # DECIMAL(38,0) accumulation, reduced mod 2^60 after the sum: a
    # plain BIGINT sum would trip ANSI ARITHMETIC_OVERFLOW (Spark 4
    # default) at ~16 rows of 60-bit values; decimal holds ~10^38
    # (2^66 rows of 60-bit halves) and the explicit mod keeps the
    # digest a pure multiset invariant
    hi = F.conv(F.substring(row_h, 1, 15), 16, 10).cast("decimal(38,0)")
    lo = F.conv(F.substring(row_h, 16, 15), 16, 10).cast("decimal(38,0)")
    aggs = [
        F.count("*").alias("n_rows"),
        F.sum(hi).alias("__hi"),
        F.sum(lo).alias("__lo"),
    ]
    if token_col is not None:
        aggs.insert(1, F.sum(qcol(token_col).cast("long")).alias("n_tokens"))
    out = df.groupBy(qcol(shard_col).alias(shard_col)).agg(*aggs)
    two60 = F.lit(1 << 60).cast("decimal(38,0)")
    return out.withColumn(
        "content_digest",
        F.concat_ws(
            ":",
            F.format_string("%015x", (F.col("__hi") % two60).cast("long")),
            F.format_string("%015x", (F.col("__lo") % two60).cast("long")),
        ),
    ).drop("__hi", "__lo")


# --------------------------------------------------- exact-n sampling
def sample_exact(
    df: DataFrame,
    n: int,
    id_col: str,
    salt: str = "sample",
    by: str | None = None,
) -> DataFrame:
    """Deterministic EXACT-size uniform sample: the ``n`` rows whose
    ``md5(salt # id)`` draws are smallest — globally, or per ``by``
    group (n from EACH group; short groups keep all their rows). The
    eval-subset carve: probabilistic filters (`deterministic_split`)
    give binomial-sized output, while benchmarks need exactly n; and
    md5 ordering keeps the engine-wide no-RNG-state rule — the same
    rows are chosen on any cluster, any partitioning, any day, and a
    changed ``salt`` is a fresh draw.

    Scale shape: global form is one TakeOrderedAndProject (per-
    partition heap of n, no full sort materialized); grouped form is
    one keyed-window shuffle (internal ``__rank``, so frames already
    carrying a ``rank`` column pass through untouched). Determinism
    requires ``id_col`` unique — the engine-wide id assumption (same
    caveat as ``dedup_last_wins`` ties): rows SHARING an id share
    both draw and tiebreak, and a cut between them would be
    partition-order-dependent. ``quota_by_group`` is the sibling
    per-group cap keyed to its own fixed salt; this is the
    salt-parameterized exact-n face.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    draw = F.md5(
        F.concat_ws("#", F.lit(salt), qcol(id_col).cast("string"))
    )
    if by is None:
        return (
            df.withColumn("__draw", draw)
            .orderBy(F.col("__draw").asc(), qcol(id_col).asc())
            .limit(n)
            .drop("__draw")
        )
    w = Window.partitionBy(qcol(by)).orderBy(
        F.col("__draw").asc(), qcol(id_col).asc()
    )
    return (
        df.withColumn("__draw", draw)
        .withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= n)
        .drop("__draw", "__rank")
    )


def assign_folds(
    df: DataFrame,
    id_col: str,
    k: int = 5,
    salt: str = "fold",
    fold_col: str = "fold",
) -> DataFrame:
    """K-fold cross-validation assignment: ``fold`` = md5(salt # id)
    mod k — the evaluation-tooling sibling of ``deterministic_split``,
    with the same guarantees (stable across reruns and partitionings,
    a row never changes fold when the corpus grows, any engine
    reproduces it). Folds are ~equal-sized by hash uniformity, not
    exactly equal (use ``sample_exact`` when an exact count matters).
    Train/test for fold i = (fold != i, fold == i).

    One narrow projection — no shuffle, no RNG state."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if fold_col in df.columns:
        raise ValueError(
            f"assign_folds: column {fold_col!r} already exists — "
            "rename it or pass fold_col"
        )
    return df.withColumn(
        fold_col, (_md5_key(id_col, salt, 13) % k).cast("int")
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 1.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-group deterministic Bernoulli sampling: keep a row iff its
    md5 draw on (salt, id) falls under its group's fraction — the
    explicit-fraction sibling of ``temperature_sample`` (which COMPUTES
    the fractions from group counts). Groups absent from ``fractions``
    keep ``default_fraction`` of their rows; the NULL stratum is
    addressable with a ``None`` key (an equality test would never
    match it — the NULL-safe branch below does), and absent that it
    uses the default (rows are never silently dropped by key shape).
    Same guarantees as every md5 draw here: rerun/partitioning-stable,
    exact-engine-reproducible, and a row's fate never changes as the
    corpus grows. Requires unique ids (duplicate ids share one draw)."""
    for g, f in fractions.items():
        if not 0.0 <= float(f) <= 1.0:
            raise ValueError(f"fraction for group {g!r} must be in [0, 1], got {f}")
    if not 0.0 <= float(default_fraction) <= 1.0:
        raise ValueError(
            f"default_fraction must be in [0, 1], got {default_fraction}"
        )
    u = hash_unit(id_col, salt)
    frac = F.lit(float(default_fraction))
    for g, f in sorted(fractions.items(), key=repr):
        cond = (
            qcol(group_col).isNull()
            if g is None
            else qcol(group_col) == F.lit(g)
        )
        frac = F.when(cond, F.lit(float(f))).otherwise(frac)
    return df.filter(u < frac)


def _aes_race_key(
    id_col: str, weight_col: str, salt: str, caller: str
) -> Column:
    """The ONE definition of the A-ES race key both weighted draws
    share (global top-n and per-group): ``ln(u) / w`` with u the md5
    draw for (salt, id) shifted into (0, 1] — one 16^-13 quantum, so
    ln(u) is always finite (u = 0 would race at -inf and make that row
    unselectable, a silent hole in the distribution). Negative weights
    raise lazily with the caller's name. Splitting this definition
    across call sites would let the two draws drift apart for the same
    (id, salt, weight) — determinism-critical arithmetic lives once."""
    w = qcol(weight_col).cast("double")
    guard = F.when(
        w < 0,
        F.raise_error(
            F.concat(
                F.lit(f"{caller}: negative weight in {weight_col!r}: "),
                w.cast("string"),
            )
        ).cast("double"),
    ).otherwise(w)
    u = (
        _md5_key(id_col, salt, 13).cast("double") + F.lit(1.0)
    ) / F.lit(float(16**13))
    return F.log(u) / guard


def weighted_sample_exact_n(
    df: DataFrame,
    n: int,
    id_col: str,
    weight_col: str,
    salt: str = "",
    key_out: str | None = None,
) -> DataFrame:
    """Exactly ``min(n, eligible rows)`` rows drawn WITHOUT replacement
    with probability proportional to ``weight_col`` — the A-ES
    weighted-reservoir construction (Efraimidis & Spirakis 2006) on
    deterministic draws: each row races with key ``ln(u) / w`` where
    ``u`` is the md5-uniform draw for (salt, id), and the n LARGEST
    keys win (for one exponential race, P(i beats j) = w_i/(w_i+w_j),
    which composes to proportional-to-weight inclusion). This is the
    per-ROW quality-weighted subsample (DCLM-style "sample by
    classifier score") that ``temperature_sample`` — a per-GROUP mix —
    cannot express.

    Determinism contract: the same as every md5 draw in this module —
    identical output for any partitioning, any engine computing the
    same arithmetic, any rerun; vary ``salt`` for independent draws.
    ``id_col`` must be unique per row (duplicate ids share one u and
    win or lose together — correlated, not resampled). Rows with NULL,
    zero, or negative weight are EXCLUDED (zero weight means zero
    inclusion probability; a negative weight is a caller bug and
    raises rather than silently reordering the race).

    ``key_out`` optionally keeps the race key as a column (audit the
    draw). Scale shape: one narrow map + ORDER BY LIMIT n — Spark
    executes it as per-partition top-n + a tiny final merge
    (TakeOrderedAndProject), never a global sort."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = qcol(weight_col).cast("double")
    key = _aes_race_key(id_col, weight_col, salt, "weighted_sample_exact_n")
    if "__wskey" in df.columns:
        raise ValueError(
            "weighted_sample_exact_n: input column '__wskey' collides "
            "with the race key — rename it first"
        )
    eligible = df.filter(w.isNotNull() & (w != 0)).withColumn(
        "__wskey", key
    )
    # id ascending breaks exact race-key ties (52-bit md5 prefixes CAN
    # collide at billion-row scale; equal-weight duplicate ids always
    # do) — without it a tie straddling the limit boundary makes the
    # selected set partition-order-dependent
    out = eligible.orderBy(F.col("__wskey").desc(), qcol(id_col)).limit(n)
    if key_out is not None:
        return out.withColumnRenamed("__wskey", key_out)
    return out.drop("__wskey")


def weighted_sample_per_group(
    df: DataFrame,
    n: int,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    salt: str = "",
    key_out: str | None = None,
) -> DataFrame:
    """Per-GROUP :func:`weighted_sample_exact_n`: exactly
    ``min(n, eligible rows)`` rows per group, drawn without replacement
    proportional to ``weight_col`` — the per-domain / per-language
    quality-weighted cap (keep the n best-drawn docs per source,
    DCLM-style) that the global draw cannot express and
    ``quota_by_group``'s UNWEIGHTED md5 cap does not weight.

    Same A-ES race (``ln(u)/w``), same determinism contract (unique
    non-NULL ids, md5 draws, salt for independence), same eligibility
    (NULL/zero weight excluded, negative raises), same tiebreak (id
    ascending after the race key). NULL group keys form their own
    group, like every groupBy.

    Scale shape: ONE window — row_number over (group) ordered by
    (key DESC, id) — so the shuffle is the normal hash partition on
    the group keys and per-partition state is the running top-n.
    ``group_cols`` must be non-empty: for a global draw use
    ``weighted_sample_exact_n``, whose TakeOrderedAndProject plan
    needs no single-partition window (the documented empty-keys
    window trap)."""
    from pyspark.sql import Window

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if not group_cols:
        raise ValueError(
            "group_cols must be non-empty — use weighted_sample_exact_n "
            "for a global draw (it avoids a single-partition window)"
        )
    clash = {"__wskey", "__wsrn"} & {c.split(".")[-1] for c in df.columns}
    if clash:
        raise ValueError(
            f"weighted_sample_per_group: input columns {sorted(clash)} "
            "collide with the race-key columns — rename them first"
        )
    w = qcol(weight_col).cast("double")
    key = _aes_race_key(id_col, weight_col, salt, "weighted_sample_per_group")
    win = Window.partitionBy(*[qcol(g) for g in group_cols]).orderBy(
        F.col("__wskey").desc(), qcol(id_col)
    )
    out = (
        df.filter(w.isNotNull() & (w != 0))
        .withColumn("__wskey", key)
        .withColumn("__wsrn", F.row_number().over(win))
        .filter(F.col("__wsrn") <= n)
        .drop("__wsrn")
    )
    if key_out is not None:
        return out.withColumnRenamed("__wskey", key_out)
    return out.drop("__wskey")
