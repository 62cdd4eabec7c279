"""Curation sampling: determinism, quota/budget enforcement, shard
reproducibility (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_api_postgres_etl_spark.operators.sampling import (
    deterministic_split,
    quota_by_group,
    shuffle_shards,
    token_budget_by_group,
    write_shuffled_shards,
)


def _ids(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_split_is_stable_and_roughly_proportional(spark):
    df = _ids(spark)
    out = deterministic_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 <= counts["train"] / 2000 <= 0.85
    # partitioning-insensitive: identical labels after a reshuffle
    again = deterministic_split(df.repartition(7), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in again.collect()}
    assert a == b


def test_split_never_migrates_when_corpus_grows(spark):
    small = deterministic_split(_ids(spark, 500), "doc_id", {"train": 0.9, "val": 0.1})
    big = deterministic_split(_ids(spark, 2000), "doc_id", {"train": 0.9, "val": 0.1})
    s = {r["doc_id"]: r["split"] for r in small.collect()}
    g = {r["doc_id"]: r["split"] for r in big.collect()}
    assert all(g[d] == lbl for d, lbl in s.items())


def test_split_rejects_bad_weights(spark):
    with pytest.raises(ValueError):
        deterministic_split(_ids(spark, 10), "doc_id", {})
    with pytest.raises(ValueError):
        deterministic_split(_ids(spark, 10), "doc_id", {"a": 0.0})


def test_quota_caps_every_group_and_keeps_best_priority(spark):
    rows = [(i, f"d{i % 3}", float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, score double")
    capped = quota_by_group(df, "domain", "doc_id", quota=4, priority_col="score")
    sizes = {r["domain"]: r["n"] for r in capped.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"d0": 4, "d1": 4, "d2": 4}
    # priority DESC: each domain keeps its 4 highest scores
    for dom, off in [("d0", 0), ("d1", 1), ("d2", 2)]:
        ids = sorted(x["doc_id"] for x in capped.filter(F.col("domain") == dom).collect())
        assert ids == [off + 18, off + 21, off + 24, off + 27]


def test_quota_uniform_draw_is_deterministic(spark):
    df = spark.createDataFrame([(i, f"d{i % 2}") for i in range(40)], "doc_id long, domain string")
    a = sorted(r["doc_id"] for r in quota_by_group(df, "domain", "doc_id", 5).collect())
    b = sorted(r["doc_id"] for r in quota_by_group(df.repartition(5), "domain", "doc_id", 5).collect())
    assert a == b and len(a) == 10


def test_token_budget_inclusive_running_sum(spark):
    rows = [
        (1, "en", 400, 9.0),
        (2, "en", 400, 8.0),
        (3, "en", 400, 7.0),   # third 400 would pass 1000 → dropped
        (4, "en", 150, 6.0),   # would ALSO exceed: running order is by priority
        (5, "fa", 2000, 9.0),  # single doc over budget → dropped
        (6, "fa", 900, 8.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, tokens int, score double")
    out = token_budget_by_group(df, "lang", "doc_id", "tokens", budget=1000, priority_col="score")
    got = {r["doc_id"]: r["tokens_running"] for r in out.collect()}
    assert got == {1: 400, 2: 800, 6: 900}


def test_pack_sequences_first_token_binning(spark):
    from web_api_postgres_etl_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, 300) for i in range(20)], "doc_id long, tokens int"
    )
    out = pack_sequences(df, "doc_id", "tokens", window=1000, num_shards=2)
    rows = out.collect()
    assert len(rows) == 20
    # offsets are first-token positions: within [0, window)
    assert all(0 <= r["pack_offset"] < 1000 for r in rows)
    # per (shard, pack): total tokens never exceed window + one doc
    by_pack: dict[tuple, int] = {}
    for r in rows:
        by_pack[(r["shard"], r["pack_id"])] = by_pack.get((r["shard"], r["pack_id"]), 0) + 300
    assert all(tot <= 1000 + 300 for tot in by_pack.values())
    # pack ids are dense from 0 within each shard
    for s in {r["shard"] for r in rows}:
        packs = sorted({r["pack_id"] for r in rows if r["shard"] == s})
        assert packs == list(range(len(packs)))
    # deterministic across partitioning
    again = pack_sequences(df.repartition(7), "doc_id", "tokens", 1000, 2).collect()
    a = {r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"]) for r in rows}
    b = {r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"]) for r in again}
    assert a == b


def test_shards_partition_and_reproduce(spark, tmp_path):
    df = _ids(spark, 300)
    sharded = shuffle_shards(df, "doc_id", num_shards=8)
    shards = [r["shard"] for r in sharded.select("shard").distinct().collect()]
    assert set(shards) <= set(range(8)) and len(shards) == 8
    # stable across partitioning
    a = {r["doc_id"]: (r["shard"], r["shard_pos"]) for r in sharded.collect()}
    b = {
        r["doc_id"]: (r["shard"], r["shard_pos"])
        for r in shuffle_shards(df.repartition(11), "doc_id", 8).collect()
    }
    assert a == b

    path = str(tmp_path / "shards")
    write_shuffled_shards(df, path, "doc_id", num_shards=8)
    out = spark.read.parquet(path)
    assert out.count() == 300
    assert out.select("shard").distinct().count() == 8
    # within a shard the file order IS the deterministic position order
    one = spark.read.parquet(path + "/shard=3").coalesce(1).collect()
    pos = [r["shard_pos"] for r in one]
    assert pos == sorted(pos)


def test_leakage_safe_split_keeps_near_dups_together(spark):
    """Every near-dup pair must land in one split; isolated docs get
    the same label the plain split would give them."""
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.dedup import near_dup_pairs
    from web_api_postgres_etl_spark.operators.sampling import (
        deterministic_split,
        leakage_safe_split,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pairs = near_dup_pairs(
        docs, "doc_id", "text", shingle_n=2, num_hashes=8, bands=4,
        threshold=0.5,
    ).select("id_a", "id_b")
    out = leakage_safe_split(
        docs, pairs, "doc_id", {"train": 0.8, "val": 0.2}
    )
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    pair_rows = pairs.collect()
    assert pair_rows, "need near-dup pairs for the test to bite"
    for r in pair_rows:
        assert split_of[r["id_a"]] == split_of[r["id_b"]], (
            r["id_a"], r["id_b"])
    # isolated docs: same label as the plain split keyed on their id
    paired_ids = {x for r in pair_rows for x in (r["id_a"], r["id_b"])}
    plain = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(
            docs, "doc_id", {"train": 0.8, "val": 0.2}
        ).collect()
    }
    isolated = set(split_of) - paired_ids
    assert isolated
    # representative of an isolated doc is itself → identical draw
    for d in isolated:
        assert split_of[d] == plain[d]


def test_chunk_documents_ground_truth(spark):
    from web_api_postgres_etl_spark.operators.sampling import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))  # w0..w9
    df = spark.createDataFrame(
        [(1, text), (2, "short doc"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", chunk_words=4, overlap=1)
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_words"])
        for r in out.collect()
    }
    # doc 1: n=10, step 3 → ceil((10-1)/3) = 3 chunks at starts 1,4,7;
    # a 4th chunk (start 10, just "w9") would contain only words the
    # overlap already covered, so it is not emitted
    assert rows[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert rows[(1, 1)] == ("w3 w4 w5 w6", 4)
    assert rows[(1, 2)] == ("w6 w7 w8 w9", 4)
    assert (1, 3) not in rows
    assert rows[(2, 0)] == ("short doc", 2)
    assert not any(k[0] in (3, 4) for k in rows)  # NULL/empty → no chunks


def test_chunk_documents_covers_every_word_no_overlap(spark):
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.sampling import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = chunk_documents(docs, "doc_id", "text", chunk_words=32, overlap=0)
    # with zero overlap, total chunk words == total doc words
    total_chunk = out.agg(F.sum("n_chunk_words")).collect()[0][0]
    total_doc = docs.select(
        F.size(
            F.filter(F.split("text", r"\s+"), lambda w: w != "")
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total_chunk == total_doc
    # chunk_idx dense from 0 per doc
    from pyspark.sql.window import Window
    w = Window.partitionBy("doc_id").orderBy("chunk_idx")
    dense = out.withColumn("rn", F.row_number().over(w) - 1)
    assert dense.filter(F.col("rn") != F.col("chunk_idx")).count() == 0


def test_chunk_documents_validates_params(spark):
    import pytest

    from web_api_postgres_etl_spark.operators.sampling import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="chunk_words"):
        chunk_documents(df, "doc_id", "text", chunk_words=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", chunk_words=4, overlap=4)


def test_pack_sequences_group_col_isolates_packs(spark):
    """With group_col, a (group, shard, pack_id) pack never mixes
    groups, and offsets restart per group — the guard against train
    packs absorbing eval text."""
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.sampling import pack_sequences

    df = spark.range(200).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, "val").otherwise("train").alias("split"),
        (F.col("id") % 7 + 3).alias("toks"),
    )
    out = pack_sequences(
        df, "id", "toks", window=20, num_shards=4, group_col="split"
    )
    packs = (
        out.groupBy("split", "shard", "pack_id")
        .agg(F.countDistinct("split").alias("ng"), F.min("pack_offset").alias("mn"))
        .collect()
    )
    assert all(r["ng"] == 1 for r in packs)
    # every group's shard starts its own pack 0 at offset 0
    first = (
        out.groupBy("split", "shard")
        .agg(F.min("pack_id").alias("p0"), F.min("pack_offset").alias("o0"))
        .collect()
    )
    assert all(r["p0"] == 0 and r["o0"] == 0 for r in first)


def test_chunk_documents_short_doc_still_chunks_with_overlap(spark):
    """A non-empty doc with word count <= overlap must yield its one
    short chunk, not vanish."""
    from web_api_postgres_etl_spark.operators.sampling import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b"), (2, "only")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["chunk_idx"], r["chunk_text"])
        for r in chunk_documents(
            df, "doc_id", "text", chunk_words=8, overlap=4
        ).collect()
    }
    assert out == {1: (0, "a b"), 2: (0, "only")}


def test_pack_key_injective_on_null_and_hash_groups(spark):
    """pack_key must not alias across tricky group values: NULL group
    gets the '%N' sentinel (concat_ws would have silently skipped it,
    colliding with the no-group format), and '#' inside a group value
    is escaped so 'a#1' cannot alias group 'a' shard 1."""
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, None, 5), (2, "a#0", 5), (3, "a", 5), (4, "25%", 5)],
        "id long, split string, toks long",
    )
    out = pack_sequences(
        df, "id", "toks", window=100, num_shards=1, group_col="split"
    ).select("split", "pack_key").collect()
    keys = {r["split"]: r["pack_key"] for r in out}
    assert keys[None].startswith("%N#")
    assert keys["a#0"].startswith("a%230#")
    assert keys["a"].startswith("a#")
    assert keys["25%"].startswith("25%25#")
    # all four land in distinct packs — no aliasing
    assert len(set(keys.values())) == 4


def test_temperature_sample_rebalances_toward_uniform(spark, oracle):
    """alpha<1 boosts small groups' share; alpha=1 is identity-ish
    (p=1 for every group when target=corpus size); and the kept SET
    matches a DuckDB mirror of the pow/md5 arithmetic exactly."""
    from web_api_postgres_etl_spark.operators.sampling import (
        temperature_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    df = docs.select("doc_id", "source")

    # alpha=1: every group's keep probability is exactly 1 → identity
    out1 = temperature_sample(df, "source", "doc_id", alpha=1.0)
    assert out1.count() == df.count()

    alpha, target = 0.5, 300
    got = sorted(
        r["doc_id"]
        for r in temperature_sample(
            df, "source", "doc_id", alpha=alpha, target_rows=target
        ).collect()
    )
    want = sorted(
        row[0]
        for row in oracle.execute(f"""
        WITH c AS (
          SELECT source, count(*) AS c FROM documents GROUP BY source),
        t AS (SELECT sum(pow(c, {alpha})) AS s FROM c),
        p AS (
          SELECT source,
                 least(1.0, {target} * pow(c, {alpha}) / t.s / c) AS p
          FROM c, t)
        SELECT d.doc_id FROM documents d
        JOIN p ON d.source IS NOT DISTINCT FROM p.source
        WHERE CAST(('0x' || substr(md5('mix#' || CAST(d.doc_id AS VARCHAR)),
                                   1, 13)) AS BIGINT)
              / 4503599627370496.0 < p.p
        """).fetchall()
    )
    assert got == want
    assert 0 < len(got) < df.count()

    # the boost property: with alpha<1 the smallest group's kept
    # FRACTION is >= the largest group's kept fraction
    from pyspark.sql import functions as F

    sizes = {r["source"]: r["c"] for r in
             df.groupBy("source").agg(F.count("*").alias("c")).collect()}
    kept = {r["source"]: r["c"] for r in
            temperature_sample(df, "source", "doc_id", alpha=0.3,
                               target_rows=200)
            .groupBy("source").agg(F.count("*").alias("c")).collect()}
    small = min(sizes, key=sizes.get)
    big = max(sizes, key=sizes.get)
    if sizes[small] < sizes[big]:  # guard: degenerate equal-size corpora
        assert kept.get(small, 0) / sizes[small] >= kept.get(big, 0) / sizes[big]


def test_temperature_sample_null_group_total(spark):
    """NULL groups are a group (null-safe join): no row vanishes at
    alpha=1."""
    from web_api_postgres_etl_spark.operators.sampling import (
        temperature_sample,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")],
        "id long, src string",
    )
    assert temperature_sample(df, "src", "id", alpha=1.0).count() == 4


def test_upsample_by_factor_exact_copies(spark, oracle):
    """Integer factors give exact copy counts; fractional factors give
    floor/ceil per the md5 draw — mirrored in DuckDB."""
    from web_api_postgres_etl_spark.operators.sampling import (
        upsample_by_factor,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    df = docs.select("doc_id", "source")
    factors = {"web": 2.0, "books": 2.5, "wiki": 0.0}
    out = upsample_by_factor(df, "source", "doc_id", factors,
                             default_factor=1.0)
    got = sorted(
        (r["doc_id"], r["copy_idx"]) for r in out.collect()
    )
    want = sorted(
        (row[0], row[1])
        for row in oracle.execute("""
        WITH f AS (
          SELECT doc_id, source,
            CASE source WHEN 'web' THEN 2.0 WHEN 'books' THEN 2.5
                        WHEN 'wiki' THEN 0.0 ELSE 1.0 END AS f
          FROM documents),
        n AS (
          SELECT doc_id, source,
            CAST(floor(f) AS INT)
            + CASE WHEN CAST(('0x' || substr(md5('rep#' ||
                     CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
                   / 4503599627370496.0 < f - floor(f)
                   THEN 1 ELSE 0 END AS nc
          FROM f)
        SELECT doc_id, CAST(unnest(generate_series(0, nc - 1)) AS INT)
               AS copy_idx
        FROM n WHERE nc > 0
        """).fetchall()
    )
    assert got == want
    # wiki rows are gone; web rows exactly doubled
    srcs = {r["source"] for r in out.select("source").distinct().collect()}
    assert "wiki" not in srcs
    n_web_in = df.filter(df.source == "web").count()
    n_web_out = out.filter(out.source == "web").count()
    assert n_web_out == 2 * n_web_in


def test_upsample_copy_col_collision_raises(spark):
    from web_api_postgres_etl_spark.operators.sampling import (
        upsample_by_factor,
    )

    df = spark.createDataFrame([(1, "a", 0)], "id long, src string, copy_idx int")
    with pytest.raises(ValueError, match="copy_idx"):
        upsample_by_factor(df, "src", "id", {"a": 2.0})


def test_shard_manifest_order_insensitive_and_sensitive_to_change(spark):
    """The manifest digest is a multiset invariant: reshuffled row
    order and partitioning reproduce it exactly; any single-row edit
    flips it; n_rows/n_tokens are exact."""
    from web_api_postgres_etl_spark.operators.sampling import shard_manifest

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .withColumn("shard", (F.col("doc_id") % 4).cast("int"))
        .withColumn("toks", F.size(F.split(F.coalesce("text", F.lit("")), " ")))
    )
    m1 = {
        r["shard"]: (r["n_rows"], r["n_tokens"], r["content_digest"])
        for r in shard_manifest(
            docs, "shard", token_col="toks",
            content_cols=["doc_id", "text"],
        ).collect()
    }
    # same data, different physical order/partitioning → same manifest
    reshuffled = docs.orderBy(F.md5(F.col("doc_id").cast("string"))).repartition(13)
    m2 = {
        r["shard"]: (r["n_rows"], r["n_tokens"], r["content_digest"])
        for r in shard_manifest(
            reshuffled, "shard", token_col="toks",
            content_cols=["doc_id", "text"],
        ).collect()
    }
    assert m1 == m2
    assert sum(v[0] for v in m1.values()) == docs.count()

    # flip one row's text → exactly that shard's digest changes
    edited = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 8, F.lit("tampered")).otherwise(F.col("text")),
    )
    m3 = {
        r["shard"]: r["content_digest"]
        for r in shard_manifest(
            edited, "shard", token_col="toks",
            content_cols=["doc_id", "text"],
        ).collect()
    }
    changed = {s for s in m1 if m1[s][2] != m3[s]}
    assert changed == {0}  # doc 8 lives in shard 8 % 4 == 0


def test_shard_manifest_validates_empty_content(spark):
    from web_api_postgres_etl_spark.operators.sampling import shard_manifest

    df = spark.createDataFrame([(0,)], "shard int")
    with pytest.raises(ValueError, match="content_cols"):
        shard_manifest(df, "shard")


def test_shard_manifest_digest_injective_on_separator_values(spark):
    """Values containing the separator/escape characters must not
    alias across column boundaries, and NULL must differ from any
    literal string."""
    from web_api_postgres_etl_spark.operators.sampling import shard_manifest

    def digest(rows):
        df = spark.createDataFrame(rows, "shard int, a string, b string")
        return shard_manifest(df, "shard", content_cols=["a", "b"]).first()[
            "content_digest"
        ]

    assert digest([(0, "x\x1fy", "z")]) != digest([(0, "x", "y\x1fz")])
    assert digest([(0, None, "z")]) != digest([(0, "%N", "z")])
    assert digest([(0, "25%", "z")]) != digest([(0, "25%25", "z")])


# --------------------------------------------------- exact-n sampling
def test_sample_exact_oracle_and_determinism(spark, oracle):
    import pytest

    from web_api_postgres_etl_spark.operators.sampling import sample_exact

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = sorted(
        r.doc_id for r in sample_exact(docs, 37, "doc_id").select("doc_id").collect()
    )
    want = sorted(
        r[0]
        for r in oracle.execute(
            """
            SELECT doc_id FROM documents
            ORDER BY md5(concat_ws('#', 'sample', CAST(doc_id AS VARCHAR))),
                     doc_id
            LIMIT 37
            """
        ).fetchall()
    )
    assert got == want and len(got) == 37
    # same call → same rows; different salt → (almost surely) different
    again = sorted(
        r.doc_id for r in sample_exact(docs, 37, "doc_id").select("doc_id").collect()
    )
    assert again == got
    other = sorted(
        r.doc_id
        for r in sample_exact(docs, 37, "doc_id", salt="v2").select("doc_id").collect()
    )
    assert other != got

    # grouped: exactly n per group, short groups kept whole
    per = sample_exact(docs, 5, "doc_id", by="lang")
    counts = {r.lang: r.n for r in per.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n == min(5, full[g]) for g, n in counts.items())
    with pytest.raises(ValueError, match="n must be"):
        sample_exact(docs, 0, "doc_id")


# ------------------------------------------ weighted sampling (A-ES)
def test_weighted_sample_matches_python_model_and_is_stable(spark):
    """The race keys and the selected set equal a literal Python model
    of the same md5/ln arithmetic (repr-equal doubles), the draw is
    partitioning-invariant, and weights bias inclusion the way A-ES
    promises (one heavy row beats 99 light ones in almost every
    salt)."""
    import hashlib
    import math

    from web_api_postgres_etl_spark.operators.sampling import (
        weighted_sample_exact_n,
    )

    rows = [(i, 100.0 if i == 7 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, w double")

    def model_key(i: int, w: float, salt: str) -> float:
        hv = int(hashlib.md5(f"{salt}#{i}".encode()).hexdigest()[:13], 16)
        u = (hv + 1.0) / float(16**13)
        return math.log(u) / w

    got = weighted_sample_exact_n(df, 10, "id", "w", salt="s1", key_out="k")
    got_rows = {r["id"]: r["k"] for r in got.collect()}
    want = sorted(rows, key=lambda r: -model_key(r[0], r[1], "s1"))[:10]
    assert set(got_rows) == {i for i, _ in want}
    for i, w in want:
        assert repr(got_rows[i]) == repr(model_key(i, w, "s1"))

    # partitioning invariance
    reparted = {
        r["id"]
        for r in weighted_sample_exact_n(
            df.repartition(13), 10, "id", "w", salt="s1"
        ).collect()
    }
    assert reparted == set(got_rows)

    # the weight actually biases: the w=100 row wins a top-10 slot in
    # nearly every independent draw (p(miss) ≈ (90/190)^... tiny)
    hits = sum(
        7 in {
            r["id"]
            for r in weighted_sample_exact_n(
                df, 10, "id", "w", salt=f"t{s}"
            ).collect()
        }
        for s in range(10)
    )
    assert hits >= 9


def test_weighted_sample_eligibility_and_guards(spark):
    from web_api_postgres_etl_spark.operators.sampling import (
        weighted_sample_exact_n,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, None), (4, 2.0)], "id long, w double"
    )
    out = weighted_sample_exact_n(df, 10, "id", "w")
    assert {r["id"] for r in out.collect()} == {1, 4}  # 0/NULL excluded
    assert out.columns == ["id", "w"]  # race key dropped by default

    import pytest as _pt
    with _pt.raises(ValueError, match="n must"):
        weighted_sample_exact_n(df, 0, "id", "w")
    with _pt.raises(ValueError, match="collide"):
        weighted_sample_exact_n(df.withColumnRenamed("w", "__wskey"), 1, "id", "__wskey")
    bad = spark.createDataFrame([(1, -1.0)], "id long, w double")
    with _pt.raises(Exception, match="negative weight"):
        weighted_sample_exact_n(bad, 1, "id", "w").collect()

    # the top-n sort carries the id as a deterministic tiebreaker:
    # exact race-key ties (md5-prefix collisions, or equal-weight
    # duplicate ids) straddling the limit boundary must not make the
    # selected set partition-order-dependent
    out2 = weighted_sample_exact_n(df, 2, "id", "w")
    plan = out2._jdf.queryExecution().executedPlan().toString()
    take = next(
        (ln for ln in plan.splitlines() if "TakeOrderedAndProject" in ln),
        "",
    )
    assert "__wskey" in take and "id" in take, take


def test_weighted_sample_per_group_matches_python_model(spark):
    """Per-group A-ES draw vs the literal model: same race key, same
    top-n-per-group, same id tiebreak; deterministic under
    repartitioning; guards match the global form."""
    import hashlib
    import math

    import pytest as _pt

    from web_api_postgres_etl_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    rows = [
        (i, ["a", "b", "c"][i % 3], float(1 + (i * 7) % 5)) for i in range(60)
    ]
    rows += [(100, "a", None), (101, "b", 0.0)]  # ineligible
    df = spark.createDataFrame(rows, "id long, g string, w double")

    def model_key(i, salt=""):
        h = hashlib.md5(f"{salt}#{i}".encode()).hexdigest()
        u = (int(h[:13], 16) + 1.0) / 16**13
        return math.log(u)

    want: dict = {}
    for i, g, w in rows:
        if not w:
            continue
        want.setdefault(g, []).append((model_key(i) / w, -i))
    expected = {
        (g, -negid)
        for g, ks in want.items()
        for _, negid in sorted(ks, reverse=True)[:5]
    }
    got = {
        (r["g"], r["id"])
        for r in weighted_sample_per_group(
            df, 5, ["g"], "id", "w"
        ).collect()
    }
    assert got == expected
    reparted = {
        (r["g"], r["id"])
        for r in weighted_sample_per_group(
            df.repartition(7), 5, ["g"], "id", "w"
        ).collect()
    }
    assert reparted == expected

    # key_out keeps the race key; schema otherwise unchanged
    out = weighted_sample_per_group(df, 2, ["g"], "id", "w", key_out="k")
    assert out.columns == ["id", "g", "w", "k"]

    with _pt.raises(ValueError, match="n must"):
        weighted_sample_per_group(df, 0, ["g"], "id", "w")
    with _pt.raises(ValueError, match="non-empty"):
        weighted_sample_per_group(df, 1, [], "id", "w")
    with _pt.raises(ValueError, match="collide"):
        weighted_sample_per_group(
            df.withColumnRenamed("w", "__wskey"), 1, ["g"], "id", "__wskey"
        )
    bad = spark.createDataFrame([(1, "a", -1.0)], "id long, g string, w double")
    with _pt.raises(Exception, match="negative weight"):
        weighted_sample_per_group(bad, 1, ["g"], "id", "w").collect()
