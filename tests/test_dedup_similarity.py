"""Near-dup dedup + similarity: ground-truth behavior on crafted docs,
LSH recall against the exact baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_api_postgres_etl_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from web_api_postgres_etl_spark.operators.similarity import (
    cosine_topk,
    rhp_lsh_topk,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (4, "completely different content about spark engines and parquet files"),
    (5, "totally unrelated words regarding databases and storage formats"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_dedup_exact_keeps_min_id(spark):
    out = dedup_exact(_docs(spark), on=["text"], id_col="doc_id")
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 2, 4, 5]  # 3 is the exact dup of 1 → dropped


def test_minhash_lsh_finds_exact_and_near_dups(spark):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            _docs(spark), "doc_id", "text", shingle_n=2, num_hashes=8, bands=4
        ).collect()
    }
    assert (1, 3) in pairs  # identical docs always collide in every band
    assert (1, 2) in pairs or (2, 3) in pairs  # high-jaccard near-dup


def test_ngram_jaccard_exact_values(spark):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            _docs(spark), "doc_id", "text", shingle_n=2, threshold=0.1
        ).collect()
    }
    assert out[(1, 3)] == 1.0  # identical
    # docs 1 and 2 share 7 of 8 bigrams each → J = 7/(8+8-7) = 7/9
    assert abs(out[(1, 2)] - 7 / 9) < 1e-9


def test_simhash_flags_identical_and_near(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(_docs(spark), "doc_id", "text", max_hamming=10).collect()
    }
    assert pairs.get((1, 3)) == 0  # identical text → identical simhash
    assert (1, 2) in pairs  # near-dup within hamming 10


def test_rhp_lsh_topk_recall(spark):
    """Approximate top-k must recover most of the exact top-k."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 1).first()["embedding"]
    q = [float(x) for x in q]
    exact = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    approx = {r["vec_id"] for r in rhp_lsh_topk(emb, q, k=10, num_planes=16, bands=4).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    assert 1 in approx  # the query vector itself always shares all bands


def test_lsh_nn_join_matches_exact_and_plan_has_no_cartesian(spark):
    from web_api_postgres_etl_spark.operators.similarity import (
        lsh_nn_join,
        nearest_neighbor_join,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    left = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    right = emb.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("nid"), "embedding"
    )
    approx = lsh_nn_join(left, right, "qid", "nid", k=2, num_planes=64, bands=32)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    exact = nearest_neighbor_join(left, right, "qid", "nid", k=2)
    assert sorted(map(tuple, approx.collect())) == sorted(map(tuple, exact.collect()))


def test_lsh_cosine_pairs_catches_near_identical_vectors(spark):
    from web_api_postgres_etl_spark.operators.similarity import (
        lsh_cosine_pairs,
    )

    base = [(-1.0) ** i * (0.1 + 0.01 * i) for i in range(16)]
    rows = [
        (1, base),
        (2, [x * 1.001 for x in base]),        # near-dup of 1: same signs
        (3, [-x for x in base]),               # antipodal: no shared band
        (4, [0.5 - 0.07 * i for i in range(16)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = lsh_cosine_pairs(
        df, threshold=0.9, num_planes=16, bands=2, signature="axis"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    pairs = {(r["id_a"], r["id_b"]): r["cosine_sim"] for r in out.collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] > 0.999


def test_ivf_index_probe_prunes_partitions_and_matches_inline(spark, tmp_path):
    """The IVF scale path materialized: probe after write_ivf_index
    must (a) partition-prune on cluster, (b) return exactly what the
    inline ivf_topk computes with identical parameters."""
    from web_api_postgres_etl_spark.operators.similarity import (
        ivf_probe,
        ivf_topk,
        write_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    path = str(tmp_path / "ivf_idx")
    write_ivf_index(emb, path, every=11, max_centroids=4)

    probe = ivf_probe(spark, path, qvec, k=5, nprobe=2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2 and "cluster" in pf[1][:120], "probe scan must partition-prune on cluster"

    inline = ivf_topk(emb, qvec, k=5, nprobe=2, every=11, max_centroids=4)
    assert [tuple(r) for r in probe.collect()] == [tuple(r) for r in inline.collect()]


def test_kmeans_recovers_planted_blobs(spark):
    """Lloyd's iterations must move the fixed-sample init onto planted
    cluster structure: three tight blobs around orthogonal axes → the
    trained centroids land near the blob means and assignment groups
    the corpus by blob."""
    from web_api_postgres_etl_spark.operators.similarity import (
        ivf_assign,
        kmeans_centroids,
    )

    # 30 vectors: blob b = axis-b unit vector + tiny deterministic jitter
    rows = []
    for i in range(30):
        b = i % 3
        v = [0.0] * 6
        v[b] = 1.0
        v[(b + 3)] = 0.01 * (i % 5)  # jitter off-axis, norm-preservingly small
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = kmeans_centroids(df, k=3, iters=4, every=10)
    assert len(cents) == 3 and [c for c, _ in cents] == [0, 1, 2]
    # each blob axis is dominant in exactly one trained centroid
    dominant = sorted(max(range(6), key=lambda i: cv[i]) for _, cv in cents)
    assert dominant == [0, 1, 2]
    # assignment is pure by blob: every member of a blob shares a cluster
    got = ivf_assign(df, cents).select("vec_id", "cluster").collect()
    by_blob: dict[int, set[int]] = {}
    for r in got:
        by_blob.setdefault(int(r["vec_id"]) % 3, set()).add(int(r["cluster"]))
    assert all(len(cl) == 1 for cl in by_blob.values())
    # deterministic to float tolerance across retrains
    again = kmeans_centroids(df, k=3, iters=4, every=10)
    for (_, a), (_, b2) in zip(cents, again):
        assert all(abs(x - y) < 1e-9 for x, y in zip(a, b2))


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """A centroid that captures no members must survive the round
    unchanged (no respawn, no crash) — k exceeds the distinct vectors."""
    from web_api_postgres_etl_spark.operators.similarity import (
        kmeans_centroids,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_centroids(df, k=2, iters=2, every=1)
    assert len(cents) == 2
    assert all(len(cv) == 2 for _, cv in cents)


def test_ivf_topk_accepts_trained_centroids(spark):
    """ivf_topk with kmeans_centroids stays a valid top-k: results are
    drawn from the probed clusters and ranked by cosine desc."""
    from web_api_postgres_etl_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).first()["embedding"]]
    cents = kmeans_centroids(emb, k=4, iters=2, every=11)
    out = ivf_topk(emb, qvec, k=5, nprobe=2, centroids=cents).collect()
    assert len(out) == 5
    sims = [r["cosine_sim"] for r in out]
    assert sims == sorted(sims, reverse=True)
    assert out[0]["vec_id"] == 1 and out[0]["cosine_sim"] == 1.0


def test_minhash_survives_null_text(spark):
    """A NULL-text document must flow through the shingle path as an
    empty shingle array (NULL signature row), not crash the NGram UDF."""
    from web_api_postgres_etl_spark.operators.dedup import (
        minhash_table,
        near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, None), (3, "the quick brown cat")],
        "doc_id long, text string",
    )
    mh = minhash_table(docs, "doc_id", "text", shingle_n=2, num_hashes=4)
    rows = {r["doc_id"]: r for r in mh.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["mh_0"] is None  # token-less → NULL signature
    assert rows[1]["mh_0"] is not None
    # the fused pipeline drops the null doc via drop_empty and still runs
    assert near_dup_pairs(docs, "doc_id", "text", 2, 4, 2, 0.1).count() >= 0


def test_dedup_corpus_lines_preserves_null_text(spark):
    from web_api_postgres_etl_spark.operators.dedup import dedup_corpus_lines

    docs = spark.createDataFrame(
        [(1, "keep me"), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["text"] for r in dedup_corpus_lines(docs, "doc_id", "text").collect()}
    assert got == {1: "keep me", 2: None}


def test_dedup_corpus_lines_strips_shared_boilerplate(spark):
    from web_api_postgres_etl_spark.operators.dedup import dedup_corpus_lines

    docs = spark.createDataFrame(
        [
            (1, "unique alpha\nsubscribe to our newsletter\nunique beta"),
            (2, "subscribe to our newsletter\nother content here"),
            (3, "subscribe to our newsletter"),  # all boilerplate
            (4, "repeated inside\nrepeated inside\nunique gamma"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in dedup_corpus_lines(docs, "doc_id", "text").collect()}
    assert out == {
        1: "unique alpha\nunique beta",
        2: "other content here",
        3: "",  # survives, empty
        # within-ONE-doc repetition is not corpus boilerplate (distinct
        # doc counting) — both copies stay, order preserved
        4: "repeated inside\nrepeated inside\nunique gamma",
    }
    # banned set rides a broadcast; corpus line bodies shuffle once
    plan = dedup_corpus_lines(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_redact_pii_tags_and_order(spark):
    from web_api_postgres_etl_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk thanks"),
            (2, "server 192.168.1.250 answered"),
            (3, "call +1 (415) 555-0199 today"),
            (4, "no pii in this sentence at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["t"] for r in df.select("doc_id", redact_pii("text").alias("t")).collect()}
    assert out[1] == "mail me at <EMAIL> thanks"
    assert out[2] == "server <IP> answered"
    assert out[3] == "call <PHONE> today"
    assert out[4] == "no pii in this sentence at all"


def test_repetition_signals_flag_boilerplate(spark):
    from web_api_postgres_etl_spark.operators.dedup import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),       # pure repetition
            (2, "the quick brown fox jumps over the dog"),  # clean prose
            (3, "x"),                                     # no bigrams
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["top_ngram_frac"], r["dup_ngram_frac"])
        for r in repetition_signals(docs, "doc_id", "text", n=2).collect()
    }
    # doc 1: bigrams = [buy now, now buy, buy now, now buy, buy now,
    # now buy, buy now] -> 7 total, top 'buy now' x4, all 7 duplicated
    assert out[1] == (round(4 / 7, 6), 1.0)
    # doc 2: 7 distinct bigrams -> top 1/7, no duplicates
    assert out[2] == (round(1 / 7, 6), 0.0)
    # doc 3: no bigrams -> NULL signals, row kept
    assert out[3] == (None, None)


def test_minhash_handles_sub_n_token_docs(spark):
    """Regression: a doc with fewer tokens than the shingle width used
    to crash (sequence(1,0) is DESCENDING in Spark → slice(c,0,n)); it
    must instead keep a row with a NULL signature."""
    from web_api_postgres_etl_spark.operators.dedup import minhash_table

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "two tokens here")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["mh_0"] for r in minhash_table(docs, "doc_id", "text", shingle_n=2).collect()}
    assert out[1] is None
    assert out[2] is not None


def test_rhp_band_keys_rejects_indivisible_bands(spark):
    """bands must divide num_planes — trailing bits would silently drop
    (ADVICE r2)."""
    import pytest
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.similarity import rhp_band_keys

    with pytest.raises(ValueError, match="not divisible"):
        rhp_band_keys(F.col("sig"), num_planes=10, bands=3)


def test_centroid_sort_key_pins_degenerate_centroids_last():
    """Zero-norm centroids get -inf cosine in the probe ranking, so
    their order vs real centroids is deterministic (ADVICE r2)."""
    from web_api_postgres_etl_spark.operators.similarity import _py_cos_key

    q = [1.0, 0.0]
    assert _py_cos_key(q, [0.0, 0.0]) == float("-inf")
    assert _py_cos_key(q, [2.0, 0.0]) == 1.0
    ranked = sorted(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [-1.0, 0.0])],
        key=lambda cv: (-_py_cos_key(q, cv[1]), -cv[0]),
    )
    assert [c for c, _ in ranked][-1] == 1


# ----------------------------------------------------- semantic dedup
from web_api_postgres_etl_spark.operators.similarity import (  # noqa: E402
    semantic_dedup,
    semantic_dup_pairs,
)

VECS = [
    (1, [1.0, 0.0, 0.0]),
    (2, [0.999, 0.01, 0.0]),   # near-dup of 1 (same cluster)
    (3, [0.0, 1.0, 0.0]),
    (4, [0.0, 0.0, 1.0]),
    (5, [1.0, 0.0, 0.0]),      # exact dup of 1
]
CENTS = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.0, 0.0, 1.0])]


def _vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<double>")


def test_semantic_dup_pairs_within_cluster(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine_sim"]
        for r in semantic_dup_pairs(
            _vecs(spark), threshold=0.95, centroids=CENTS
        ).collect()
    }
    assert set(pairs) == {(1, 2), (1, 5), (2, 5)}
    assert pairs[(1, 5)] == 1.0


def test_semantic_dedup_keeps_min_id_survivor(spark):
    kept = semantic_dedup(_vecs(spark), threshold=0.95, centroids=CENTS)
    assert sorted(r["vec_id"] for r in kept.collect()) == [1, 3, 4]


def test_semantic_dedup_trained_centroids_deterministic(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(
        r["vec_id"]
        for r in semantic_dedup(emb, threshold=0.99, k=4, iters=1).collect()
    )
    b = sorted(
        r["vec_id"]
        for r in semantic_dedup(emb, threshold=0.99, k=4, iters=1).collect()
    )
    assert a == b            # deterministic end to end
    assert 0 < len(a) <= emb.count()


def test_ivf_assign_join_path_matches_literal_path(spark):
    """The broadcast-join centroid assignment (the k ≈ √N scale form)
    must produce the same clusters as the inlined-literal form."""
    from web_api_postgres_etl_spark.operators.similarity import ivf_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") % 97 == 0).limit(8).collect()
    ]
    lit_path = {
        r["vec_id"]: r["cluster"]
        for r in ivf_assign(emb, cents, via_join=False).collect()
    }
    join_path = {
        r["vec_id"]: r["cluster"]
        for r in ivf_assign(emb, cents, via_join=True).collect()
    }
    assert lit_path == join_path
    assert len(lit_path) == emb.count()


def test_ivf_index_append_probe_sees_new_vectors(spark, tmp_path):
    """Append a batch to a built index: probes immediately rank the new
    vectors, old data is untouched, and appended assignments equal the
    build-time assignment rule (shared sidecar centroids)."""
    from web_api_postgres_etl_spark.operators.similarity import (
        ivf_index_append,
        ivf_probe,
        write_ivf_index,
    )

    path = str(tmp_path / "ivf")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    write_ivf_index(old, path, every=97, max_centroids=8)
    n = ivf_index_append(new, path)
    assert n == new.count()
    # probe with a NEW vector as the query: it must rank itself first
    qrow = new.orderBy("vec_id").first()
    got = ivf_probe(
        spark, path, [float(x) for x in qrow["embedding"]], k=3, nprobe=8
    ).collect()
    assert got[0]["vec_id"] == qrow["vec_id"]
    assert got[0]["cosine_sim"] == 1.0
    # index now covers the full corpus exactly once
    idx_ids = sorted(
        r["vec_id"] for r in spark.read.parquet(path).collect()
    )
    assert idx_ids == sorted(r["vec_id"] for r in emb.collect())


def test_jaccard_on_pairs_matches_exact_on_candidates(spark):
    """Restricting exact Jaccard to LSH candidates must reproduce the
    all-pairs values for every candidate pair."""
    from web_api_postgres_etl_spark.operators.dedup import jaccard_on_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cands = minhash_lsh_candidates(
        docs, "doc_id", "text", shingle_n=2, num_hashes=8, bands=4
    ).persist()
    on_cands = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_on_pairs(
            docs, cands, "doc_id", "text", shingle_n=2, threshold=0.3
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_n=2, threshold=0.3
        ).collect()
    }
    cand_set = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    cands.unpersist()
    assert on_cands  # candidates produced verified pairs
    for pair, j in on_cands.items():
        assert exact[pair] == j
    # every exact pair that was a candidate is present
    assert set(on_cands) == {p for p in exact if p in cand_set}


def test_trained_kmeans_ivf_recall_beats_fixed_sample(spark):
    """VERDICT r4 #6: trained k-means centroids must give IVF recall@10
    at least as good as the fixed-sample centroids against the brute
    oracle. On a planted-blob corpus (8 pseudorandom md5 blobs, dim 16)
    the fixed every-47th sample double-covers some blobs and misses
    others (measured 0.8375), while 4 Lloyd's iterations land one
    centroid per blob (measured 1.0). The driver oracle entries keep
    the FIXED sample anyway: its centroid set is reproducible as a
    plain SQL WHERE/LIMIT, which the trained set is not — recall is
    pinned here instead."""
    from pyspark.sql import functions as F

    from web_api_postgres_etl_spark.operators.similarity import (
        cosine_topk,
        ivf_centroids,
        ivf_topk,
        kmeans_centroids,
    )

    df = spark.range(400).select(
        F.col("id").alias("vec_id"),
        F.expr(
            """
            transform(sequence(1, 16), i ->
              CASE WHEN i - 1 = CAST(conv(substr(md5(concat('blob#',
                        CAST(id AS STRING))), 1, 4), 16, 10) % 8 AS INT)
                   THEN 1.0
                   ELSE 0.02 * (CAST(conv(substr(md5(concat(
                        CAST(id AS STRING), '/', CAST(i AS STRING))),
                        1, 4), 16, 10) % 100 AS DOUBLE) / 100.0 - 0.01)
              END)
            """
        ).alias("embedding"),
    ).persist()
    df.count()
    fixed = ivf_centroids(df, every=47, max_centroids=8)
    trained = kmeans_centroids(df, k=8, iters=4, every=47)
    qids = [3, 31, 77, 101, 150, 222, 301, 389]
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in df.filter(F.col("vec_id").isin(qids)).collect()
    }

    def recall(cents) -> float:
        tot = 0.0
        for qid in qids:
            qv = qvecs[qid]
            brute = {r["vec_id"] for r in cosine_topk(df, qv, k=10).collect()}
            approx = {
                r["vec_id"]
                for r in ivf_topk(
                    df, qv, k=10, nprobe=2, centroids=cents
                ).collect()
            }
            tot += len(brute & approx) / 10.0
        return tot / len(qids)

    r_fixed, r_trained = recall(fixed), recall(trained)
    df.unpersist()
    assert r_trained >= r_fixed, (r_trained, r_fixed)
    assert r_trained >= 0.95, r_trained   # one centroid per planted blob
    assert r_fixed >= 0.5, r_fixed        # fixed sample is usable, just worse


def test_semantic_decontamination_vs_brute_force(spark):
    """LSH-based semantic decontamination on the embeddings table,
    with the bench = exact copies of every 25th vector: (a) exact
    copies can NEVER slip through (identical signatures share every
    band), and (b) the dropped set equals the brute-force exact
    answer at this scale — the recall audit the docstring prescribes."""
    from web_api_postgres_etl_spark.operators.similarity import (
        decontaminate_semantic,
        semantic_contamination_hits,
    )

    vecs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    train = vecs.select("vec_id", "embedding")
    bench = (
        vecs.filter(F.col("vec_id") % 25 == 0)
        .select(F.col("vec_id").alias("bid"), "embedding")
    )
    thr = 0.999
    kept = decontaminate_semantic(
        train, bench, "vec_id", "bid", threshold=thr,
        num_planes=16, bands=8,
    )
    kept_ids = {r["vec_id"] for r in kept.collect()}
    planted = {r["bid"] for r in bench.collect()}
    # (a) every planted exact copy was dropped
    assert not (planted & kept_ids)

    # (b) brute-force exact answer: max cosine to any bench vector
    from web_api_postgres_etl_spark.operators.similarity import (
        as_double_array, cosine,
    )

    j = train.alias("t").crossJoin(bench.alias("b")).select(
        F.col("t.vec_id").alias("vec_id"),
        cosine(
            as_double_array(F.col("t.embedding")),
            as_double_array(F.col("b.embedding")),
        ).alias("c"),
    )
    exact_dropped = {
        r["vec_id"]
        for r in j.groupBy("vec_id").agg(F.max("c").alias("m"))
        .filter(F.col("m") >= thr).collect()
    }
    assert kept_ids == set(
        r["vec_id"] for r in train.collect()
    ) - exact_dropped

    # audit face agrees with the drop set
    hits = semantic_contamination_hits(
        train, bench, "vec_id", "bid", threshold=thr,
        num_planes=16, bands=8,
    )
    assert {r["vec_id"] for r in hits.collect()} == exact_dropped


def test_semantic_decontamination_null_vectors_kept(spark):
    from web_api_postgres_etl_spark.operators.similarity import (
        decontaminate_semantic,
    )

    train = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0])], "bid long, embedding array<double>"
    )
    kept = {
        r["vec_id"]
        for r in decontaminate_semantic(
            train, bench, "vec_id", "bid", threshold=0.99,
            num_planes=2, bands=1, dims=2,
        ).collect()
    }
    assert kept == {2}  # the exact copy drops; the NULL row is kept


def test_semantic_decontamination_same_id_names_and_null_lead_row(spark):
    """The natural call — both tables keyed 'doc_id', dims inferred,
    and the FIRST train row has a NULL embedding — must work and keep
    the NULL row (the totality contract, previously only tested with
    explicit dims and distinct id names)."""
    from web_api_postgres_etl_spark.operators.similarity import (
        decontaminate_semantic,
        semantic_contamination_hits,
    )

    train = spark.createDataFrame(
        [(1, None), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "doc_id long, embedding array<double>",
    )
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0])], "doc_id long, embedding array<double>"
    )
    kept = {
        r["doc_id"]
        for r in decontaminate_semantic(
            train, bench, "doc_id", "doc_id", threshold=0.99,
            num_planes=2, bands=1,
        ).collect()
    }
    assert kept == {1, 3}  # exact copy (2) drops; NULL row (1) kept

    # the hits face refuses ambiguous output column names loudly
    import pytest
    with pytest.raises(ValueError, match="bench_id_col"):
        semantic_contamination_hits(train, bench, "doc_id", "doc_id")

    # fully-NULL / empty train: total, nothing dropped, no crash
    all_null = spark.createDataFrame(
        [(1, None)], "doc_id long, embedding array<double>"
    )
    assert decontaminate_semantic(
        all_null, bench, "doc_id", "doc_id", threshold=0.5
    ).count() == 1
    empty = all_null.filter("doc_id < 0")
    assert decontaminate_semantic(
        empty, bench, "doc_id", "doc_id", threshold=0.5
    ).count() == 0


# --- containment (one-sided overlap) verification ---------------------

def test_containment_catches_subset_duplication(spark):
    from web_api_postgres_etl_spark.operators.dedup import (
        containment_on_pairs,
        ngram_jaccard_pairs,
    )

    article = (
        "the council voted to widen the harbor road after years of delay "
        "and the mayor praised the decision as overdue progress for the "
        "whole district while residents asked about the funding plan"
    )
    comments = (
        " first comment totally agree with this decision "
        " second comment the funding question deserves a real answer "
        " third comment road works again every single summer honestly "
        " fourth comment will the bus line be rerouted during the works"
    )
    docs = spark.createDataFrame(
        [(1, article), (2, article + comments), (3, "unrelated text here")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    # symmetric Jaccard dilutes the embedded article below 0.5...
    jac = ngram_jaccard_pairs(docs, "doc_id", "text", 2, threshold=0.5)
    assert jac.filter("id_a = 1 AND id_b = 2").count() == 0
    # ...containment scores it 1.0 and names the contained doc
    out = containment_on_pairs(
        docs, pairs, "doc_id", "text", 2, threshold=0.8, cache_pairs=False
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"], r["containment"], r["contained_id"]) == (
        1, 2, 1.0, 1,
    )


def test_containment_matches_duckdb_mirror(spark, oracle):
    """Verify math mirrored term-for-term over the SAME candidate set
    (pair generation parity is the minhash contract's job)."""
    import pandas as pd

    from tests.conftest import SF_ORACLE
    from web_api_postgres_etl_spark.operators.dedup import (
        containment_on_pairs,
        minhash_lsh_candidates,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    pairs = minhash_lsh_candidates(
        docs, "doc_id", "text", shingle_n=2, num_hashes=8, bands=4
    ).persist()
    got = sorted(
        (r["id_a"], r["id_b"], round(r["containment"], 9), r["contained_id"])
        for r in containment_on_pairs(
            docs, pairs, "doc_id", "text", 2, threshold=0.8, cache_pairs=False
        ).collect()
    )
    oracle.register(
        "cont_pairs", pd.DataFrame(pairs.collect(), columns=["id_a", "id_b"])
    )
    pairs.unpersist()
    tok = (
        "list_filter(regexp_split_to_array(trim(regexp_replace(regexp_replace("
        "lower(text),'[^a-z0-9\\s]',' ','g'),'\\s+',' ','g')),' '), x -> x <> '')"
    )
    sh2 = (
        "list_transform(generate_series(1, greatest(len(toks)-1, 0)), "
        "i -> array_to_string(toks[i:i+1],' '))"
    )
    want = sorted(
        map(
            tuple,
            oracle.sql(f"""
WITH t AS (SELECT doc_id, {tok} AS toks FROM documents),
s AS (SELECT doc_id, list_distinct({sh2}) AS sh FROM t
      WHERE len({sh2}) > 0)
SELECT p.id_a, p.id_b,
       round(len(list_intersect(a.sh, b.sh))
             / CAST(least(len(a.sh), len(b.sh)) AS DOUBLE), 9) AS containment,
       CASE WHEN len(a.sh) < len(b.sh) THEN p.id_a ELSE p.id_b END
         AS contained_id
FROM cont_pairs p
JOIN s a ON p.id_a = a.doc_id
JOIN s b ON p.id_b = b.doc_id
WHERE len(list_intersect(a.sh, b.sh))
      / CAST(least(len(a.sh), len(b.sh)) AS DOUBLE) >= 0.8
""").fetchall(),
        )
    )
    assert got == want and len(got) > 10


# --------------------------------------------------- int8 quantization
def test_quantize_embeddings_semantics_and_totality(spark):
    from web_api_postgres_etl_spark.operators.similarity import (
        quantize_embeddings,
        quantize_vector,
    )

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),   # no mass -> NULL quantization
        (3, None),                   # NULL vector -> NULL quantization
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: (r["qvec"], r["qscale"])
           for r in quantize_embeddings(df).collect()}
    # amax=1.0: q = floor(v*127 + 0.5) -> [127, -63, 32, 0] (half-UP)
    assert got[1] == ([127, -63, 32, 0], 1.0 / 127.0)
    assert got[2] == (None, None) and got[3] == (None, None)
    # the driver-side quantizer is the same operation sequence
    assert quantize_vector([1.0, -0.5, 0.25, 0.0]) == (
        [127, -63, 32, 0], 1.0 / 127.0)
    assert quantize_vector([0.0]) == (None, None)
    # range bound holds even at the negative extreme
    q2, _ = quantize_vector([-3.25, 3.25, 1.625])
    assert q2 == [-127, 127, 64] and all(-127 <= x <= 127 for x in q2)

    bad = df.withColumnRenamed("vec_id", "qvec")
    import pytest as _pt
    with _pt.raises(ValueError, match="already exists"):
        quantize_embeddings(bad)

    # reconstruction error bound: |q*scale - v| <= scale/2 per element
    import random
    rnd = random.Random(7)
    vec = [rnd.uniform(-2, 2) for _ in range(64)]
    q, s = quantize_vector(vec)
    assert all(abs(qi * s - vi) <= s / 2 + 1e-12 for qi, vi in zip(q, vec))


def test_quantized_topk_recall_and_duckdb_mirror(spark, oracle):
    """Top-k under int8 quantization: an exact duplicate of the query
    ranks first (quantization preserves exact matches), recall vs the
    float brute force stays high, and qvec/qdot are bit-exact vs a
    DuckDB mirror of the same pinned floor(x+0.5) quantizer."""
    from web_api_postgres_etl_spark.operators.similarity import (
        ann_topk_quantized,
        cosine_topk,
        quantize_vector,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qrow = emb.filter(F.col("vec_id") == 7).first()
    query = [float(x) for x in qrow["embedding"]]

    topq = ann_topk_quantized(emb, query, k=10).collect()
    assert topq[0]["vec_id"] == 7  # the exact copy wins
    exact_ids = {r["vec_id"] for r in cosine_topk(emb, query, k=10).collect()}
    quant_ids = {r["vec_id"] for r in topq}
    assert len(exact_ids & quant_ids) >= 6  # high but not perfect recall

    # bit-exact qdot mirror (integer inner product of the pinned
    # quantizer's outputs — engine-independent by construction)
    qq, _ = quantize_vector(query)
    qlit = "[" + ", ".join(str(int(x)) for x in qq) + "]"
    got = sorted((r["vec_id"], r["qdot"]) for r in topq)
    want = sorted(oracle.execute(f"""
        WITH p AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
        a AS (
          SELECT vec_id, v,
                 list_reduce(
                   list_prepend(0.0, list_transform(v, x -> abs(x))),
                   (x, y) -> greatest(x, y)) AS amax
          FROM p),
        q AS (
          SELECT vec_id, amax / 127.0 AS qscale,
                 list_transform(v, x -> CAST(floor(x * 127.0 / amax + 0.5)
                                              AS BIGINT)) AS qv
          FROM a WHERE amax > 0),
        s AS (
          SELECT vec_id, qscale,
                 list_sum(list_transform(list_zip(qv, {qlit}),
                          t -> t[1] * t[2])) AS qdot
          FROM q)
        SELECT vec_id, CAST(qdot AS BIGINT) AS qdot
        FROM s
        ORDER BY qscale * {repr(quantize_vector(query)[1])} * qdot DESC,
                 vec_id ASC
        LIMIT 10
    """).fetchall())
    assert got == want

    # a corpus vector whose dimension differs from the query's must
    # fail loudly (zip_with would NULL-pad → NULL score → the row
    # silently sorts out of the top-k)
    import pytest as _pt
    ragged = emb.select("vec_id", "embedding").limit(5).union(
        spark.createDataFrame(
            [(99999, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
    )
    with _pt.raises(Exception, match="!= query dimension"):
        ann_topk_quantized(ragged, query, k=3).collect()


# --------------------------------------- prefix-filtered exact Jaccard
def test_jaccard_join_prefix_equals_bruteforce(spark):
    """The completeness guarantee, checked head-on: the prefix-filtered
    join returns EXACTLY the pair set of the quadratic all-pairs
    ngram_jaccard_pairs on real documents, at two thresholds (the
    pruning gets sharper as t rises; the result must not)."""
    from web_api_postgres_etl_spark.operators.dedup import (
        jaccard_join_prefix,
        ngram_jaccard_pairs,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", "text")
    )
    for t in (0.3, 0.7):
        pins: list = []
        got = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in jaccard_join_prefix(
                docs, "doc_id", "text", shingle_n=2, threshold=t, pins=pins
            ).collect()
        )
        want = sorted(
            (r["id_a"], r["id_b"], round(r["jaccard"], 9))
            for r in ngram_jaccard_pairs(
                docs, "doc_id", "text", shingle_n=2, threshold=t
            ).collect()
        )
        for fr in pins:
            fr.unpersist()
        assert got == want
        assert len(got) > 0  # the corpus HAS near-dups at these t


def test_jaccard_join_prefix_planted_and_guards(spark):
    from web_api_postgres_etl_spark.operators.dedup import jaccard_join_prefix

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),      # 3/7 bigrams shared w/ 1
        (3, "completely different words here entirely"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_join_prefix(
            df, "doc_id", "text", shingle_n=1, threshold=0.5,
            cache_intermediates=False,
        ).collect()
    }
    # unigram sets: {1,2} share 4 of 6 distinct tokens → J = 4/6 ≥ 0.5
    assert got == {(1, 2)}

    import pytest as _pt
    with _pt.raises(ValueError, match="threshold"):
        jaccard_join_prefix(df, "doc_id", "text", threshold=0.0)
    with _pt.raises(ValueError, match="threshold"):
        jaccard_join_prefix(df, "doc_id", "text", threshold=1.5)

    # identical docs must pair at threshold exactly 1.0 (prefix length
    # stays >= 1: p = n - ceil(n) + 1 = 1)
    twins = spark.createDataFrame(
        [(1, "same exact text body"), (2, "same exact text body")],
        "doc_id long, text string",
    )
    out = jaccard_join_prefix(
        twins, "doc_id", "text", shingle_n=2, threshold=1.0,
        cache_intermediates=False,
    ).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in out] == [(1, 2, 1.0)]


# --------------------------------------------- sentence-level dedup
def test_split_sentences_ground_truth_and_duckdb_mirror(spark, oracle):
    """Regex-level segmentation: terminal-punct runs close a sentence
    (trailing quotes/brackets attach), an unterminated tail is its own
    sentence, whitespace normalizes, and DuckDB (RE2) extracts the
    IDENTICAL chunks from the same backref-free pattern."""
    from web_api_postgres_etl_spark.functions.text import (
        SENTENCE_PAT,
        sentence_count,
        split_sentences,
    )

    rows = [
        (1, 'First one. Second, with "quote!" Third?? And a tail'),
        (2, "One line.\nSplit across\nlines. Done!"),
        (3, ""),
        (4, None),
        (5, "No terminal punctuation at all"),
        (6, "Dr. Smith arrived."),  # the documented abbreviation seam
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (None if r["s"] is None else list(r["s"]), r["n"])
        for r in df.select(
            "id",
            split_sentences("text").alias("s"),
            sentence_count("text").alias("n"),
        ).collect()
    }
    assert got[1] == (
        ["First one.", 'Second, with "quote!"', "Third??", "And a tail"], 4
    )
    assert got[2] == (["One line.", "Split across lines.", "Done!"], 3)
    assert got[3] == ([], 0)
    assert got[4][0] is None and got[4][1] is None
    assert got[5] == (["No terminal punctuation at all"], 1)
    assert got[6] == (["Dr.", "Smith arrived."], 2)  # seam, pinned

    # RE2 mirror: same pattern, same trim/collapse/filter chain
    oracle.execute("CREATE OR REPLACE TABLE __sents(id BIGINT, text VARCHAR)")
    oracle.executemany("INSERT INTO __sents VALUES (?, ?)", rows)
    pat = SENTENCE_PAT.replace("'", "''")
    want = dict(oracle.execute(f"""
        SELECT id, list_filter(list_transform(
                 regexp_extract_all(text, '{pat}'),
                 x -> trim(regexp_replace(x, '\\s+', ' ', 'g'))),
               x -> x <> '') FROM __sents
    """).fetchall())
    for i, (s, _) in got.items():
        assert s == want[i], i
    oracle.execute("DROP TABLE __sents")


def test_dedup_corpus_sentences_strips_mid_line_boilerplate(spark):
    """The case the LINE form cannot catch: boilerplate glued mid-line
    to real prose. Short repeats survive via the length floor; order
    is preserved; NULL/empty semantics match the line form."""
    from web_api_postgres_etl_spark.operators.dedup import (
        dedup_corpus_sentences,
    )

    boiler = "Click here to subscribe to our newsletter today."
    rows = [
        (1, f"Real prose about harbors. {boiler} More real prose follows."),
        (2, f"{boiler} A different document entirely."),
        (3, f"Unrelated text here. {boiler}"),
        (4, "Yes. Yes. A short interjection repeats legitimately."),
        (5, "Yes. It repeats here too and must not be stripped."),
        (6, ""),
        (7, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_corpus_sentences(
            docs, "doc_id", "text", max_docs=2, min_sentence_words=4
        ).collect()
    }
    # boiler appears in 3 docs > max_docs=2 → stripped everywhere
    assert got[1] == "Real prose about harbors. More real prose follows."
    assert got[2] == "A different document entirely."
    assert got[3] == "Unrelated text here."
    # "Yes." is in 2 docs but under the 4-word floor → kept (both copies)
    assert got[4].startswith("Yes. Yes.")
    assert got[5].startswith("Yes.")
    assert got[6] == "" and got[7] is None

    import pytest as _pt
    with _pt.raises(ValueError, match="max_docs"):
        dedup_corpus_sentences(docs, "doc_id", "text", max_docs=0)
    with _pt.raises(ValueError, match="min_sentence_words"):
        dedup_corpus_sentences(
            docs, "doc_id", "text", min_sentence_words=-1
        )


def test_dedup_corpus_sentences_matches_duckdb_mirror(spark, oracle):
    """Full chain on real documents at sf0.01 vs a DuckDB mirror of
    the same segmentation + digest-count + ban + reassembly."""
    from web_api_postgres_etl_spark.functions.text import SENTENCE_PAT
    from web_api_postgres_etl_spark.operators.dedup import (
        dedup_corpus_sentences,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = sorted(
        (r["doc_id"], r["text"])
        for r in dedup_corpus_sentences(
            docs, "doc_id", "text", max_docs=1, min_sentence_words=2
        ).collect()
    )
    pat = SENTENCE_PAT.replace("'", "''")
    want = sorted(oracle.execute(f"""
        WITH s AS (
          SELECT doc_id, list_filter(list_transform(
                   regexp_extract_all(text, '{pat}'),
                   x -> trim(regexp_replace(x, '\\s+', ' ', 'g'))),
                 x -> x <> '') AS sents
          FROM documents),
        e AS (
          SELECT doc_id, u.i AS pos, sents[u.i] AS sent
          FROM s, unnest(range(1, len(sents) + 1)) AS u(i)),
        banned AS (
          SELECT md5(sent) AS k
          FROM (SELECT DISTINCT doc_id, md5(sent) AS k, sent FROM e
                WHERE len(string_split_regex(sent, '\\s+')) >= 2)
          GROUP BY md5(sent) HAVING COUNT(*) > 1),
        kept AS (
          SELECT doc_id, pos, sent FROM e
          WHERE md5(sent) NOT IN (SELECT k FROM banned)),
        asm AS (
          SELECT doc_id, string_agg(sent, ' ' ORDER BY pos) AS clean
          FROM kept GROUP BY doc_id)
        SELECT d.doc_id,
               CASE WHEN d.text IS NULL THEN NULL
                    ELSE COALESCE(a.clean, '') END AS text
        FROM documents d LEFT JOIN asm a USING (doc_id)
    """).fetchall())
    assert got == want


# ---------------------------------------------------- embedding pooling
def test_mean_embedding_exact_and_guards(spark, oracle):
    """Chunk→doc pooling: element-wise means are DECIMAL-exact
    (order/partitioning-independent), NULL vectors excluded, ragged
    dims raise, and the DuckDB mirror reproduces every double."""
    import pytest as _pt

    from web_api_postgres_etl_spark.operators.similarity import (
        mean_embedding,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    grouped = emb.select((F.col("vec_id") % 7).alias("g"), "embedding")
    got = {
        r["g"]: (list(r["mean_embedding"]), r["n_vecs"])
        for r in mean_embedding(grouped, ["g"]).collect()
    }
    reparted = {
        r["g"]: (list(r["mean_embedding"]), r["n_vecs"])
        for r in mean_embedding(grouped.repartition(13), ["g"]).collect()
    }
    assert got == reparted  # decimal sums: partitioning-invariant
    want = {
        g: (list(v), n)
        for g, v, n in oracle.execute("""
        WITH e AS (
          SELECT vec_id % 7 AS g, u.i AS dim,
                 embedding[u.i] AS val, len(embedding) AS nd
          FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
        m AS (
          SELECT g, dim,
                 CAST(SUM(CAST(val AS DECIMAL(38,12))) / COUNT(*) AS DOUBLE)
                   AS mean, COUNT(*) AS n
          FROM e GROUP BY 1, 2)
        SELECT g, list(mean ORDER BY dim) AS v, MAX(n) AS n
        FROM m GROUP BY g
    """).fetchall()
    }
    assert set(got) == set(want)
    for g in got:
        assert got[g][1] == want[g][1]
        # engines round decimal DIVISION at different intermediate
        # scales (the documented decimal→double seam) — banded, while
        # within-Spark determinism is exact (the repartition pin above)
        for a, b in zip(got[g][0], want[g][0]):
            assert abs(a - b) < 1e-8, (g, a, b)

    # NULL vectors excluded; all-NULL group disappears
    withnull = spark.createDataFrame(
        [("a", [1.0, 3.0]), ("a", None), ("a", [3.0, 5.0]), ("z", None)],
        "g string, embedding array<double>",
    )
    rows = {r["g"]: r for r in mean_embedding(withnull, ["g"]).collect()}
    assert list(rows["a"]["mean_embedding"]) == [2.0, 4.0]
    assert rows["a"]["n_vecs"] == 2
    assert "z" not in rows

    # ragged dims raise; empty group_cols raises
    ragged = spark.createDataFrame(
        [("a", [1.0]), ("a", [1.0, 2.0])], "g string, embedding array<double>"
    )
    with _pt.raises(Exception, match="ragged vector dimensions"):
        mean_embedding(ragged, ["g"]).collect()
    with _pt.raises(ValueError, match="non-empty"):
        mean_embedding(ragged, [])

    # a NULL ELEMENT inside a vector raises (the sum would skip it
    # while the divisor counted the row — silently deflated mean)
    nullelem = spark.createDataFrame(
        [("a", [1.0, None]), ("a", [3.0, 5.0])],
        "g string, embedding array<double>",
    )
    with _pt.raises(Exception, match="NULL element inside a vector"):
        mean_embedding(nullelem, ["g"]).collect()

    # all-empty-array group disappears like the all-NULL group (and
    # empty + non-empty in one group is caught by the ragged guard)
    empties = spark.createDataFrame(
        [("e", []), ("e", []), ("b", [2.0])],
        "g string, embedding array<double>",
    )
    rows2 = {r["g"]: r for r in mean_embedding(empties, ["g"]).collect()}
    assert "e" not in rows2 and list(rows2["b"]["mean_embedding"]) == [2.0]


def test_mine_boilerplate_ngrams_planted_and_guards(spark):
    """Document frequency, not term frequency: a shared footer crosses
    the threshold; one spammy doc repeating a gram 50 times cannot
    promote it; the min_docs floor and guards hold; empty input gives
    an empty, correctly-typed frame."""
    import pytest

    from web_api_postgres_etl_spark.operators.dedup import (
        mine_boilerplate_ngrams,
    )

    footer = "subscribe to our newsletter"
    rows = [(i, f"w{i}a w{i}b w{i}c {footer}") for i in range(1, 6)]
    rows.append((6, " ".join(["spam gram"] * 50)))
    rows.append((7, "short"))  # < n tokens: no grams, still in the denominator
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    out = mine_boilerplate_ngrams(
        docs, "text", "doc_id", n=2, min_doc_frac=0.5, min_docs=2
    )
    got = {r["gram"]: (r["n_docs"], r["doc_frac"]) for r in out.collect()}
    # threshold = max(2, ceil(0.5 * 7)) = 4: only the footer bigrams
    # (5 docs each) qualify — 'spam gram' has 50 occurrences in ONE doc
    assert set(got) == {"subscribe to", "to our", "our newsletter"}
    assert all(v == (5, round(5 / 7.0, 6)) for v in got.values())

    # min_docs floor dominates a tiny fraction
    floor = mine_boilerplate_ngrams(
        docs, "text", "doc_id", n=2, min_doc_frac=0.0001, min_docs=6
    )
    assert floor.count() == 0

    empty = mine_boilerplate_ngrams(
        docs.filter("doc_id < 0"), "text", "doc_id", n=2
    )
    assert empty.collect() == []
    assert dict(empty.dtypes) == {
        "gram": "string", "n_docs": "bigint", "doc_frac": "double",
    }

    with pytest.raises(ValueError):
        mine_boilerplate_ngrams(docs, "text", "doc_id", n=0)
    with pytest.raises(ValueError):
        mine_boilerplate_ngrams(docs, "text", "doc_id", min_doc_frac=0.0)
    with pytest.raises(ValueError):
        mine_boilerplate_ngrams(docs, "text", "doc_id", min_docs=0)


def test_mine_boilerplate_ngrams_matches_duckdb_mirror(spark, oracle):
    """Full corpus mirror at sf0.01: same tokenizer face (TOK), same
    per-doc-distinct document-frequency count, same integer threshold
    arithmetic, repr-equal doc_frac."""
    import math

    from __spark_entry__ import TOK, _shingle_sql
    from tests.conftest import SF_ORACLE
    from web_api_postgres_etl_spark.operators.dedup import (
        mine_boilerplate_ngrams,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    total = docs.count()
    frac, floor, n = 0.02, 2, 2
    out = mine_boilerplate_ngrams(
        docs, "text", "doc_id", n=n, min_doc_frac=frac, min_docs=floor
    )
    got = sorted(
        (r["gram"], r["n_docs"], repr(r["doc_frac"])) for r in out.collect()
    )
    threshold = max(floor, math.ceil(frac * total))
    sql = f"""
    WITH t AS (SELECT doc_id, {TOK.format(col="text")} AS toks FROM documents),
    s AS (SELECT doc_id, list_distinct({_shingle_sql("toks", n)}) AS sh
          FROM t WHERE len(toks) >= {n}),
    g AS (SELECT doc_id, unnest(sh) AS gram FROM s),
    c AS (SELECT gram, CAST(count(*) AS BIGINT) AS n_docs FROM g GROUP BY 1)
    SELECT gram, n_docs, round(n_docs / CAST({total} AS DOUBLE), 6) AS doc_frac
    FROM c WHERE n_docs >= {threshold}
    """
    want = sorted((r[0], r[1], repr(r[2])) for r in oracle.execute(sql).fetchall())
    assert got == want
    assert len(got) > 0  # the sf0.01 corpus does contain boilerplate grams


def _pq_py_encode(vec, books):
    """Literal model of pq_encode's reduced-L2 argmin (same strict
    folds — _py_dot — and the ties-to-smaller-code struct-min rule)."""
    from web_api_postgres_etl_spark.operators.similarity import _py_dot

    m = len(books)
    sub = len(books[0][0][1])
    out = []
    for s in range(m):
        vs = vec[s * sub : (s + 1) * sub]
        best = None
        for c, cv in books[s]:
            d = _py_dot(cv, cv) - 2.0 * _py_dot(vs, cv)
            if best is None or (d, c) < best:
                best = (d, c)
        out.append(best[1])
    return out


def test_pq_encode_bit_exact_and_self_query_minimal(spark):
    """Encoding with a FIXED codebook is bit-identical to the literal
    Python model over the whole sf0.001 corpus, and a corpus vector
    used as its own ADC query attains the global minimum distance (per
    subspace its own code IS the argmin, so no other code vector can
    score below it)."""
    from web_api_postgres_etl_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = pq_train(emb, m=4, k=16, iters=2, every=7)
    assert len(books) == 4 and all(len(b) == 16 for b in books)
    enc = pq_encode(emb, books)
    got = {r["vec_id"]: list(r["pq_codes"]) for r in enc.collect()}
    data = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
        if r["embedding"] is not None
    }
    assert len(got) == len(data) == 500
    for vid, v in data.items():
        assert got[vid] == _pq_py_encode(v, books), f"vec {vid}"

    top = pq_topk(enc, data[3], books, k=10).collect()
    best_dist = top[0]["adc_dist"]
    mine = [r["adc_dist"] for r in top if r["vec_id"] == 3]
    assert mine and mine[0] == best_dist


def test_pq_train_ragged_sample_consumes_no_slot(spark):
    """r11 ADVICE pin: a ragged vector landing on a sampled id must not
    consume a codebook sample slot — the dimension filter runs in-plan
    BEFORE the limit (dim probed from the FIRST sampled row), so the
    trained codebooks are identical to training on the clean corpus
    with the ragged row deleted, and k codes come back even when a
    sampled row is ragged."""
    from web_api_postgres_etl_spark.operators.similarity import pq_train

    clean = [(i, [float(i % 7), float(i % 5), float(i % 3), float(i % 2)])
             for i in range(1, 13)]
    schema = "vec_id long, embedding array<double>"
    with_ragged = spark.createDataFrame(
        clean + [(4, [9.0, 9.0])], schema  # id 4 ragged, sampled (every=2)
    )
    without = spark.createDataFrame(clean, schema)
    got = pq_train(with_ragged, m=2, k=3, iters=0, every=2)
    want = pq_train(without, m=2, k=3, iters=0, every=2)
    assert got == want
    assert all(len(b) == 3 for b in got)  # full k despite the ragged hit


def test_pq_train_recovers_planted_subspace_clusters(spark):
    """Vectors built from 2 well-separated prototypes PER SUBSPACE
    (independently chosen, so 4 distinct full-vector combinations from
    2 codes per subspace): training recovers the prototypes, encoding
    groups rows by their true subspace assignment, and ADC recall@5 is
    perfect because the code space factorizes exactly."""
    import random

    from web_api_postgres_etl_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    rng = random.Random(11)
    protos = {
        (s, c): [(10.0 * c + 1.0) * (s + 1)] * 4 for s in range(2) for c in range(2)
    }
    rows = []
    truth = {}
    for i in range(80):
        picks = (rng.randrange(2), rng.randrange(2))
        vec = []
        for s in range(2):
            vec += [x + rng.uniform(-0.2, 0.2) for x in protos[(s, picks[s])]]
        rows.append((i, vec))
        truth[i] = picks
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train(df, m=2, k=2, iters=3, every=7)
    enc = pq_encode(df, books)
    codes = {r["vec_id"]: tuple(r["pq_codes"]) for r in enc.collect()}
    # same true pick → same learned code, different pick → different
    for s in range(2):
        learned = {}
        for i, picks in truth.items():
            learned.setdefault(picks[s], set()).add(codes[i][s])
        assert all(len(v) == 1 for v in learned.values())
        assert learned[0] != learned[1]
    # trained centroids sit on the prototypes (within the noise band)
    for s in range(2):
        for _, cv in books[s]:
            nearest = min(
                abs(cv[0] - protos[(s, c)][0]) for c in range(2)
            )
            assert nearest < 0.2
    # ADC with a noiseless prototype query returns exactly the rows
    # sharing its combination first
    q = protos[(0, 1)] + protos[(1, 0)]
    want = {i for i, p in truth.items() if p == (1, 0)}
    got = [r["vec_id"] for r in pq_topk(enc, q, books, k=5).collect()]
    assert set(got) <= want


def test_pq_guards_and_null_semantics(spark):
    """Loud failures: k over the literal-plan cap, indivisible dim,
    empty codebooks, wrong-dimension rows at encode time, mismatched
    query at ADC time; NULL embeddings keep NULL codes and are skipped
    by ADC."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from web_api_postgres_etl_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, None), (2, [4.0, 3.0, 2.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="literal-expression plan cap"):
        pq_train(df, m=2, k=65)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=3, k=2, every=1)
    with pytest.raises(ValueError, match="empty codebooks"):
        pq_encode(df, [])
    books = pq_train(df, m=2, k=2, iters=1, every=1)
    enc = pq_encode(df, books)
    rows = {r["vec_id"]: r["pq_codes"] for r in enc.collect()}
    assert rows[1] is None and rows[0] is not None
    assert {r["vec_id"] for r in pq_topk(enc, [0.0] * 4, books, k=9).collect()} == {0, 2}
    with pytest.raises(ValueError, match="query dimension"):
        pq_topk(enc, [0.0] * 6, books)
    bad = spark.createDataFrame(
        [(9, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(SparkRuntimeException, match="codebook dimension"):
        pq_encode(bad, books).collect()
    # codes encoded under a LARGER codebook must raise at ADC time,
    # not look up NULL (NULL sorts FIRST under asc — garbage top-k)
    shrunk = [b[:1] for b in books]
    with pytest.raises(SparkRuntimeException, match="codebook shape"):
        pq_topk(enc, [0.0] * 4, shrunk, k=3).collect()


def test_ivf_pq_index_probe_prunes_and_matches_inline(spark, tmp_path):
    """The IVF-PQ composition materialized: the index stores ONLY
    (id, pq_codes, cluster) — no float vectors; the probe partition-
    prunes on cluster; and its result equals the in-memory composition
    (same routing, same ADC tables) exactly."""
    from web_api_postgres_etl_spark.operators.similarity import (
        _py_cos_key,
        ivf_assign,
        ivf_pq_probe,
        pq_topk,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]
    ]
    path = str(tmp_path / "ivfpq")
    cents, books = write_ivf_pq_index(
        emb, path, every=11, max_centroids=4, m=4, pq_k=8, pq_iters=1
    )

    # no float vectors in the index — the byte-diet claim is structural
    assert set(spark.read.parquet(path).columns) == {
        "vec_id", "pq_codes", "cluster",
    }

    probe = ivf_pq_probe(spark, path, qvec, k=5, nprobe=2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2 and "cluster" in pf[1][:120], (
        "probe scan must partition-prune on cluster"
    )
    got = [tuple(r) for r in probe.collect()]

    # in-memory composition with the returned centroids/codebooks
    probed = sorted(
        cents, key=lambda cv: (-_py_cos_key(qvec, cv[1]), -cv[0])
    )[:2]
    probe_ids = [cid for cid, _ in probed]
    assigned = ivf_assign(emb, cents)
    from web_api_postgres_etl_spark.operators.similarity import pq_encode

    inline = pq_topk(
        pq_encode(
            assigned.select("vec_id", F.col("__v").alias("embedding"), "cluster"),
            books, keep_cols=["cluster"],
        ).filter(F.col("cluster").isin(probe_ids)),
        qvec, books, k=5,
    )
    assert got == [tuple(r) for r in inline.collect()]
    # the query's own vector routes to a probed cluster and, being its
    # own per-subspace argmin, attains the minimum ADC distance there
    assert got and got[0][0] == 7


def test_ivf_pq_index_append_shares_frozen_sidecars(spark, tmp_path):
    """Appending through the sidecars must equal building the index
    over the union in one shot (same centroids + codebooks → same
    assignment, same codes), and a probe for an appended vector finds
    it at the ADC minimum of its probed cluster."""
    from web_api_postgres_etl_spark.operators.similarity import (
        ivf_pq_index_append,
        ivf_pq_probe,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "ivfpq_grow")
    cents, books = write_ivf_pq_index(
        old, path, every=11, max_centroids=4, m=4, pq_k=8, pq_iters=1
    )
    n = ivf_pq_index_append(new, path)
    assert n == new.count()

    grown = spark.read.parquet(path)
    assert grown.count() == emb.count()

    # one-shot rebuild with the SAME frozen sidecars = identical table
    path2 = str(tmp_path / "ivfpq_oneshot")
    write_ivf_pq_index(emb, path2, centroids=cents, codebooks=books)
    a = sorted(
        (r["vec_id"], tuple(r["pq_codes"]), r["cluster"])
        for r in grown.collect()
    )
    b = sorted(
        (r["vec_id"], tuple(r["pq_codes"]), r["cluster"])
        for r in spark.read.parquet(path2).collect()
    )
    assert a == b

    # an appended vector queried against the grown index: minimum ADC
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 450).first()["embedding"]
    ]
    top = ivf_pq_probe(spark, path, qvec, k=5, nprobe=4)
    rows = top.collect()
    mine = [r["adc_dist"] for r in rows if r["vec_id"] == 450]
    assert mine and mine[0] == rows[0]["adc_dist"]


def test_project_embeddings_rp_bit_exact_and_geometry(spark):
    """The JL projection is bit-identical to a literal Python model of
    the same strict folds over the same xxhash64-derived ±1 planes; it
    preserves enough geometry that exact top-k in the REDUCED space
    recovers most of the original top-k (deterministic planes → a
    deterministic, non-flaky recall reading); NULL/dim/cap/collision
    guards hold."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from web_api_postgres_etl_spark.operators.similarity import (
        _py_dot,
        cosine_topk,
        hyperplane_matrix,
        project_embeddings_rp,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out_dim = 16
    planes = hyperplane_matrix(spark, 64, out_dim)
    proj = project_embeddings_rp(emb, out_dim, planes=planes)
    got = {r["vec_id"]: list(r["projection"]) for r in proj.collect()}
    data = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
        if r["embedding"] is not None
    }
    inv = 1.0 / (out_dim ** 0.5)
    for vid, v in list(data.items()):
        want = [_py_dot(v, p) * inv for p in planes]
        assert got[vid] == want, f"vec {vid}"

    # geometry: on STRUCTURED data (3 tight clusters — the regime where
    # neighbor order carries signal; random vectors' near-uniform
    # pairwise distances are meaningless to preserve), top-k in the
    # projected space stays inside the query's true cluster.
    # Deterministic planes → a deterministic, non-flaky reading.
    import random as _rnd

    rng = _rnd.Random(5)
    crows = []
    for i in range(60):
        b = i % 3
        v = [0.0] * 64
        for d in range(64):
            v[d] = (1.0 if d % 3 == b else 0.05) + rng.uniform(-0.02, 0.02)
        crows.append((i, v))
    cdf = spark.createDataFrame(crows, "vec_id long, embedding array<double>")
    cproj = project_embeddings_rp(cdf, out_dim, planes=planes)
    creduced = cproj.select("vec_id", F.col("projection").alias("embedding"))
    qvec = [_py_dot(crows[0][1], p) * inv for p in planes]
    top = [r["vec_id"] for r in cosine_topk(creduced, qvec, k=10).collect()]
    assert all(t % 3 == 0 for t in top), f"cluster broke in JL space: {top}"

    # default path derives planes from the data — same result
    default = project_embeddings_rp(emb, out_dim)
    assert {r["vec_id"]: list(r["projection"]) for r in default.collect()} == got

    # BLOCK-WISE assembly equals the single shot bit-for-bit: two
    # 8-coordinate blocks (plane_start offsets derive DIFFERENT
    # planes; scale_dim fixes 1/sqrt to the TOTAL dimensionality)
    b0 = project_embeddings_rp(
        emb, 8, out_col="p0", plane_start=0, scale_dim=out_dim
    )
    both = project_embeddings_rp(
        b0, 8, out_col="p1", plane_start=8, scale_dim=out_dim
    ).selectExpr("vec_id", "concat(p0, p1) AS projection")
    assert {
        r["vec_id"]: list(r["projection"]) for r in both.collect()
    } == got

    # guards
    with pytest.raises(ValueError, match="expression-plan cap"):
        project_embeddings_rp(emb, 1000)
    with pytest.raises(ValueError, match="planes has"):
        project_embeddings_rp(emb, 8, planes=planes)
    with pytest.raises(ValueError, match="already exists"):
        project_embeddings_rp(emb.withColumn("projection", F.lit(1)), 4)
    mixed = spark.createDataFrame(
        [(1, [1.0] * 64), (2, None)], "vec_id long, embedding array<double>"
    )
    nulls = {
        r["vec_id"]: r["projection"]
        for r in project_embeddings_rp(mixed, 4, planes=[p[:64] for p in planes[:4]]).collect()
    }
    assert nulls[2] is None and nulls[1] is not None
    bad = spark.createDataFrame([(9, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(SparkRuntimeException, match="plane dimension"):
        project_embeddings_rp(bad, 4, planes=[p[:64] for p in planes[:4]]).collect()


def test_ivf_pq_index_full_lifecycle_with_purge(spark, tmp_path):
    """The index maintenance story closes: build → append → surgical
    DELETE (purge_rows composes directly — the code table is a plain
    cluster-partitioned parquet table, so the takedown op rewrites
    only the files holding a purged id, inside their own cluster=
    directories) → probes exclude the purged vectors and the
    remaining codes are untouched bit-for-bit."""
    from web_api_postgres_etl_spark.operators.layout import purge_rows
    from web_api_postgres_etl_spark.operators.similarity import (
        ivf_pq_index_append,
        ivf_pq_probe,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "idx")
    write_ivf_pq_index(
        emb.filter(F.col("vec_id") < 450), path,
        every=11, max_centroids=4, m=4, pq_k=8, pq_iters=1,
    )
    ivf_pq_index_append(emb.filter(F.col("vec_id") >= 450), path)
    before = {
        r["vec_id"]: (tuple(r["pq_codes"]), r["cluster"])
        for r in spark.read.parquet(path).collect()
    }
    assert len(before) == 500

    victims = spark.createDataFrame(
        [(i,) for i in range(0, 500, 50)], ["vec_id"]
    )
    stats = purge_rows(spark, path, victims, "vec_id")
    assert stats["rows_purged"] == 10 and stats["files_rewritten"] >= 1

    after = {
        r["vec_id"]: (tuple(r["pq_codes"]), r["cluster"])
        for r in spark.read.parquet(path).collect()
    }
    assert set(after) == set(before) - set(range(0, 500, 50))
    assert all(after[v] == before[v] for v in after)  # survivors untouched

    # a probe for a purged vector's own embedding no longer returns it
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 50).first()["embedding"]
    ]
    got = {r["vec_id"] for r in ivf_pq_probe(spark, path, qvec, k=10, nprobe=4).collect()}
    assert 50 not in got and got


def test_ivf_pq_index_compact_lifecycle(spark, tmp_path):
    """The OPTIMIZE half of the index lifecycle: three appended
    micro-batches accumulate small files per cluster partition;
    compaction shrinks the file count, touches only partitions at/over
    the threshold, leaves both sidecars byte-identical, and preserves
    the code table EXACTLY (content fingerprint + a probe's full
    result, bit-for-bit)."""
    import os

    from web_api_postgres_etl_spark.operators.quality import (
        table_fingerprint,
    )
    from web_api_postgres_etl_spark.operators.similarity import (
        ivf_pq_index_append,
        ivf_pq_index_compact,
        ivf_pq_probe,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]
    ]
    path = str(tmp_path / "ivfpq")
    write_ivf_pq_index(
        emb.filter("vec_id <= 200"), path,
        every=11, max_centroids=4, m=4, pq_k=8, pq_iters=1,
    )
    # two appended batches suffice to accumulate multi-file partitions
    for lo, hi in ((200, 350), (350, 501)):
        ivf_pq_index_append(
            emb.filter(f"vec_id > {lo} and vec_id <= {hi}"), path
        )

    idx = lambda: spark.read.parquet(path).select(  # noqa: E731
        "vec_id", "pq_codes", "cluster"
    )
    fp_before = tuple(table_fingerprint(
        idx().withColumn("pq_codes", F.col("pq_codes").cast("string"))
    ).first())
    probe_before = [tuple(r) for r in ivf_pq_probe(spark, path, qvec, k=20).collect()]
    sidecars = {}
    for side in ("_centroids", "_codebooks"):
        d = path + side
        sidecars[side] = {
            f: os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d) if not f.startswith(("_", "."))
        }

    stats = ivf_pq_index_compact(spark, path, min_files_to_compact=2)
    assert stats["partitions_compacted"] >= 1
    assert stats["files_after"] < stats["files_before"]

    assert tuple(table_fingerprint(
        idx().withColumn("pq_codes", F.col("pq_codes").cast("string"))
    ).first()) == fp_before
    assert [
        tuple(r) for r in ivf_pq_probe(spark, path, qvec, k=20).collect()
    ] == probe_before
    for side in ("_centroids", "_codebooks"):
        d = path + side
        assert {
            f: os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d) if not f.startswith(("_", "."))
        } == sidecars[side]

    # idempotence: every partition now holds one file — a second pass
    # touches nothing (min_files_to_compact=2 skips single-file dirs)
    again = ivf_pq_index_compact(spark, path, min_files_to_compact=2)
    assert again["partitions_compacted"] == 0
    assert again["files_after"] == stats["files_after"]

    # scope guard rides _file_local: remote URIs raise loudly
    import pytest as _pt

    with _pt.raises(ValueError, match="local-filesystem scoped"):
        ivf_pq_index_compact(spark, "s3a://bucket/idx")


def test_ivf_pq_nn_join_matches_single_probe_per_query(spark, tmp_path):
    """The batched NN join over the materialized index: every query
    row's (vec_id, adc_dist, rank) list equals the single-query
    ivf_pq_probe's, bit-for-bit (same routing rule, same strict ADC
    folds); ranks run 1..k per query; NULL query vectors are dropped;
    the non-broadcast path returns the identical result; and the plan
    is the right one — the index side joins broadcast (never
    shuffled), with dynamic partition pruning on cluster and no
    sort-merge or cartesian anywhere."""
    from web_api_postgres_etl_spark.operators.similarity import (
        ivf_pq_nn_join,
        ivf_pq_probe,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivfpq")
    write_ivf_pq_index(
        emb, path, every=11, max_centroids=4, m=4, pq_k=8, pq_iters=1
    )
    queries = emb.filter(F.col("vec_id") % 101 == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # one NULL-vector query rides along and must be silently dropped
    nullq = spark.createDataFrame(
        [(999999, None)], "query_id long, embedding array<double>"
    )
    out = ivf_pq_nn_join(
        queries.unionByName(nullq), path, k=5, nprobe=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "dynamicpruning" in plan.lower()
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
    rows = out.collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["adc_dist"])
        )
    assert 999999 not in by_q
    qrows = queries.collect()
    assert set(by_q) == {r["query_id"] for r in qrows}
    for qr in qrows:
        qid = qr["query_id"]
        qv = [float(x) for x in qr["embedding"]]
        single = [
            (i + 1, r["vec_id"], r["adc_dist"])
            for i, r in enumerate(
                ivf_pq_probe(spark, path, qv, k=5, nprobe=2).collect()
            )
        ]
        assert sorted(by_q[qid]) == single, qid
        assert [t[0] for t in sorted(by_q[qid])] == list(
            range(1, len(single) + 1)
        )
    flat1 = sorted(tuple(r) for r in rows)
    flat2 = sorted(
        tuple(r)
        for r in ivf_pq_nn_join(
            queries, path, k=5, nprobe=2, broadcast_queries=False
        ).collect()
    )
    assert flat1 == flat2


def test_ivf_pq_nn_join_guards_and_windowed_routing(spark, tmp_path):
    """Validation raises (k/nprobe bounds, missing sidecars,
    wrong-dimension query IN-PLAN), nprobe clamps to |centroids|, and
    the >ASSIGN_LITERAL_MAX broadcast-window routing form returns the
    same result as the literal form on the same index."""
    import pytest as pt

    from web_api_postgres_etl_spark.operators import similarity as S
    from web_api_postgres_etl_spark.operators.similarity import (
        ivf_pq_nn_join,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivfpq")
    write_ivf_pq_index(
        emb, path, every=11, max_centroids=4, m=4, pq_k=8, pq_iters=0
    )
    queries = emb.filter(F.col("vec_id") % 151 == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pt.raises(ValueError, match="k >= 1"):
        ivf_pq_nn_join(queries, path, k=0)
    with pt.raises(ValueError, match="nprobe >= 1"):
        ivf_pq_nn_join(queries, path, nprobe=0)
    with pt.raises(Exception, match="centroid sidecar|PATH_NOT_FOUND|Path does not exist"):
        ivf_pq_nn_join(queries, str(tmp_path / "nope"), k=1)
    # wrong-dimension query raises in-plan, naming both dims
    bad = spark.createDataFrame(
        [(1, [0.5, 0.25])], "query_id long, embedding array<double>"
    )
    with pt.raises(Exception, match="query dimension 2 != index dimension 64"):
        ivf_pq_nn_join(bad, path, k=1).collect()
    # nprobe larger than |centroids| clamps: all clusters probed ==
    # exhaustive ADC rank over the whole index
    full = ivf_pq_nn_join(queries, path, k=3, nprobe=99)
    assert all(r["rank"] <= 3 for r in full.collect())
    # windowed routing form (force by shrinking the literal cap)
    lit = sorted(
        tuple(r) for r in ivf_pq_nn_join(queries, path, k=3, nprobe=2).collect()
    )
    old = S.ASSIGN_LITERAL_MAX
    try:
        S.ASSIGN_LITERAL_MAX = 1
        win = sorted(
            tuple(r)
            for r in ivf_pq_nn_join(queries, path, k=3, nprobe=2).collect()
        )
    finally:
        S.ASSIGN_LITERAL_MAX = old
    assert win == lit


def test_nn_rerank_exact_composes_with_nn_join(spark, tmp_path):
    """The third ANN stage end-to-end: ivf_pq_nn_join's shortlist
    re-ranked over the true float vectors equals a per-query Python
    re-rank of the SAME shortlist with the module's fold arithmetic
    (cosine desc / ties smaller id; l2 asc), rank runs dense 1..k,
    NULL vectors drop, duplicate candidate pairs collapse, and bad
    args raise."""
    import pytest as pt

    from web_api_postgres_etl_spark.operators.similarity import (
        _py_fold_dot,
        _py_norm,
        ivf_pq_nn_join,
        nn_rerank_exact,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivfpq")
    write_ivf_pq_index(
        emb, path, every=11, max_centroids=4, m=4, pq_k=8, pq_iters=0
    )
    queries = emb.filter(F.col("vec_id") % 101 == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cands = ivf_pq_nn_join(queries, path, k=20, nprobe=2)
    out = nn_rerank_exact(cands, emb, queries, k=5)
    rows = out.collect()
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    by_q: dict = {}
    for r in cands.collect():
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    got: dict = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["score"])
        )
    assert set(got) == set(by_q)
    for qid, shortlist in by_q.items():
        qvec = vecs[qid]
        nq = _py_norm(qvec)
        scored = sorted(
            (
                -(_py_fold_dot(qvec, vecs[c])
                  / (nq * _py_norm(vecs[c]))),
                c,
            )
            for c in shortlist
        )[:5]
        want = [
            (i + 1, c, -negs) for i, (negs, c) in enumerate(scored)
        ]
        assert sorted(got[qid]) == want, qid
        assert [t[0] for t in sorted(got[qid])] == [1, 2, 3, 4, 5]
    # l2 metric: self-query candidate attains distance 0.0 at rank 1
    l2 = nn_rerank_exact(cands, emb, queries, k=1, metric="l2")
    for r in l2.collect():
        assert r["vec_id"] == r["query_id"] and r["score"] == 0.0
    # duplicate candidate pairs collapse to one dense ranking
    dup = nn_rerank_exact(
        cands.unionByName(cands), emb, queries, k=5
    )
    assert sorted(tuple(r) for r in dup.collect()) == sorted(
        tuple(r) for r in rows
    )
    # NULL query vectors drop their queries entirely
    nullq = spark.createDataFrame(
        [(424242, None)], "query_id long, embedding array<double>"
    )
    out2 = nn_rerank_exact(
        cands.select("query_id", "vec_id").unionByName(
            spark.createDataFrame(
                [(424242, 1)], "query_id long, vec_id long"
            )
        ),
        emb, queries.unionByName(nullq), k=5,
    )
    assert not [r for r in out2.collect() if r["query_id"] == 424242]
    with pt.raises(ValueError, match="k must be >= 1"):
        nn_rerank_exact(cands, emb, queries, k=0)
    with pt.raises(ValueError, match="metric must be"):
        nn_rerank_exact(cands, emb, queries, metric="dot")


def test_ann_index_dedup_against_persisted_index(spark, tmp_path):
    """Semantic dedup of a new batch against the persisted IVF-PQ
    index — the composition the batched read path exists for: exact
    copies of indexed vectors (under NEW ids) are dropped in the
    exact-cosine mode, novel vectors survive, replayed rows (SAME id
    as their index entry) are self-match-exempt and survive, the
    ADC mode with an infinite threshold flags everything with a
    non-self candidate, and the mode guards raise."""
    import pytest as pt

    from web_api_postgres_etl_spark.operators.similarity import (
        ann_index_dup_hits,
        dedup_batch_against_ann_index,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    corpus = emb.filter("vec_id <= 400")
    path = str(tmp_path / "ivfpq")
    write_ivf_pq_index(
        corpus, path, every=11, max_centroids=4, m=4, pq_k=8, pq_iters=0
    )
    copies = corpus.filter(F.col("vec_id").isin([5, 10, 17])).select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding"
    )
    novel = emb.filter("vec_id > 400 AND vec_id <= 420")
    replay = corpus.filter(F.col("vec_id") == 5)
    batch = copies.unionByName(novel).unionByName(replay)

    kept = dedup_batch_against_ann_index(
        batch, path, min_cosine=0.999, corpus=corpus
    )
    kept_ids = {r["vec_id"] for r in kept.collect()}
    assert kept.columns == batch.columns        # schema unchanged
    assert not kept_ids & {9005, 9010, 9017}   # exact copies dropped
    assert 5 in kept_ids                        # replay self-exempt
    assert {r["vec_id"] for r in novel.collect()} <= kept_ids

    hits = ann_index_dup_hits(
        batch, path, min_cosine=0.999, corpus=corpus
    ).collect()
    got = {(r["batch_id"], r["index_id"]) for r in hits}
    assert {(9005, 5), (9010, 10), (9017, 17)} <= got
    assert all(r["score"] >= 0.999 for r in hits)
    assert all(r["batch_id"] != r["index_id"] for r in hits)

    # ADC mode, infinite threshold: every batch row that routes to a
    # non-empty cluster and has a non-self candidate is flagged
    flagged = {
        r["batch_id"]
        for r in ann_index_dup_hits(batch, path, max_l2=1e18).collect()
    }
    assert {9005, 9010, 9017} <= flagged
    surv = dedup_batch_against_ann_index(batch, path, max_l2=1e18)
    assert surv.count() < batch.count()

    with pt.raises(ValueError, match="exactly one"):
        ann_index_dup_hits(batch, path)
    with pt.raises(ValueError, match="exactly one"):
        ann_index_dup_hits(
            batch, path, max_l2=1.0, min_cosine=0.9, corpus=corpus
        )
    with pt.raises(ValueError, match="needs corpus"):
        ann_index_dup_hits(batch, path, min_cosine=0.9)


def test_ivf_pq_index_stats_profile(spark, tmp_path):
    """The index health face: per-cluster row counts equal a direct
    groupBy of the code table, file counts reflect appended batches
    and shrink under compact, reconstruction error is exactly each
    vector's ADC distance to its own codes (zero for the codebook
    sample rows under pq_iters=0, non-negative everywhere), and the
    codes-only form skips the error columns."""
    from web_api_postgres_etl_spark.operators.similarity import (
        ivf_pq_index_append,
        ivf_pq_index_compact,
        ivf_pq_index_stats,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    corpus = emb.filter("vec_id <= 400")
    path = str(tmp_path / "ivfpq")
    write_ivf_pq_index(
        corpus, path, every=11, max_centroids=4, m=4, pq_k=8, pq_iters=0
    )
    ivf_pq_index_append(emb.filter("vec_id > 400"), path)

    lean = {r["cluster"]: r for r in ivf_pq_index_stats(spark, path).collect()}
    assert set(lean) and "avg_sq_err" not in next(iter(lean.values())).asDict()
    want_counts = {
        r["cluster"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    assert {c: r["n_rows"] for c, r in lean.items()} == want_counts
    assert sum(r["n_rows"] for r in lean.values()) == emb.count()
    # append committed extra files into at least one partition
    assert any(r["n_files"] > 1 for r in lean.values())

    full = {
        r["cluster"]: r
        for r in ivf_pq_index_stats(spark, path, corpus=emb).collect()
    }
    assert {c: r["n_rows"] for c, r in full.items()} == want_counts
    for r in full.values():
        assert r["avg_sq_err"] >= 0.0 and r["max_sq_err"] >= r["avg_sq_err"]
    # pq_iters=0 codebooks ARE sampled vectors: every sampled row
    # reconstructs itself exactly, so its cluster's floor error is 0 —
    # verify via a per-row recomputation of one sampled id
    sampled_cluster = spark.read.parquet(path).filter(
        "vec_id = 0"
    ).first()["cluster"]
    assert full[sampled_cluster]["avg_sq_err"] < full[sampled_cluster][
        "max_sq_err"
    ] or full[sampled_cluster]["max_sq_err"] == 0.0

    files_before = {c: r["n_files"] for c, r in lean.items()}
    ivf_pq_index_compact(spark, path, min_files_to_compact=2)
    after = {
        r["cluster"]: r["n_files"]
        for r in ivf_pq_index_stats(spark, path).collect()
    }
    assert sum(after.values()) < sum(files_before.values())
    # guards
    import pytest as pt
    with pt.raises(Exception, match="codebook sidecar|PATH_NOT_FOUND|Path does not exist"):
        ivf_pq_index_stats(spark, str(tmp_path / "nope"))


def test_ann_recall_at_k_measures_routing_loss(spark, tmp_path):
    """The evaluation loop: with nprobe = |centroids| (every cluster
    probed) and a codebook distortion small enough to keep the exact
    order, self-queries score perfect recall on their own top-1; low
    nprobe can only lower recall (monotone in expectation, pinned >= on
    this data); missing queries get recall 0 rows never (only scored
    queries appear); n_hits is an exact integer in [0, k]."""
    from web_api_postgres_etl_spark.operators.similarity import (
        ann_recall_at_k,
        write_ivf_pq_index,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    path = str(tmp_path / "ivfpq")
    write_ivf_pq_index(
        emb, path, every=11, max_centroids=4, m=4, pq_k=8, pq_iters=1
    )
    queries = emb.filter(F.col("vec_id") % 101 == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = {
        r["query_id"]: (r["n_hits"], r["recall"])
        for r in ann_recall_at_k(
            queries, path, emb, k=5, nprobe=4
        ).collect()
    }
    assert set(full) == {r["query_id"] for r in queries.collect()}
    for qid, (n, rec) in full.items():
        assert 0 <= n <= 5 and rec == n / 5.0
    # with EVERY cluster probed the approx candidate set is the whole
    # corpus, so any loss is pure quantization reorder — the top-1
    # exact hit (the query itself at distance 0) must always survive:
    # the self-ADC distance is the global ADC minimum (pinned in the
    # probe tests), so vec itself sits in the approx top-k too
    assert all(n >= 1 for n, _ in full.values())
    narrow = {
        r["query_id"]: r["n_hits"]
        for r in ann_recall_at_k(
            queries, path, emb, k=5, nprobe=1
        ).collect()
    }
    assert all(narrow[q] <= full[q][0] for q in narrow)
    import pytest as pt
    with pt.raises(ValueError, match="k must be >= 1"):
        ann_recall_at_k(queries, path, emb, k=0)


def _clustered_unit_vecs(spark, n=640, dim=32, n_clusters=32, noise=0.08):
    """Deterministic planted direction clusters (md5, no RNG): unit
    vectors around n_clusters md5-random directions."""
    raw = spark.range(n).selectExpr(
        "id AS vec_id",
        f"""transform(sequence(1, {dim}), i ->
            CAST((CAST(conv(substr(md5(concat('c#',
              CAST(id % {n_clusters} AS STRING), '#',
              CAST(i AS STRING))), 1, 6), 16, 10) AS DOUBLE)
              / 16777215.0 - 0.5)
            + {noise} * (CAST(conv(substr(md5(concat('n#',
              CAST(id AS STRING), '#', CAST(i AS STRING))), 1, 6),
              16, 10) AS DOUBLE) / 16777215.0 - 0.5) AS DOUBLE)
         ) AS embedding""",
    )
    return raw.selectExpr(
        "vec_id",
        "transform(embedding, x -> x / sqrt(aggregate(zip_with("
        "embedding, embedding, (a,b) -> a*b), 0.0D,"
        " (acc, v) -> acc + v))) AS embedding",
    )


def test_ivf_pq_residual_index_lifecycle(spark, tmp_path):
    """The faiss-IVFPQ residual refinement: codes quantize
    v − centroid(cluster). On planted direction clusters that
    OUTNUMBER the per-subspace codebook (32 clusters vs pq_k=8) the
    measured reconstruction error drops by >30% vs the plain index
    (the point of residuals); probe ≡ nn join per query on the
    residual index (both subtract the routed centroid — exact L2 is
    preserved); append through the frozen sidecars INCLUDING the
    _meta flag equals the one-shot rebuild code-for-code; EVERY build
    records its mode in _meta (r13 — a residual→plain rebuild at the
    same path must overwrite the stale flag, or readers would score
    the plain codes as residual ones); a sidecar-less pre-r12 index
    reads as plain."""
    import os
    import shutil

    from web_api_postgres_etl_spark.operators.similarity import (
        _index_is_residual,
        _read_index_meta,
        _read_ivf_centroids,
        ivf_pq_index_append,
        ivf_pq_index_stats,
        ivf_pq_nn_join,
        ivf_pq_probe,
        read_pq_codebooks,
        write_ivf_pq_index,
    )

    # n=480 (r13 trim from 640): 15 members per planted direction —
    # the 32-clusters-vs-pq_k=8 claim and the ≥30% error margin hold
    # (re-measured at this size) at ~25% less wall
    vecs = _clustered_unit_vecs(spark, n=480)
    plain = str(tmp_path / "plain")
    res = str(tmp_path / "res")
    write_ivf_pq_index(
        vecs, plain, every=30, max_centroids=32, m=4, pq_k=8, pq_iters=1
    )
    write_ivf_pq_index(
        vecs, res, every=30, max_centroids=32, m=4, pq_k=8,
        pq_iters=1, residual=True,
    )
    assert _read_index_meta(spark, plain).get("residual") == "false"
    assert os.path.exists(res + "_meta")
    assert _index_is_residual(spark, res)
    # sidecar-less (pre-r12) index reads as plain; the _meta read only
    # swallows PATH_NOT_FOUND — other failures propagate (r13)
    shutil.rmtree(plain + "_meta")
    assert _read_index_meta(spark, plain) == {}
    assert not _index_is_residual(spark, plain)

    def mean_err(path):
        rows = ivf_pq_index_stats(spark, path, corpus=vecs).collect()
        return sum(
            float(r["avg_sq_err"]) * r["n_rows"] for r in rows
        ) / sum(r["n_rows"] for r in rows)

    ep, er = mean_err(plain), mean_err(res)
    assert er < 0.7 * ep, (ep, er)   # measured ~46% better; pin 30%

    # probe ≡ nn join on the residual index, per query bit-for-bit
    queries = vecs.filter(F.col("vec_id") % 191 == 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    by_q: dict = {}
    for r in ivf_pq_nn_join(queries, res, k=5, nprobe=3).collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["adc_dist"])
        )
    for qr in queries.collect():
        qv = [float(x) for x in qr["embedding"]]
        single = [
            (i + 1, r["vec_id"], r["adc_dist"])
            for i, r in enumerate(
                ivf_pq_probe(spark, res, qv, k=5, nprobe=3).collect()
            )
        ]
        assert sorted(by_q[qr["query_id"]]) == single, qr["query_id"]

    # append ≡ one-shot under the frozen sidecars (incl. _meta)
    part = str(tmp_path / "part")
    write_ivf_pq_index(
        vecs.filter("vec_id < 320"), part, every=30, max_centroids=32,
        m=4, pq_k=8, pq_iters=1, residual=True,
    )
    n = ivf_pq_index_append(vecs.filter("vec_id >= 320"), part)
    assert n == vecs.filter("vec_id >= 320").count()
    cents = _read_ivf_centroids(spark, part)
    books = read_pq_codebooks(spark, part)
    oneshot = str(tmp_path / "oneshot")
    write_ivf_pq_index(
        vecs, oneshot, centroids=cents, codebooks=books, residual=True
    )
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(part).selectExpr(
            "vec_id", "cast(pq_codes as string)", "cluster"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.read.parquet(oneshot).selectExpr(
            "vec_id", "cast(pq_codes as string)", "cluster"
        ).collect()
    )
    assert got == want


def test_ivf_pq_rebuild_flips_residual_mode(spark, tmp_path):
    """r13 regression (ADVICE): rebuilding with residual=False at a
    path that previously held a RESIDUAL index must overwrite the
    _meta sidecar — every reader (probe here) must score the new plain
    codes plainly, bit-for-bit equal to a fresh plain build, instead
    of silently subtracting centroids from the query."""
    from web_api_postgres_etl_spark.operators.similarity import (
        _index_is_residual,
        ivf_pq_probe,
        write_ivf_pq_index,
    )

    vecs = _clustered_unit_vecs(spark, n=160, n_clusters=8)
    reb = str(tmp_path / "rebuilt")
    fresh = str(tmp_path / "fresh")
    kw = dict(every=19, max_centroids=8, m=4, pq_k=8, pq_iters=1)
    write_ivf_pq_index(vecs, reb, residual=True, **kw)
    assert _index_is_residual(spark, reb)
    write_ivf_pq_index(vecs, reb, **kw)          # plain rebuild, same path
    assert not _index_is_residual(spark, reb)
    write_ivf_pq_index(vecs, fresh, **kw)
    qv = [
        float(x)
        for x in vecs.filter("vec_id = 5").collect()[0]["embedding"]
    ]
    probe = lambda p: [  # noqa: E731
        (r["vec_id"], r["adc_dist"])
        for r in ivf_pq_probe(spark, p, qv, k=5, nprobe=3).collect()
    ]
    assert probe(reb) == probe(fresh)


def _patterned_unit_vecs(
    spark, n=2000, dim=32, n_clusters=8, n_pat=8, beta=0.35, noise=0.02
):
    """Deterministic cluster+pattern geometry (md5, no RNG): unit
    vectors = dir(cluster) + β·pattern(sub-id) + tiny noise. The
    geometry where residual coding must WIN recall, not just
    reconstruction error: exact neighbors share (cluster, pattern);
    plain codebooks must cover clusters × patterns with pq_k codes and
    can't, residual codebooks see only the n_pat patterns after the
    centroid is subtracted."""
    raw = spark.range(n).selectExpr(
        "id AS vec_id",
        f"""transform(sequence(1, {dim}), i ->
            CAST((CAST(conv(substr(md5(concat('c#',
              CAST(id % {n_clusters} AS STRING), '#',
              CAST(i AS STRING))), 1, 6), 16, 10) AS DOUBLE)
              / 16777215.0 - 0.5)
            + {beta} * (CAST(conv(substr(md5(concat('p#',
              CAST(CAST(id / {n_clusters} AS BIGINT) % {n_pat}
                AS STRING), '#',
              CAST(i AS STRING))), 1, 6), 16, 10) AS DOUBLE)
              / 16777215.0 - 0.5)
            + {noise} * (CAST(conv(substr(md5(concat('n#',
              CAST(id AS STRING), '#', CAST(i AS STRING))), 1, 6),
              16, 10) AS DOUBLE) / 16777215.0 - 0.5) AS DOUBLE)
         ) AS embedding""",
    )
    return raw.selectExpr(
        "vec_id",
        "transform(embedding, x -> x / sqrt(aggregate(zip_with("
        "embedding, embedding, (a,b) -> a*b), 0.0D,"
        " (acc, v) -> acc + v))) AS embedding",
    )


def test_residual_beats_plain_recall_at_equal_nprobe(spark, tmp_path):
    """r13 (VERDICT #5): residual IVF-PQ buys RECALL, not just
    reconstruction error. On the cluster+pattern geometry the exact
    top-k are same-(cluster, pattern) twins; at EQUAL nprobe the
    residual index's mean recall@10 beats the plain index's by ≥3×
    (measured 0.644 vs 0.076 at n=1000 — plain codes collapse each
    cluster to near-identical codewords, so in-cluster ADC order is
    tie-noise, while residual codes represent the patterns; 0.324 vs
    0.056 at the n=2000 probe point, same shape). Same pinned-sample
    centroids and training schedule both sides — only the encoding
    space differs. The honesty caveat stays: on isotropic noise
    (test_ivf_pq_residual_index_lifecycle's geometry is near it at
    the recall level) residual ≈ plain; residuals pay off only when
    within-cluster structure is codeable."""
    from web_api_postgres_etl_spark.operators.similarity import (
        ann_recall_at_k,
        write_ivf_pq_index,
    )

    vecs = _patterned_unit_vecs(spark, n=1000).persist()
    queries = vecs.filter("vec_id % 41 = 5").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    means = {}
    for residual in (False, True):
        path = str(tmp_path / ("res" if residual else "plain"))
        write_ivf_pq_index(
            vecs, path, every=97, max_centroids=8, m=4, pq_k=8,
            pq_iters=2, residual=residual,
        )
        rows = ann_recall_at_k(
            queries, path, vecs, k=10, nprobe=2
        ).collect()
        means[residual] = sum(r["recall"] for r in rows) / len(rows)
    vecs.unpersist()
    assert means[True] >= 3 * means[False], means
    assert means[True] >= 0.4, means  # absolute floor, not just ratio


def test_residual_subtract_guards_dimension(spark, tmp_path):
    """r13 regression (ADVICE): a wrong-dimension vector entering the
    residual subtraction raises IN-PLAN instead of NULL-padding
    through zip_with into silently corrupt codes (the plain path
    raises for the same input via pq_encode's size guard)."""
    import pytest

    from web_api_postgres_etl_spark.operators.similarity import (
        write_ivf_pq_index,
    )

    good = _clustered_unit_vecs(spark, n=160, n_clusters=8)
    short = spark.range(1).selectExpr(
        "10000 + id AS vec_id",
        "array(1.0D, 0.0D) AS embedding",  # dim 2 vs corpus dim 32
    )
    with pytest.raises(Exception, match="dim"):
        write_ivf_pq_index(
            good.unionByName(short), str(tmp_path / "ix"),
            every=19, max_centroids=8, m=4, pq_k=8, pq_iters=1,
            residual=True,
        )


def test_ann_dup_hits_self_match_keeps_k_slots(spark, tmp_path):
    """r13 regression (ADVICE): a replayed row's self-match must not
    consume one of its k candidate slots — with k=1 a replayed batch
    still finds its true nearest duplicate (the shortlist requests k+1
    and re-ranks after dropping self)."""
    from web_api_postgres_etl_spark.operators.similarity import (
        ann_index_dup_hits,
        write_ivf_pq_index,
    )

    vecs = _clustered_unit_vecs(spark, n=160, n_clusters=8)
    path = str(tmp_path / "ix")
    write_ivf_pq_index(
        vecs, path, every=19, max_centroids=8, m=4, pq_k=8, pq_iters=1
    )
    # replay rows already in the index; every one has a same-cluster
    # twin (n/n_clusters = 20 rows per planted direction)
    batch = vecs.filter("vec_id < 16")
    hits = ann_index_dup_hits(
        batch, path, k=1, nprobe=3, max_l2=1e18
    ).collect()
    by_batch = {r["batch_id"]: r["index_id"] for r in hits}
    assert len(by_batch) == 16, sorted(by_batch)  # k=1 still hits
    assert all(b != i for b, i in by_batch.items())
