"""Scale probe: run the heavy curation/dedup operators on synthetic
corpora of increasing size and report wall time + output rows, as
evidence that the shapes scale linearly (shuffles carry digests/ids,
candidate generation is banded, verification is candidates-only).

    python tools/scale_probe.py [sizes ...]     # default: 5000 50000

The corpus is generated deterministically JVM-side (spark.range →
seeded md5 word picks), so runs are reproducible and generation cost
is itself distributed. ~10% of documents are near-duplicates of an
earlier document (one word changed), giving the near-dup operators a
realistic hit rate at every size.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from web_api_postgres_etl_spark.operators.dedup import (  # noqa: E402
    dedup_against_corpus,
    decontaminate,
    minhash_table,
    near_dup_pairs,
)
from web_api_postgres_etl_spark.operators.similarity import (  # noqa: E402
    semantic_dup_pairs,
)
from web_api_postgres_etl_spark.session import get_spark  # noqa: E402

VOCAB = 500
WORDS_PER_DOC = 60


def synth_docs(spark, n: int):
    """n synthetic documents: 60 words drawn from a 500-word vocab by
    seeded md5 arithmetic. Every 10th doc is the previous doc with its
    first word replaced (a guaranteed near-duplicate)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, "
            f"{WORDS_PER_DOC}), "
            "i -> concat('w', CAST(conv(substr(md5(concat(CAST(CASE WHEN id % 10 = 1 AND i > 1 "
            "THEN id - 1 ELSE id END AS STRING), ':', CAST(CASE WHEN id % 10 = 1 AND i = 1 "
            "THEN 999999 ELSE i END AS STRING))), 1, 8), 16, 10) % "
            f"{VOCAB} AS STRING))))"
        ).alias("text"),
    )
    return base


def synth_vecs(spark, n: int, dim: int = 32):
    """n synthetic embeddings; every 20th is an exact copy of the
    previous vector (guaranteed semantic dup)."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, "
            f"{dim}), "
            "i -> CAST(conv(substr(md5(concat(CAST(CASE WHEN id % 20 = 1 "
            "THEN id - 1 ELSE id END AS STRING), '#', CAST(i AS STRING))), 1, 6), 16, 10) "
            "AS DOUBLE) / 16777215.0 - 0.5)"
        ).alias("embedding"),
    )


def probe(spark, n: int) -> None:
    docs = synth_docs(spark, n).persist()
    docs.count()  # materialize generation outside the timings
    vecs = synth_vecs(spark, n).persist()
    vecs.count()
    ops = {}

    def reset_cache():
        # operators persist bounded intermediates (signature tables,
        # candidate sets); clear between measurements so one op's cache
        # does not pressure the next, then re-pin the inputs
        spark.catalog.clearCache()
        docs.persist().count()
        vecs.persist().count()

    t0 = time.time()
    pairs = near_dup_pairs(
        docs, "doc_id", "text", shingle_n=2, num_hashes=8, bands=4,
        threshold=0.5,
    ).count()
    ops["near_dup_pairs"] = (time.time() - t0, pairs)

    reset_cache()
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    t0 = time.time()
    sigs = minhash_table(corpus, "doc_id", "text", shingle_n=2, num_hashes=8)
    kept = dedup_against_corpus(
        new, sigs, "doc_id", "text", shingle_n=2, num_hashes=8, bands=4,
        threshold=0.5,
    ).count()
    ops["dedup_against_corpus"] = (time.time() - t0, kept)

    reset_cache()
    bench = docs.filter(F.col("doc_id") % 100 == 0).select("text")
    train = docs.filter(F.col("doc_id") % 100 != 0)
    t0 = time.time()
    clean = decontaminate(train, bench, "doc_id", "text", ngram_n=4).count()
    ops["decontaminate"] = (time.time() - t0, clean)

    reset_cache()
    # SemDeDup's scale rule: k ≈ √N keeps expected cluster width flat
    # (fixed k is quadratic in N — measured 12× cost at 10× size)
    k = max(8, min(256, int(n ** 0.5)))
    t0 = time.time()
    sem = semantic_dup_pairs(
        vecs, "vec_id", "embedding", threshold=0.999, k=k, iters=1
    ).count()
    ops[f"semantic_dup_pairs(k={k})"] = (time.time() - t0, sem)

    for name, (secs, rows) in ops.items():
        print(f"n={n:>7d}  {name:22s} {secs:7.2f}s  rows={rows}")
    docs.unpersist()
    vecs.unpersist()


def main(argv: list[str]) -> int:
    sizes = [int(a) for a in argv] or [5_000, 50_000]
    spark = get_spark(app_name="scale-probe")
    for n in sizes:
        probe(spark, n)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
