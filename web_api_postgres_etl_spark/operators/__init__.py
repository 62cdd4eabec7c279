"""Composable DataFrame operators (SURVEY.md §2).

Each operator is a function ``DataFrame -> DataFrame`` (or a small
builder returning one) so pipelines compose with plain chaining while
Catalyst still sees one lazy plan per pipeline — filters and projections
written here reach the parquet scan as PushedFilters/ReadSchema.
"""

from .aggregates import (
    corpus_stats,
    funnel,
    funnel_users,
    max_watermark,
    max_watermarks,
)
from .dedup import (
    corpus_diff,
    contaminated_flag,
    decontaminate,
    dedup_against_corpus,
    dedup_exact,
    dedup_last_wins,
    duplicated_window_positions,
    exact_substring_dedup,
    minhash_lsh_candidates,
    minhash_table,
    near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from .filters import drop_required_nulls, in_range, newer_than
from .winnow import (
    winnow_candidates,
    winnow_dup_pairs,
    winnow_fingerprint_table,
    winnow_fingerprints,
)
from .classifier import (
    classifier_gate,
    hashed_token_features,
    load_quality_model,
    save_quality_model,
    score_documents,
    train_quality_classifier,
)
from .graph import dedup_clusters
from .joins import asof_join, interval_join, salted_join, star_join, two_way_join
from .layout import add_zorder_key, cluster_by_zorder, compact_small_files, zorder_key
from .project import project, project_alias, drop_columns, qcol
from .retrieval import (
    bigram_perplexity,
    bm25_topk,
    build_bigram_model,
    build_unigram_model,
    tfidf_table,
    unigram_perplexity,
)
from .sampling import (
    chunk_documents,
    deterministic_split,
    leakage_safe_split,
    pack_sequences,
    quota_by_group,
    shard_manifest,
    temperature_sample,
    upsample_by_factor,
)
from .similarity import (
    cosine_topk,
    decontaminate_semantic,
    semantic_contamination_hits,
    ivf_probe,
    ivf_topk,
    lsh_cosine_pairs,
    semantic_dedup,
    semantic_dup_pairs,
    write_ivf_index,
)

__all__ = [
    "add_zorder_key",
    "asof_join",
    "bigram_perplexity",
    "build_bigram_model",
    "build_unigram_model",
    "cluster_by_zorder",
    "compact_small_files",
    "zorder_key",
    "bm25_topk",
    "chunk_documents",
    "contaminated_flag",
    "corpus_stats",
    "funnel",
    "funnel_users",
    "cosine_topk",
    "decontaminate",
    "dedup_against_corpus",
    "dedup_clusters",
    "corpus_diff",
    "dedup_exact",
    "dedup_last_wins",
    "duplicated_window_positions",
    "exact_substring_dedup",
    "deterministic_split",
    "drop_columns",
    "drop_required_nulls",
    "in_range",
    "interval_join",
    "ivf_probe",
    "ivf_topk",
    "leakage_safe_split",
    "lsh_cosine_pairs",
    "max_watermark",
    "max_watermarks",
    "minhash_lsh_candidates",
    "minhash_table",
    "near_dup_pairs",
    "newer_than",
    "ngram_jaccard_pairs",
    "pack_sequences",
    "project",
    "project_alias",
    "qcol",
    "classifier_gate",
    "hashed_token_features",
    "load_quality_model",
    "save_quality_model",
    "score_documents",
    "train_quality_classifier",
    "quota_by_group",
    "shard_manifest",
    "temperature_sample",
    "upsample_by_factor",
    "salted_join",
    "semantic_dedup",
    "decontaminate_semantic",
    "semantic_contamination_hits",
    "semantic_dup_pairs",
    "simhash_near_dups",
    "star_join",
    "winnow_candidates",
    "winnow_dup_pairs",
    "winnow_fingerprint_table",
    "winnow_fingerprints",
    "tfidf_table",
    "unigram_perplexity",
    "two_way_join",
    "write_ivf_index",
]
