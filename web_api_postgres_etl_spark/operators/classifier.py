"""Model-based document quality filtering — the fastText-classifier
stage of a modern LLM data pipeline (the DCLM / FineWeb-Edu move:
train a cheap linear classifier to score "does this look like
reference-quality text", then gate the crawl on the score; it
outperforms hand-rules because it learns the boundary from data).

The reference has no ML surface; this is the engine's model-training
face, built entirely on pyspark.ml (JVM-side, distributed):

- Features: hashed bag-of-words counts over the package's shared
  ``normalized_tokens`` tokenizer (HashingTF — the hashing trick, no
  vocabulary state to ship; one narrow pass, codegen'd tokenize +
  compiled feature hashing).
- Model: logistic regression (distributed L-BFGS; the driver holds
  only the coefficient vector — ``num_features`` doubles).
- Scoring: ``model.transform`` broadcasts the coefficient vector and
  maps the corpus — no shuffle, the 100 TB path. Training runs on a
  bounded LABELED sample (thousands to millions of rows), never the
  full corpus; scoring runs on everything.

No SQL oracle: L-BFGS is iterative floating-point optimization, not
relational algebra (same verdict as k-means — the driver's rows-only
check applies; behavior is pinned by planted-ground-truth tests
instead: separable corpora recover labels, the gate drops planted
spam, determinism under a fixed seed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_tokens
from .project import qcol


def hashed_token_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_features: int = 1 << 18,
) -> DataFrame:
    """(id, features) — hashing-trick bag-of-words term counts.

    2^18 buckets keeps collision rates low for web-scale vocabularies
    while the coefficient vector stays a ~2 MB broadcast. Token-less
    and NULL documents produce the empty vector (scored by the model's
    intercept alone — they are not silently dropped)."""
    if num_features < 2:
        raise ValueError(f"num_features must be >= 2, got {num_features}")
    from pyspark.ml.feature import HashingTF

    toks = df.select(
        qcol(id_col).alias(id_col),
        F.coalesce(
            normalized_tokens(text_col), F.array().cast("array<string>")
        ).alias("__toks"),
    )
    tf = HashingTF(
        inputCol="__toks", outputCol="features", numFeatures=num_features
    )
    # binary=False (default): raw term counts, the fastText-style signal
    return tf.transform(toks).drop("__toks")


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 18,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the quality model: ``positive`` = reference-quality docs
    (wiki/books/instruction data), ``negative`` = raw crawl. Returns a
    fitted ``LogisticRegressionModel`` whose ``probability`` of class
    1 is the quality score. Deterministic for fixed inputs: L-BFGS
    from a zero initial vector has no RNG (float reduction order can
    wiggle the last ulps across cluster layouts — thresholds should
    not be set within 1e-6 of a document's score).

    Scale: the labeled set is bounded by construction (you label
    thousands, not billions); each L-BFGS iteration is one
    treeAggregate over it. ``reg_param`` is L2 — keep small but
    nonzero so near-separable corpora converge to finite weights."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    pos = positive.select(F.lit(1.0).alias("label"), qcol(text_col).alias("__t"))
    neg = negative.select(F.lit(0.0).alias("label"), qcol(text_col).alias("__t"))
    # featurize IN PLACE (HashingTF preserves input columns) — never
    # join labels back on a synthetic id: monotonically_increasing_id
    # is evaluation-dependent, and two evaluations of the same frame
    # can pair labels with the wrong feature vectors silently
    labeled = pos.unionByName(neg).withColumn(
        "__toks",
        F.coalesce(normalized_tokens("__t"), F.array().cast("array<string>")),
    )
    tf = HashingTF(
        inputCol="__toks", outputCol="features", numFeatures=num_features
    )
    train = tf.transform(labeled).select("label", "features")
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,   # sparse counts: standardizing densifies
    )
    return lr.fit(train)


def score_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model,
    score_col: str = "quality_prob",
) -> DataFrame:
    """(id, quality_prob) — P(quality | doc) for every document.

    The scale path: featurize (narrow pass) → ``model.transform``
    (broadcast coefficients, map-only) → extract P(class 1). No
    shuffle, no collect; safe to run over the full corpus. The
    feature width always comes from the model itself — any other
    width would hash into a different index space."""
    feats = hashed_token_features(df, id_col, text_col, model.numFeatures)
    scored = model.transform(feats)
    # probability is an ml VectorUDT; element 1 is P(quality)
    from pyspark.ml.functions import vector_to_array

    return scored.select(
        qcol(id_col).alias(id_col),
        F.round(
            vector_to_array(F.col("probability")).getItem(1), 6
        ).alias(score_col),
    )


def classifier_gate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model,
    min_prob: float = 0.5,
) -> DataFrame:
    """Keep documents scoring at least ``min_prob``, preserving the
    input schema. ONE pass — featurize/score columns ride alongside
    the row and are dropped after the filter (no self-join, so an
    expensive upstream plan is not re-executed per branch; scoring is
    total, so no silent row loss)."""
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    reserved = {"__toks", "features", "rawPrediction", "probability",
                "prediction"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with the gate's "
            "internal scoring columns — rename them before gating "
            "(the gate would otherwise crash or silently overwrite)"
        )
    cols = df.columns
    toks = df.withColumn(
        "__toks",
        F.coalesce(
            normalized_tokens(text_col), F.array().cast("array<string>")
        ),
    )
    tf = HashingTF(
        inputCol="__toks", outputCol="features",
        numFeatures=model.numFeatures,
    )
    scored = model.transform(tf.transform(toks))
    # filter on the SAME 6-decimal rounding score_documents reports, so
    # a threshold read off the audit output can never disagree with the
    # gate's survivor set at the boundary
    return scored.filter(
        F.round(vector_to_array(F.col("probability")).getItem(1), 6)
        >= min_prob
    ).select(*cols)


def save_quality_model(model, path: str) -> None:
    """Persist the fitted model with pyspark.ml's native writer — the
    train-once / score-everywhere seam: training runs wherever the
    labeled sample lives, the saved artifact (coefficient vector +
    intercept + metadata JSON, a few MB) ships to every scoring
    cluster. Overwrites for idempotent re-runs of a training job."""
    model.write().overwrite().save(path)


def load_quality_model(path: str):
    """Load a model saved by :func:`save_quality_model`. The feature
    width travels inside the artifact (``model.numFeatures``), so
    scoring reconstructs the identical hash space with no side
    channel."""
    from pyspark.ml.classification import LogisticRegressionModel

    return LogisticRegressionModel.load(path)
