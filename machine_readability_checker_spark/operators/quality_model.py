"""Model-based quality filtering (the CCNet / fastText-classifier step).

Heuristic filters (Gopher stats, stopword ratios) catch gross junk;
production pipelines then train a LINEAR text classifier on hashed
n-gram features to separate reference-quality text from crawl noise
and keep documents above a score threshold.  This is that step on
Spark ML primitives — everything distributed, nothing hand-rolled:

    tokens → word 1-grams + 2-grams → HashingTF (2^18 buckets)
           → LogisticRegression (L2, few epochs over the
             driver-orchestrated L-BFGS, data never leaves executors)
           → per-document quality probability

``train_quality_model`` fits on a labeled frame (label 1 = quality);
``score_quality`` attaches ``quality_prob``; ``quality_filter`` keeps
rows above the threshold.  Scoring a 100 TB corpus is a narrow map:
the fitted model is a single weight vector broadcast to executors.

The fixtures train positive = fixture prose, negative = synthetic junk
(repetition loops, symbol soup) — the separations every real quality
model must find.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, VectorAssembler
from pyspark.sql import DataFrame, functions as F

# Hash width per n-gram order (unigrams and bigrams get separate
# spaces, so the assembled vector is 2×N_FEATURES).  Distributed
# L-BFGS ships one DENSE gradient of the assembled dimension per task
# per iteration, so this is the training-cost knob: 2^18 trains ~6×
# slower than 2^16 for zero measurable AUC gain on linear quality
# separation (fastText uses ~2M buckets, but trains once offline on
# >100M-token corpora — raise n_features for that regime).
N_FEATURES = 1 << 16


def _feature_pipeline(text_col: str, n_features: int = N_FEATURES) -> list:
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_words", pattern="\\s+", minTokenLength=1
    )
    bigrams = NGram(n=2, inputCol="_words", outputCol="_bigrams")
    tf1 = HashingTF(
        inputCol="_words", outputCol="_f1", numFeatures=n_features, binary=False
    )
    tf2 = HashingTF(
        inputCol="_bigrams", outputCol="_f2", numFeatures=n_features, binary=False
    )
    asm = VectorAssembler(inputCols=["_f1", "_f2"], outputCol="features")
    return [tok, bigrams, tf1, tf2, asm]


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    reg: float = 1e-4,
    max_iter: int = 30,
    n_features: int = N_FEATURES,
) -> PipelineModel:
    """Fit the hashed-n-gram logistic model on (text, label∈{0,1})."""
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        regParam=reg,
        maxIter=max_iter,
        standardization=False,
    )
    return Pipeline(stages=_feature_pipeline(text_col, n_features) + [lr]).fit(
        labeled
    )


def score_quality(
    model: PipelineModel, df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Attach ``quality_prob`` (P(label=1)); drops the intermediate
    feature columns — the scoring pass adds one narrow map stage."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    return scored.withColumn(
        "quality_prob",
        F.round(vector_to_array(F.col("probability"))[1], 6),
    ).drop(
        "_words", "_bigrams", "_f1", "_f2", "features",
        "rawPrediction", "probability", "prediction",
    )


def quality_filter(
    model: PipelineModel,
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    return score_quality(model, df, text_col).filter(
        F.col("quality_prob") >= threshold
    )


_PROSE_WORDS = (
    "the quick analysis shows that spark pipelines scale when the "
    "data is partitioned well and the query plans stay narrow "
    "results indicate careful measurement matters for every claim "
    "documents describe findings methods figures tables appendix "
    "between because therefore however moreover consider evidence"
).split()

_JUNK_ATOMS = [
    "click here", "$$$", ">>>", "buy now", "#####", "||||",
    "aaaa", "zzzz", "....", "!!!!", "%%%", "@@@@",
]


def seeded_training_frame(spark, n_per_class: int = 300, seed: int = 3):
    """Deterministic prose-vs-junk training set (label 1 = quality):
    positives sample fluent word sequences, negatives are repetition
    loops and symbol soup — the separations every production quality
    classifier (CCNet's wiki-vs-crawl, fastText __label__) must find.
    Seed-keyed, so the fitted weights are reproducible run to run."""
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_per_class):
        k = int(rng.randint(20, 40))
        text = " ".join(
            _PROSE_WORDS[int(rng.randint(0, len(_PROSE_WORDS)))]
            for _ in range(k)
        )
        rows.append((f"prose{i:05d}", text, 1.0))
    for i in range(n_per_class):
        if i % 3 == 0:  # repetition loop
            atom = _JUNK_ATOMS[int(rng.randint(0, len(_JUNK_ATOMS)))]
            text = " ".join([atom] * int(rng.randint(15, 40)))
        elif i % 3 == 1:  # symbol soup
            text = " ".join(
                _JUNK_ATOMS[int(rng.randint(0, len(_JUNK_ATOMS)))]
                for _ in range(int(rng.randint(15, 40)))
            )
        else:  # keyword-stuffed shouting
            text = " ".join(
                ["BUY", "NOW", "FREE", "WIN"][int(rng.randint(0, 4))]
                for _ in range(int(rng.randint(15, 40)))
            )
        rows.append((f"junk{i:05d}", text, 0.0))
    # a few hundred rows spread over defaultParallelism partitions
    # makes every L-BFGS iteration a 32-task job; 4 is plenty
    return spark.createDataFrame(
        rows, "doc_id string, text string, label double"
    ).repartition(4)
