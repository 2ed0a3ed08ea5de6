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

N_FEATURES = 1 << 18


def _feature_pipeline(text_col: str) -> list:
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_words", pattern="\\s+", minTokenLength=1
    )
    bigrams = NGram(n=2, inputCol="_words", outputCol="_bigrams")
    tf1 = HashingTF(
        inputCol="_words", outputCol="_f1", numFeatures=N_FEATURES, binary=False
    )
    tf2 = HashingTF(
        inputCol="_bigrams", outputCol="_f2", numFeatures=N_FEATURES, binary=False
    )
    asm = VectorAssembler(inputCols=["_f1", "_f2"], outputCol="features")
    return [tok, bigrams, tf1, tf2, asm]


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    reg: float = 1e-4,
    max_iter: int = 30,
) -> PipelineModel:
    """Fit the hashed-n-gram logistic model on (text, label∈{0,1})."""
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        regParam=reg,
        maxIter=max_iter,
        standardization=False,
    )
    return Pipeline(stages=_feature_pipeline(text_col) + [lr]).fit(labeled)


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
