"""Model-based quality classification: train a logistic-regression
quality filter on weak labels and score the corpus with it.

The heuristic quality signals (functions/text.py quality_score) are
the WEAK SUPERVISION; the trained model generalizes them to a
calibrated probability — the standard fastText-classifier pattern
for corpus filtering, here on MLlib so
both training (distributed L-BFGS over one treeAggregate pass per
iteration) and inference (a JVM vector dot per row, no Python) scale
with the cluster. Feature space: hashed token counts (HashingTF) —
build once, reuse for train + score.

At 100 TB: training runs on a sample (`train_fraction`), scoring is
an embarrassingly-parallel map — the model broadcast is a few
hundred KB of coefficients.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofaiss_spark.functions.text import quality_score, tokenize

__all__ = ["QualityModel", "train_quality_classifier", "score_quality"]

_NUM_FEATURES = 1 << 14


@dataclass
class QualityModel:
    model: object = field(repr=False)  # pyspark.ml PipelineModel-ish
    threshold: float
    train_accuracy: float

    def stats(self) -> dict:
        return {
            "index_type": "quality_classifier",
            "threshold": self.threshold,
            "train_accuracy": round(self.train_accuracy, 4),
            "num_features": _NUM_FEATURES,
        }


def _featurize(docs: DataFrame, text_col: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    toks = docs.withColumn("_toks", tokenize(F.col(text_col)))
    tf = HashingTF(
        inputCol="_toks", outputCol="_features", numFeatures=_NUM_FEATURES
    )
    return tf.transform(toks)


def train_quality_classifier(
    docs: DataFrame,
    threshold: float = 0.6,
    train_fraction: float | None = None,
    seed: int = 42,
    text_col: str = "text",
) -> QualityModel:
    """Weak labels = heuristic quality_score ≥ threshold; fit
    LogisticRegression(maxIter=10) on hashed token counts. Returns
    the model plus its training accuracy against the weak labels
    (the fit-sanity number the driver invariant gates)."""
    from pyspark.ml.classification import LogisticRegression

    train = docs
    if train_fraction is not None and train_fraction < 1.0:
        train = docs.sample(fraction=train_fraction, seed=seed)
    feats = _featurize(train, text_col).withColumn(
        "_label",
        (quality_score(F.col(text_col)) >= threshold).cast("double"),
    )
    lr = LogisticRegression(
        featuresCol="_features", labelCol="_label", maxIter=10, regParam=0.01
    )
    model = lr.fit(feats)
    pred = model.transform(feats)
    acc_row = pred.agg(
        F.avg((F.col("prediction") == F.col("_label")).cast("double")).alias(
            "acc"
        )
    ).collect()[0]
    return QualityModel(
        model=model,
        threshold=threshold,
        train_accuracy=float(acc_row["acc"]),
    )


def score_quality(
    qm: QualityModel,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, keep, agrees_with_heuristic): model prediction per doc
    plus agreement with the weak-label rule — the drift signal a
    filtering pipeline monitors."""
    feats = _featurize(docs, text_col)
    pred = qm.model.transform(feats)
    heur = quality_score(F.col(text_col)) >= qm.threshold
    return pred.select(
        F.col(id_col),
        (F.col("prediction") == 1.0).alias("keep"),
        ((F.col("prediction") == 1.0) == heur).alias("agrees_with_heuristic"),
    )
